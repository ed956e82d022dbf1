"""Standalone Mosaic compile-validation for the v2 DCN kernels on real TPU.

The full train-step program takes ~60 min per compile attempt through the
remote helper and surfaces ONE Mosaic error per attempt (docs/DESIGN.md
round-2 campaign).  This tool compiles each v2 kernel (fwd / dx / dwmo)
standalone at the EXACT (H, W, C, Co) instances a given per-stage impl mix
puts on the Pallas path, so every per-kernel lowering bug is found in
minutes, before paying for the monolithic compile.

Usage (detached; compiles are minutes each through the remote helper):
  nohup python tools/compile_v2_kernels.py --what fwd,dx,dwmo \
      > /tmp/compile_v2.log 2>&1 &

--oracle additionally cross-checks each kernel against the XLA shift
reference at batch 2 (same clamped-window math) on the device.
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# exact kernel instances of the gather-coarse / pallas2-fine training mix
# (TPU.DCN_IMPL_PER_STAGE = gather,gather,pallas2,pallas2 at 384x1280):
#   ida_2 proj_1..3 (48,160,128,64); ida_2 node_1..3 (96,320,64,64)
#   ida_up proj_1 (48,160,64,64); proj_2 (24,80,64,64); node_1..2 (96,320,64,64)
TRAIN_MIX_SHAPES = [
    (96, 320, 64, 64),
    (48, 160, 128, 64),
    (48, 160, 64, 64),
    (24, 80, 64, 64),
]

# every distinct DCN instance of the full inference mix (all-Pallas neck)
MODEL_SHAPES = [
    (96, 320, 64, 64),    # ida_2 node_1..3, ida_up node_1..2 (5 calls)
    (48, 160, 64, 64),    # ida_up proj_1
    (48, 160, 128, 128),  # ida_1 node_1..2
    (48, 160, 128, 64),   # ida_2 proj_1..3
    (24, 80, 256, 128),   # ida_1 proj_1..2
    (24, 80, 256, 256),   # ida_0 node_1
    (24, 80, 64, 64),     # ida_up proj_2
    (12, 40, 512, 256),   # ida_0 proj_1
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="fwd,dx,dwmo")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--max-offset", type=int, default=2)
    ap.add_argument("--device-time", dest="device_time",
                    action="store_true",
                    help="also record profiler-trace device ms per call")
    ap.add_argument("--oracle", action="store_true",
                    help="cross-check vs XLA shift impl at batch 2")
    ap.add_argument("--packed-parity", dest="packed_parity",
                    action="store_true",
                    help="diff each packed kernel vs its unpacked twin ON "
                         "DEVICE (catches dynamic-roll corruption that "
                         "interpret mode cannot)")
    ap.add_argument("--shapes", default="train",
                    help="'train' (4-shape pallas2-fine mix), 'model' "
                         "(all 8 distinct inference instances), 'hot' "
                         "(the dominant (96,320,64,64) shape only), or an "
                         "explicit 'H,W,C,Co[;H,W,C,Co...]' list")
    ap.add_argument("--out", default="/tmp/compile_v2.jsonl")
    args = ap.parse_args()

    from monoflex_tpu.ops import dcn_pallas_v2 as V2
    from monoflex_tpu.ops import dcn_pallas_v3 as V3
    from monoflex_tpu.ops.dcn import modulated_deform_conv_shift

    R = args.max_offset
    rng = np.random.RandomState(0)

    if args.shapes == "model":
        shapes = MODEL_SHAPES
    elif args.shapes == "train":
        shapes = TRAIN_MIX_SHAPES
    elif args.shapes == "hot":
        shapes = MODEL_SHAPES[:1]
    else:
        shapes = []
        for s in args.shapes.split(";"):
            fields = [tok.strip() for tok in s.split(",")]
            if len(fields) != 4 or not all(tok.isdigit() for tok in fields):
                ap.error(f"--shapes entry {s!r} must be 'H,W,C,Co' "
                         "(four comma-separated ints)")
            shapes.append(tuple(int(tok) for tok in fields))
    for (H, W, C, Co) in shapes:
        B = args.batch
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
        off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
        mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
        bias = jnp.zeros((Co,), jnp.float32)
        g = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)

        fns = {
            "fwd": lambda: V2.dcn_pallas_v2(x, off, mask, w, bias,
                                            max_offset=R),
            "dx": lambda: V2.dcn_pallas_v2_bwd_dx(x, off, mask, w, g,
                                                  max_offset=R),
            "dwmo": lambda: V2.dcn_pallas_v2_bwd_dwmo(x, off, mask, w, g,
                                                      max_offset=R),
            "dwm": lambda: V2.dcn_pallas_v2_bwd_dwm(x, off, mask, w, g,
                                                    max_offset=R),
            "doff": lambda: V2.dcn_pallas_v2_bwd_doff(x, off, mask, w, g,
                                                      max_offset=R),
            "fwd3": lambda: V3.dcn_pallas_v3(x, off, mask, w, bias,
                                             max_offset=R),
            "dx3": lambda: V3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g,
                                                   max_offset=R),
            "dwmo3": lambda: V3.dcn_pallas_v3_bwd_dwmo(x, off, mask, w, g,
                                                       max_offset=R),
            # bf16-shipped x, f32 window math; must match fwd3 on the
            # bf16-quantized input bitwise
            "fwd3b": lambda: V3.dcn_pallas_v3(x, off, mask, w, bias,
                                              max_offset=R,
                                              transfer_dtype=jnp.bfloat16),
            "dwmo3b": lambda: V3.dcn_pallas_v3_bwd_dwmo(
                x, off, mask, w, g, max_offset=R,
                transfer_dtype=jnp.bfloat16),
            # roll-free dx (python-unrolled taps, rows-untiled maps)
            "dx4": lambda: V3.dcn_pallas_v4_bwd_dx(x, off, mask, w, g,
                                                   max_offset=R),
            # bf16-shipped g+W: u = W^T g accumulates f32 (exact), so this
            # must match dx4 fed bf16-quantized (g, W)
            "dx4b": lambda: V3.dcn_pallas_v4_bwd_dx(
                x, off, mask, w, g, max_offset=R,
                transfer_dtype=jnp.bfloat16),
            # window-sum-then-contract dx (g banks staged once per grid step,
            # W^T contraction on the MXU after the sweep)
            "dx5": lambda: V3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g,
                                                   max_offset=R),
            # bf16-shipped g (W stays f32): window sum accumulates the
            # upcast g, so this must match dx5 fed bf16-quantized g
            "dx5b": lambda: V3.dcn_pallas_v5_bwd_dx(
                x, off, mask, w, g, max_offset=R,
                transfer_dtype=jnp.bfloat16),
        }
        if C == 64 and Co == 64 and W % 2 == 0:
            fns["packed"] = lambda: V2.dcn_pallas_v2_packed(
                x, off, mask, w, bias, max_offset=R)
            fns["dwmop"] = lambda: V2.dcn_pallas_v2_packed_bwd_dwmo(
                x, off, mask, w, g, max_offset=R)
            fns["dxp"] = lambda: V2.dcn_pallas_v2_packed_bwd_dx(
                x, off, mask, w, g, max_offset=R)
        for what in args.what.split(","):
            if what not in fns:
                continue
            rec = {"shape": [H, W, C, Co], "kernel": what, "batch": B, "R": R}
            try:
                t0 = time.perf_counter()
                out = fns[what]()
                jax.block_until_ready(out)
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    out = fns[what]()
                jax.block_until_ready(out)
                rec["ms_loop"] = round(
                    (time.perf_counter() - t0) / args.iters * 1e3, 3)
                if args.device_time:
                    from trace_time import device_time

                    ms, _ = device_time(fns[what], iters=args.iters)
                    rec["ms_device"] = round(ms, 3)
            except Exception:  # noqa: BLE001
                rec["error"] = traceback.format_exc()[-1600:]
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")

        # on-device parity: the b-variants == their f32 kernel fed the
        # bf16-quantized x
        xq = x.astype(jnp.bfloat16).astype(jnp.float32)
        b_pairs = {
            "fwd3b": ("b-parity-fwd3", lambda: V3.dcn_pallas_v3(
                xq, off, mask, w, bias, max_offset=R)),
            "dwmo3b": ("b-parity-dwmo3", lambda: V3.dcn_pallas_v3_bwd_dwmo(
                xq, off, mask, w, g, max_offset=R)),
            # dx4 vs dx3: identical math, roll-free formulation
            "dx4": ("dx4-parity-dx3", lambda: V3.dcn_pallas_v3_bwd_dx(
                x, off, mask, w, g, max_offset=R)),
            # dx4b vs dx4 on bf16-quantized (g, W)
            "dx4b": ("b-parity-dx4", lambda: V3.dcn_pallas_v4_bwd_dx(
                x, off, mask,
                w.astype(jnp.bfloat16).astype(jnp.float32),
                g.astype(jnp.bfloat16).astype(jnp.float32), max_offset=R)),
            # dx5 vs dx3: same math, reassociated contraction (f32 rounding)
            "dx5": ("dx5-parity-dx3", lambda: V3.dcn_pallas_v3_bwd_dx(
                x, off, mask, w, g, max_offset=R)),
            # dx5b vs dx5 on bf16-quantized g (W stays f32 in dx5)
            "dx5b": ("b-parity-dx5", lambda: V3.dcn_pallas_v5_bwd_dx(
                x, off, mask, w,
                g.astype(jnp.bfloat16).astype(jnp.float32), max_offset=R)),
        }
        for what, (tag, ref_fn) in b_pairs.items():
            if what not in args.what.split(","):
                continue
            rec = {"shape": [H, W, C, Co], "kernel": tag, "batch": B, "R": R}
            try:
                refs = jax.block_until_ready(ref_fn())
                gots = jax.block_until_ready(fns[what]())
                if not isinstance(refs, tuple):
                    refs, gots = (refs,), (gots,)
                relerr = 0.0
                for ref, got in zip(refs, gots):
                    denom = float(jnp.max(jnp.abs(ref))) or 1.0
                    relerr = max(relerr,
                                 float(jnp.max(jnp.abs(ref - got))) / denom)
                rec["relerr"] = round(relerr, 9)
            except Exception:  # noqa: BLE001
                rec["error"] = traceback.format_exc()[-1600:]
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")

        if args.packed_parity and C == 64 and Co == 64 and W % 2 == 0:
            pairs = {
                "fwd": (fns.get("packed"), fns.get("fwd")),
                "dx": (fns.get("dxp"), fns.get("dx")),
                "dwmo": (fns.get("dwmop"), fns.get("dwmo")),
            }
            for name, (pf, uf) in pairs.items():
                rec = {"shape": [H, W, C, Co],
                       "kernel": f"packed-parity-{name}", "batch": B, "R": R}
                try:
                    got = jax.tree.leaves(jax.block_until_ready(pf()))
                    ref = jax.tree.leaves(jax.block_until_ready(uf()))
                    for i, (r, t) in enumerate(zip(ref, got)):
                        denom = float(jnp.max(jnp.abs(r))) or 1.0
                        rec[f"relerr_{i}"] = round(
                            float(jnp.max(jnp.abs(r - t))) / denom, 7)
                except Exception:  # noqa: BLE001
                    rec["error"] = traceback.format_exc()[-1600:]
                line = json.dumps(rec)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")

        if args.oracle and "error" not in rec:
            # batch-2 numeric cross-check of the full VJP vs the XLA shift
            # implementation (identical clamped-window math)
            b2 = 2
            x2, off2 = x[:b2], off[:b2]
            m2, g2 = mask[:b2], g[:b2]

            def loss_shift(x, off, m, w, bias):
                return jnp.vdot(modulated_deform_conv_shift(
                    x, off, m, w, bias, max_offset=R), g2)

            def loss_v2(x, off, m, w, bias):
                return jnp.vdot(V2.dcn_pallas_v2_vjp(
                    x, off, m, w, bias, R), g2)

            def loss_v3(x, off, m, w, bias):
                return jnp.vdot(V3.dcn_pallas_v3_vjp(
                    x, off, m, w, bias, R), g2)

            impls = {"vjp-parity": loss_v2}
            if any(k.endswith("3") for k in args.what.split(",")):
                impls["vjp-parity-v3"] = loss_v3
            for tag, loss_fn in impls.items():
                rec = {"shape": [H, W, C, Co], "kernel": tag, "batch": b2}
                try:
                    ref = jax.grad(loss_shift, argnums=(0, 1, 2, 3, 4))(
                        x2, off2, m2, w, bias)
                    got = jax.grad(loss_fn, argnums=(0, 1, 2, 3, 4))(
                        x2, off2, m2, w, bias)
                    for name, r, t in zip(("dx", "doff", "dmask", "dw", "db"),
                                          ref, got):
                        denom = float(jnp.max(jnp.abs(r))) or 1.0
                        rec[f"relerr_{name}"] = round(
                            float(jnp.max(jnp.abs(r - t))) / denom, 6)
                except Exception:  # noqa: BLE001
                    rec["error"] = traceback.format_exc()[-1600:]
                line = json.dumps(rec)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    main()
