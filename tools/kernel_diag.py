"""Decompose the Pallas DCN forward kernel's cost into buckets on real TPU.

The round-1 profile showed the stride-4 kernel at ~19.5 ms vs a ~2 ms
VPU+MXU roofline and a ~6 ms floor on tiny stride-32 maps.  Before
restructuring (docs/DESIGN.md round-2 levers) this tool times stripped-down
variants of the SAME kernel structure to attribute the gap:

  full     — the shipping kernel body (copy), (2R+1)^2 window + mask + matmul
  dma      — halo DMA only, output written from the window buffer untouched
  window   — window accumulation only (no mask, no matmul; out = sum of taps)
  aligned  — window with all dx lane-shifts replaced by dx=0 (isolates the
             misaligned-lane-slice penalty)
  matmul   — per-tap contraction only (single term per tap, no window loop)
  rowdot   — like matmul but contracting with one fused (9C) matmul per row
             instead of 9 separate per-tap dots

Variants live HERE (not in ops/dcn_pallas.py) so the shipping kernel's
persistent-cache entries stay byte-identical.

Usage:
  nohup python tools/kernel_diag.py --shapes 0,4 --variants full,dma,window,aligned,matmul \
      --out /tmp/kdiag.jsonl > /tmp/kdiag.log 2>&1 &
"""

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_GUARD = 8

from kernel_bench import MODEL_SHAPES  # noqa: E402  (the 8 flagship shapes)


def _kernel(x_hbm, off_ref, mask_ref, w_ref, out_ref, xv_ref, s_ref,
            acc_ref, sem, *, tile_h, width, R, variant):
    P = R + 1
    b = pl.program_id(0)
    row0 = pl.program_id(1) * tile_h
    win_h = xv_ref.shape[1]

    copy = pltpu.make_async_copy(
        x_hbm.at[b, :, pl.ds(row0, win_h), :], xv_ref, sem)
    copy.start()
    copy.wait()

    if variant == "dma":
        out_ref[0] = xv_ref[:out_ref.shape[1], _GUARD:_GUARD + tile_h,
                            P:P + width].astype(out_ref.dtype)
        return

    acc_ref[...] = jnp.zeros_like(acc_ref)
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        oy = jnp.clip(off_ref[0, 2 * k], -R, R)
        ox = jnp.clip(off_ref[0, 2 * k + 1], -R, R)

        s_ref[...] = jnp.zeros_like(s_ref)
        if variant == "matmul":
            # one term per tap: the im2col sample without the window
            s_ref[...] = xv_ref[:, _GUARD + ky: _GUARD + ky + tile_h,
                                P + kx: P + kx + width]
        else:
            for dy in range(ky - R, ky + R + 1):
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(oy + (ky - dy)))
                rows = xv_ref[:, _GUARD + dy: _GUARD + dy + tile_h, :]
                for dx in range(kx - R, kx + R + 1):
                    w_map = wy * jnp.maximum(0.0, 1.0 - jnp.abs(ox + (kx - dx)))
                    if variant == "aligned":
                        window = rows[:, :, P: P + width]
                    else:
                        window = rows[:, :, P + dx: P + dx + width]
                    s_ref[...] += window * w_map[None]

        if variant in ("window", "aligned"):
            acc_ref[...] += s_ref[...][:acc_ref.shape[0]]
            continue
        sk = s_ref[...] * mask_ref[0, k][None]
        wk = w_ref[k]
        for h in range(tile_h):
            acc_ref[:, h, :] += jnp.dot(wk, sk[:, h, :],
                                        preferred_element_type=jnp.float32)
    out_ref[0] = acc_ref[...].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("R", "variant"))
def run_variant(x, offset, mask, weight, R, variant):
    B, H, W, C = x.shape
    Co = weight.shape[-1]
    P = R + 1
    tile_h = 8 if H > 16 else 16
    pad_h = (-H) % tile_h
    Hp = H + pad_h
    win_h = tile_h + 2 * _GUARD
    Wx = W + 2 * P
    Wx = Wx + (-Wx) % 128

    xt = jnp.transpose(x, (0, 3, 1, 2))
    xt = jnp.pad(xt, ((0, 0), (0, 0), (_GUARD, _GUARD + pad_h), (P, Wx - W - P)))
    off_t = jnp.transpose(offset, (0, 3, 1, 2))
    mask_t = jnp.transpose(mask, (0, 3, 1, 2))
    if pad_h:
        off_t = jnp.pad(off_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
        mask_t = jnp.pad(mask_t, ((0, 0), (0, 0), (0, pad_h), (0, 0)))
    w_t = jnp.transpose(weight.reshape(9, C, Co), (0, 2, 1))

    co_out = C if variant in ("window", "aligned", "dma") else Co
    kernel = functools.partial(_kernel, tile_h=tile_h, width=W, R=R,
                               variant=variant)
    out = pl.pallas_call(
        kernel,
        grid=(B, Hp // tile_h),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 18, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((1, 9, tile_h, W), lambda b, h: (b, 0, h, 0)),
            pl.BlockSpec((9, Co, C), lambda b, h: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, co_out, tile_h, W), lambda b, h: (b, 0, h, 0)),
        out_shape=jax.ShapeDtypeStruct((B, co_out, Hp, W), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((C, win_h, Wx), jnp.float32),
            pltpu.VMEM((C, tile_h, W), jnp.float32),
            pltpu.VMEM((co_out, tile_h, W), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xt, off_t, mask_t, w_t)
    return jnp.transpose(out[:, :, :H, :], (0, 2, 3, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shapes", default="0,4")
    ap.add_argument("--variants", default="full,dma,window,aligned,matmul")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--R", type=int, default=2)
    ap.add_argument("--out", default="/tmp/kdiag.jsonl")
    args = ap.parse_args()

    rng = np.random.RandomState(0)
    B = args.batch
    for si in args.shapes.split(","):
        H, W, C, Co = MODEL_SHAPES[int(si)]
        x = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)
        off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
        mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
        for variant in args.variants.split(","):
            rec = {"variant": variant, "shape": [H, W, C, Co], "batch": B}
            try:
                t0 = time.perf_counter()
                out = run_variant(x, off, mask, w, args.R, variant)
                jax.block_until_ready(out)
                rec["compile_s"] = round(time.perf_counter() - t0, 1)
                # serial chain through a data dependency so timings are real
                acc = x
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    o = run_variant(acc, off, mask, w, args.R, variant)
                    acc = acc + 0.0 * o[..., :1]  # depend on o, keep shape
                jax.block_until_ready(acc)
                rec["ms"] = round((time.perf_counter() - t0) / args.iters * 1e3, 3)
            except Exception as e:  # noqa: BLE001
                rec["error"] = repr(e)[:400]
            print(json.dumps(rec), flush=True)
            with open(args.out, "a") as f:
                f.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
