"""DCN kernel variant sweep with triangulated timing on real TPU.

For each (variant, shape): forward + the three backward kernels, timed three
ways to guard against async-dispatch artifacts on the remote-tunnel backend:
  t_loop   — N dispatches, block on the final result (standard)
  t_device — per-call device time from the profiler trace (trace_time.py)
  t_percall— block_until_ready after every call (includes dispatch latency)
Report all three; t_device is the trusted number.

Usage: nohup python tools/kernel_sweep.py --variants f32r2,bf16r2,f32r1,bf16r1 \
        --shapes 0,3,7 --out /tmp/ksweep.jsonl > /tmp/ksweep.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from kernel_bench import MODEL_SHAPES, VARIANTS  # noqa: E402


def time_three_ways(fn, x0, iters):
    """Returns (t_loop, t_device, t_percall) in seconds.

    t_device (the trusted number) comes from the profiler trace: wall-clock
    chains on this tunnel backend have reported times 70x below real device
    time (tools/trace_time.py).  The loop/percall wall numbers remain for
    dispatch-overhead context only."""
    from trace_time import device_time

    out = fn(x0)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x0)
    jax.block_until_ready(out)
    t_loop = (time.perf_counter() - t0) / iters

    dev_ms, _ = device_time(lambda: fn(x0), iters=iters)
    t_device = dev_ms / 1e3

    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(x0))
    t_percall = (time.perf_counter() - t0) / iters
    return t_loop, t_device, t_percall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="f32r2,bf16r2,f32r1,bf16r1")
    ap.add_argument("--shapes", default="0")
    ap.add_argument("--what", default="fwd,dx,dwm,doff")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/ksweep.jsonl")
    args = ap.parse_args()

    from monoflex_tpu.ops import dcn_pallas_bwd as DB
    from monoflex_tpu.ops.dcn_pallas import dcn_pallas

    shapes = (MODEL_SHAPES if args.shapes == "all"
              else [MODEL_SHAPES[int(i)] for i in args.shapes.split(",")])
    rng = np.random.RandomState(0)
    B = args.batch

    for vname in args.variants.split(","):
        dtype, R = VARIANTS[vname]
        for (H, W, C, Co) in shapes:
            x0 = jnp.asarray(rng.randn(B, H, W, C), dtype)
            off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
            mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
            w = jnp.asarray(rng.randn(3, 3, C, C) * 0.05, jnp.float32)  # square for chaining
            b = jnp.zeros((C,), jnp.float32)
            g = jnp.asarray(rng.randn(B, H, W, C), jnp.float32)

            from monoflex_tpu.ops.dcn_pallas_v2 import dcn_pallas_v2

            fns = {
                "fwd": lambda x: dcn_pallas(x, off, mask, w, b, max_offset=R,
                                            compute_dtype=dtype).astype(dtype),
                "fwd2": lambda x: dcn_pallas_v2(x, off, mask, w, b,
                                                max_offset=R,
                                                compute_dtype=dtype).astype(dtype),
                "dx": lambda x: DB.dcn_pallas_bwd_dx(
                    x, off, mask, w, g, max_offset=R,
                    compute_dtype=dtype).astype(dtype),
                "dwm": None,   # not chainable on x (returns dmask, dw)
                "doff": None,  # returns (B,H,W,18)
            }

            for what in args.what.split(","):
                rec = {"variant": vname, "shape": [H, W, C, C], "kernel": what,
                       "batch": B}
                try:
                    t0 = time.perf_counter()
                    if fns.get(what) is not None:
                        fn = fns[what]
                        tl, tc, tp = time_three_ways(fn, x0, args.iters)
                        rec.update(ms_loop=round(tl * 1e3, 3),
                                   ms_device=round(tc * 1e3, 3),
                                   ms_percall=round(tp * 1e3, 3))
                    else:
                        kfn = {"dwm": DB.dcn_pallas_bwd_dwm,
                               "doff": DB.dcn_pallas_bwd_doff}[what]
                        # chain through a reduction back onto x
                        def chained(x, kfn=kfn):
                            out = kfn(x, off, mask, w, g, max_offset=R,
                                      compute_dtype=dtype)
                            leaf = out[0] if isinstance(out, tuple) else out
                            return x + jnp.mean(leaf).astype(x.dtype)

                        cfn = jax.jit(chained)
                        tl, tc, tp = time_three_ways(cfn, x0, args.iters)
                        rec.update(ms_loop=round(tl * 1e3, 3),
                                   ms_device=round(tc * 1e3, 3),
                                   ms_percall=round(tp * 1e3, 3))
                    rec["compile_s"] = round(time.perf_counter() - t0
                                             - 3 * args.iters * (tl + tc + tp) / 3, 1)
                except Exception:  # noqa: BLE001
                    rec["error"] = traceback.format_exc()[-1200:]
                line = json.dumps(rec)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    main()
