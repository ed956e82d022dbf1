"""Standalone DCN Pallas kernel micro-benchmark on real TPU hardware.

Times the forward (and optionally backward) kernels for every DCN shape the
flagship model instantiates at 384x1280/batch-8, across dtype/R variants.
Appends one JSON line per measurement to --out so a detached run can be
monitored and survives interruptions.

Usage (detached; cold Mosaic compiles take minutes per shape):
    nohup python tools/kernel_bench.py --variants f32r2,bf16r1 \
        --out /tmp/kbench.jsonl > /tmp/kbench.log 2>&1 &
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# (H, W, C, Co) of every DCN call in the flagship neck (see dla.py IDAUp)
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

VARIANTS = {
    "f32r2": (jnp.float32, 2),
    "f32r1": (jnp.float32, 1),
    "bf16r2": (jnp.bfloat16, 2),
    "bf16r1": (jnp.bfloat16, 1),
}


def bench_one(fn, args, iters=20):
    out = fn(*args)
    jax.block_until_ready(out)
    start = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - start) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variants", default="f32r2,bf16r1")
    ap.add_argument("--shapes", default="all", help="'all', 'first' or i,j,k")
    ap.add_argument("--bwd", action="store_true", help="also time backward kernels")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--out", default="/tmp/kbench.jsonl")
    args = ap.parse_args()

    from monoflex_tpu.ops.dcn_pallas import dcn_pallas
    from monoflex_tpu.ops.dcn_pallas_bwd import dcn_pallas_bwd

    if args.shapes == "all":
        shapes = MODEL_SHAPES
    elif args.shapes == "first":
        shapes = MODEL_SHAPES[:1]
    else:
        shapes = [MODEL_SHAPES[int(i)] for i in args.shapes.split(",")]

    rng = np.random.RandomState(0)
    B = args.batch
    for vname in args.variants.split(","):
        dtype, R = VARIANTS[vname]
        for (H, W, C, Co) in shapes:
            x = jnp.asarray(rng.randn(B, H, W, C), dtype)
            off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
            mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
            w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
            b = jnp.zeros((Co,), jnp.float32)
            rec = {"variant": vname, "shape": [H, W, C, Co], "batch": B}
            try:
                t0 = time.perf_counter()
                dt = bench_one(
                    lambda *a: dcn_pallas(*a, max_offset=R, compute_dtype=dtype),
                    (x, off, mask, w, b), args.iters)
                rec["fwd_ms"] = round(dt * 1e3, 3)
                rec["fwd_compile_s"] = round(time.perf_counter() - t0 - dt * args.iters, 1)
            except Exception as e:  # noqa: BLE001 - log and continue the sweep
                rec["fwd_error"] = repr(e)[:500]
            if args.bwd and "fwd_error" not in rec:
                g = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)
                try:
                    t0 = time.perf_counter()
                    dt = bench_one(
                        lambda *a: dcn_pallas_bwd(*a, max_offset=R,
                                                  compute_dtype=dtype),
                        (x, off, mask, w, g), args.iters)
                    rec["bwd_ms"] = round(dt * 1e3, 3)
                    rec["bwd_compile_s"] = round(time.perf_counter() - t0 - dt * args.iters, 1)
                except Exception as e:  # noqa: BLE001
                    rec["bwd_error"] = repr(e)[:500]
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.out, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main()
