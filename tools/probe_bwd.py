"""Probe each split DCN backward kernel's Mosaic compile on real TPU.

Compiles dx / dwm / doff separately per shape, logging full errors, so a
failing kernel is pinpointed instead of a monolithic compile dying opaquely.

Usage: nohup python tools/probe_bwd.py --kernels dx,dwm,doff --shapes 0 \
          --out /tmp/probe_bwd.jsonl > /tmp/probe_bwd.log 2>&1 &
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

from kernel_bench import MODEL_SHAPES, VARIANTS, bench_one  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kernels", default="dx,dwm,doff")
    ap.add_argument("--variants", default="f32r2")
    ap.add_argument("--shapes", default="0")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="/tmp/probe_bwd.jsonl")
    args = ap.parse_args()

    from monoflex_tpu.ops import dcn_pallas_bwd as DB

    kernels = {
        "dx": DB.dcn_pallas_bwd_dx,
        "dwm": DB.dcn_pallas_bwd_dwm,
        "doff": DB.dcn_pallas_bwd_doff,
    }
    shapes = (MODEL_SHAPES if args.shapes == "all"
              else [MODEL_SHAPES[int(i)] for i in args.shapes.split(",")])

    rng = np.random.RandomState(0)
    B = args.batch
    for vname in args.variants.split(","):
        dtype, R = VARIANTS[vname]
        for (H, W, C, Co) in shapes:
            x = jnp.asarray(rng.randn(B, H, W, C), dtype)
            off = jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32)
            mask = jnp.asarray(rng.rand(B, H, W, 9), jnp.float32)
            w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32)
            g = jnp.asarray(rng.randn(B, H, W, Co), jnp.float32)
            for kname in args.kernels.split(","):
                fn = kernels[kname]
                rec = {"kernel": kname, "variant": vname,
                       "shape": [H, W, C, Co], "batch": B}
                try:
                    t0 = time.perf_counter()
                    dt = bench_one(
                        lambda *a: fn(*a, max_offset=R, compute_dtype=dtype),
                        (x, off, mask, w, g), args.iters)
                    rec["ms"] = round(dt * 1e3, 3)
                    rec["compile_s"] = round(
                        time.perf_counter() - t0 - dt * args.iters, 1)
                except Exception:  # noqa: BLE001 - log and continue the sweep
                    rec["error"] = traceback.format_exc()[-4000:]
                line = json.dumps(rec)
                print(line, flush=True)
                with open(args.out, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    main()
