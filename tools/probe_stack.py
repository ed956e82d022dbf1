"""Find how many Pallas DCN fwd+bwd kernels one XLA program can hold before
the remote compile helper dies (the full train step SIGKILLs it).

Compiles jit programs containing the first n distinct DCN shapes, each as
dcn_pallas_vjp under jax.grad, for n in --counts. Logs per-n success/time.

Usage: nohup python tools/probe_stack.py --counts 2,4,8 > /tmp/probe_stack.log 2>&1 &
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", default="2,4,8")
    ap.add_argument("--variant", default="f32r2")
    ap.add_argument("--impl", default="v1", choices=["v1", "v2"])
    ap.add_argument("--what", default="grad", choices=["grad", "fwd"])
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--out", default="/tmp/probe_stack.jsonl")
    args = ap.parse_args()

    if args.impl == "v2":
        from monoflex_tpu.ops.dcn_pallas_v2 import dcn_pallas_v2_vjp as dcn_pallas_vjp
    else:
        from monoflex_tpu.ops.dcn_pallas_bwd import dcn_pallas_vjp

    dtype, R = VARIANTS[args.variant]
    rng = np.random.RandomState(0)
    B = args.batch

    for n in [int(c) for c in args.counts.split(",")]:
        reps = -(-n // len(MODEL_SHAPES))
        shapes = (MODEL_SHAPES * reps)[:n]
        inputs = []
        for (H, W, C, Co) in shapes:
            inputs.append((
                jnp.asarray(rng.randn(B, H, W, C), dtype),
                jnp.asarray(rng.randn(B, H, W, 18) * 1.5, jnp.float32),
                jnp.asarray(rng.rand(B, H, W, 9), jnp.float32),
                jnp.asarray(rng.randn(3, 3, C, Co) * 0.05, jnp.float32),
                jnp.zeros((Co,), jnp.float32),
            ))

        # data passes as ARGUMENTS: a closure would bake hundreds of MB of
        # array constants into the lowered program (and blow the remote
        # compile relay's request-size limit, as round-2 learned the hard way)
        def loss(params, data):
            total = 0.0
            for (x, off, mask), (w, b) in zip(data, params):
                y = dcn_pallas_vjp(x, off, mask, w, b, R)
                total = total + jnp.sum(y * y)
            return total

        params = [(w, b) for (_, _, _, w, b) in inputs]
        data = [(x, off, mask) for (x, off, mask, _, _) in inputs]
        grad_fn = jax.jit(jax.grad(loss) if args.what == "grad" else loss)
        rec = {"n_layers": n, "variant": args.variant, "impl": args.impl,
               "what": args.what}
        try:
            t0 = time.perf_counter()
            g = grad_fn(params, data)
            jax.block_until_ready(g)
            rec["compile_s"] = round(time.perf_counter() - t0, 1)
            t0 = time.perf_counter()
            for _ in range(3):
                g = grad_fn(params, data)
            jax.block_until_ready(g)
            rec["ms_per_iter"] = round((time.perf_counter() - t0) / 3 * 1e3, 2)
        except Exception:  # noqa: BLE001
            rec["error"] = traceback.format_exc()[-1500:]
        line = json.dumps(rec)
        print(line, flush=True)
        with open(args.out, "a") as f:
            f.write(line + "\n")
        if "error" in rec:
            break


if __name__ == "__main__":
    main()
