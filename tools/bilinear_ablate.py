#!/usr/bin/env python
"""Device A/B of the two BilinearUp implementations (phase decomposition vs
lhs-dilated depthwise conv) at the flagship model's 8 call shapes.

The full-program bench moved 99.17 -> 96.39 img/s when the phase
decomposition replaced the dilated conv, while the pallas3b fwd kernels it
shipped alongside are isolated-faster — this pins which impl owns the
regression, per shape, with trace-based device time (wall clocks lie on the
tunnel backend; see tools/trace_time.py).

Forward-only (the inference target) plus a grad variant for the train step.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("MONOFLEX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MONOFLEX_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))

import jax.numpy as jnp
import numpy as np

from monoflex_tpu.models.backbone.dla import BilinearUp
from trace_time import device_time

# (B, H, W, C), factor, count-per-forward at 384x1280 batch 8
SHAPES = [
    ((8, 12, 40, 256), 2, 1),
    ((8, 24, 80, 128), 2, 2),
    ((8, 48, 160, 64), 2, 4),
    ((8, 24, 80, 64), 4, 1),
]


def main():
    iters = int(os.environ.get("ABL_ITERS", "10"))
    grad = bool(os.environ.get("ABL_GRAD"))
    out_path = os.environ.get("ABL_OUT", "/tmp/bilinear_ablate.jsonl")
    rng = np.random.RandomState(0)
    for shape, f, n in SHAPES:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32))
        for impl in ("phase", "dilated"):
            mod = BilinearUp(f, impl=impl)
            params = mod.init(jax.random.PRNGKey(0), x)

            if grad:
                @jax.jit
                def run(p, x):
                    def loss(p, x):
                        return jnp.sum(mod.apply(p, x) ** 2)
                    return jax.grad(loss, argnums=(0, 1))(p, x)
            else:
                run = jax.jit(mod.apply)

            ms, _ = device_time(lambda: run(params, x), iters=iters)
            rec = {"shape": list(shape), "factor": f, "per_fwd": n,
                   "impl": impl, "grad": grad, "ms_device": round(ms, 4)}
            line = json.dumps(rec)
            print(line, flush=True)
            with open(out_path, "a") as fh:
                fh.write(line + "\n")


if __name__ == "__main__":
    main()
