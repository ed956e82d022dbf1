"""Benchmark harness: end-to-end inference throughput on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput numbers (BASELINE.md); the
MonoFlex paper era reports ~0.03 s/img on a V100-class GPU, i.e. ~33 img/s,
which we use as the vs_baseline denominator for single-chip inference.
"""

import json
import os
import time

os.environ.setdefault("XLA_PYTHON_CLIENT_MEM_FRACTION", "0.9")

import jax
import jax.numpy as jnp
import numpy as np

# Pallas/Mosaic kernels compile slowly on this target; the persistent cache
# makes warm runs start in seconds.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

V100_BASELINE_IMG_PER_S = 33.0


def _device_watchdog(seconds: int = 180):
    """Fail fast instead of hanging forever when the TPU tunnel is wedged
    (observed: execution hangs indefinitely after a tunnel fault while
    registration still succeeds).  A tiny device op must complete within
    `seconds`; otherwise print a JSON error line and hard-exit."""
    import threading

    done = threading.Event()

    def killer():
        if not done.wait(seconds):
            print(json.dumps({
                "metric": "inference_images_per_sec_per_chip",
                "value": None, "unit": "img/s", "vs_baseline": None,
                "error": f"device probe hung >{seconds}s (TPU tunnel down)",
            }), flush=True)
            os._exit(3)

    t = threading.Thread(target=killer, daemon=True)
    t.start()
    jax.block_until_ready(jnp.ones((8, 8)) + 1.0)
    done.set()


def main():
    _device_watchdog()
    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.data.synthetic import make_dummy_batch
    from monoflex_tpu.decode.postprocessor import PostProcessor
    from monoflex_tpu.models.detector import build_model

    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "runs", "monoflex.yaml"))
    # escape hatch: BENCH_DCN_IMPL=shift|gather avoids the Pallas kernels'
    # long cold compile when no warm cache is present
    impl = os.environ.get("BENCH_DCN_IMPL")
    if impl == "shift":
        cfg.TPU.USE_PALLAS_DCN = False
    elif impl == "gather":
        cfg.TPU.USE_PALLAS_DCN = False
        cfg.MODEL.BACKBONE.CONV_BODY = "dla34"  # gather picked on non-TPU only
    if os.environ.get("BENCH_KERNEL_VERSION"):
        cfg.TPU.DCN_KERNEL_VERSION = int(os.environ["BENCH_KERNEL_VERSION"])
    if os.environ.get("BENCH_IMPL_PER_STAGE"):
        # e.g. "gather,gather,pallas2,pallas2" (ida_0 deepest ... final ida_up)
        cfg.TPU.DCN_IMPL_PER_STAGE = tuple(
            os.environ["BENCH_IMPL_PER_STAGE"].split(","))
    if os.environ.get("BENCH_DTYPE"):
        cfg.TPU.COMPUTE_DTYPE = os.environ["BENCH_DTYPE"]
    if os.environ.get("BENCH_FUSE_BN_RELU"):
        cfg.TPU.DCN_FUSE_BN_RELU = os.environ["BENCH_FUSE_BN_RELU"] == "1"

    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    model = build_model(cfg)
    post = PostProcessor(cfg)

    batch = {k: jnp.asarray(v) for k, v in make_dummy_batch(batch_size).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["edge_indices"], batch["edge_len"], train=False)

    @jax.jit
    def infer(variables, batch):
        out = model.apply(variables, batch["image"], batch["edge_indices"],
                          batch["edge_len"], train=False)
        result, valid, _ = post(out, batch)
        return result, valid

    # warmup + compile
    r, v = infer(variables, batch)
    jax.block_until_ready(r)

    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)

    iters = int(os.environ.get("BENCH_ITERS", "20"))
    start = time.perf_counter()
    for _ in range(iters):
        r, v = infer(variables, batch)
    jax.block_until_ready(r)
    elapsed = time.perf_counter() - start

    if profile_dir:
        jax.profiler.stop_trace()

    img_per_s = batch_size * iters / elapsed
    print(json.dumps({
        "metric": "inference_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / V100_BASELINE_IMG_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
