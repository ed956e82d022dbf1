#!/usr/bin/env python
"""Training-step throughput benchmark (images/sec/chip for the full jitted
forward + 11 losses + backward + AdamW step at the real KITTI resolution).

The headline bench (bench.py) measures inference; this covers the training
target (BASELINE.md: >=3x images/sec/chip vs the V100 baseline for both).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if os.environ.get("MONOFLEX_PLATFORM"):
    jax.config.update("jax_platforms", os.environ["MONOFLEX_PLATFORM"])
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))

import jax.numpy as jnp

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.synthetic import make_dummy_batch
from monoflex_tpu.losses.loss_computation import LossComputer
from monoflex_tpu.models.detector import build_model
from monoflex_tpu.train.solver import build_optimizer
from monoflex_tpu.train.train_step import TrainState, make_train_step


def main():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(os.path.dirname(__file__), "..",
                                     "runs", "monoflex.yaml"))
    impl = os.environ.get("BENCH_DCN_IMPL")
    if impl == "shift":
        cfg.TPU.USE_PALLAS_DCN = False
    elif impl == "none":
        # plain-conv neck: isolates whether a compile failure comes from the
        # Pallas kernels or from the rest of the training program
        cfg.MODEL.BACKBONE.CONV_BODY = "dla34_nodcn"
    if os.environ.get("BENCH_REMAT"):
        cfg.TPU.REMAT_BACKBONE = True
    if os.environ.get("BENCH_KERNEL_VERSION"):
        cfg.TPU.DCN_KERNEL_VERSION = int(os.environ["BENCH_KERNEL_VERSION"])
    if os.environ.get("BENCH_IMPL_PER_STAGE"):
        # e.g. "pallas2,pallas,pallas,pallas" (ida_0 deepest ... final ida_up)
        cfg.TPU.DCN_IMPL_PER_STAGE = tuple(
            os.environ["BENCH_IMPL_PER_STAGE"].split(","))
    if os.environ.get("BENCH_DTYPE"):
        cfg.TPU.COMPUTE_DTYPE = os.environ["BENCH_DTYPE"]
    if os.environ.get("BENCH_INPUT"):
        h, w = (int(v) for v in os.environ["BENCH_INPUT"].split("x"))
        cfg.INPUT.HEIGHT_TRAIN = h
        cfg.INPUT.WIDTH_TRAIN = w
    batch_size = int(os.environ.get("BENCH_BATCH", "8"))
    model = build_model(cfg)
    loss_computer = LossComputer(cfg)

    batch = {k: jnp.asarray(v) for k, v in make_dummy_batch(
        batch_size, input_height=cfg.INPUT.HEIGHT_TRAIN,
        input_width=cfg.INPUT.WIDTH_TRAIN).items()}
    variables = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["edge_indices"], batch["edge_len"], train=False)
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))
    step = jax.jit(make_train_step(model, loss_computer, tx), donate_argnums=0)

    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])

    iters = int(os.environ.get("BENCH_ITERS", "10"))
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    start = time.perf_counter()
    for _ in range(iters):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    elapsed = time.perf_counter() - start
    if profile_dir:
        jax.profiler.stop_trace()

    # V100-era train denominator: the reference publishes no train
    # throughput, so BASELINE.md pins 33 img/s inference (paper-era anchor)
    # divided by the measured train:fwd FLOP ratio 545.9/178.9 = 3.05
    # (tools/flops.py) -> 10.8 img/s.  Full derivation: BASELINE.md.
    TRAIN_BASELINE_IMG_S = 10.8
    img_per_s = batch_size * iters / elapsed
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(img_per_s, 2),
        "unit": "img/s",
        "vs_baseline": round(img_per_s / TRAIN_BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
