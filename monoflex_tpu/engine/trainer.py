"""Training orchestration loop.

Re-design of the reference trainer (reference: engine/trainer.py:61-225):
iteration-based loop over an infinite loader, windowed metric logging with
ETA, periodic checkpointing, periodic evaluation with best-model gating on
``Car_3d_0.70/moderate`` (AP R40), and scalar logging to TensorBoard when
available (JSONL always).

The device-side work is a single jitted train step (train_step.py); this
module only moves host batches, logs, and checkpoints.
"""

from __future__ import annotations

import datetime
import json
import logging
import os
import time
from typing import Dict, Optional

import jax
import numpy as np

from ..parallel.mesh import shard_batch
from ..train.checkpoint import Checkpointer
from ..utils import comm
from ..utils.metric_logger import MetricLogger
from .inference import inference

DEFAULT_KEY_METRIC = "Car_3d_0.70/moderate"


class ScalarWriter:
    """TensorBoard if torch is importable, JSONL always.

    Writes only on the main process (reference rank-gates all output:
    tools/plain_train_net.py:62); other ranks get a no-op writer so a
    multi-host pod never has two processes appending to one file."""

    def __init__(self, log_dir: str):
        self.enabled = comm.is_main_process()
        self.jsonl = None
        self.tb = None
        if not self.enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.tb = SummaryWriter(log_dir=log_dir)
        except Exception:
            pass

    def write(self, step: int, scalars: Dict[str, float], prefix: str = "") -> None:
        if not self.enabled:
            return
        record = {"step": step}
        for k, v in scalars.items():
            key = f"{prefix}{k}"
            record[key] = float(v)
            if self.tb is not None:
                self.tb.add_scalar(key, float(v), step)
        self.jsonl.write(json.dumps(record) + "\n")
        self.jsonl.flush()

    def close(self) -> None:
        if self.jsonl is not None:
            self.jsonl.close()
        if self.tb is not None:
            self.tb.close()


MAX_CONSECUTIVE_SKIPS = 20  # abort if this many steps in a row are non-finite


def do_train(cfg, model, train_step, eval_step, state, train_loader,
             eval_dataset=None, mesh=None, schedule=None,
             logger: Optional[logging.Logger] = None,
             max_iter: Optional[int] = None,
             start_iter: int = 0,
             profile_steps: int = 0) -> "object":
    logger = logger or logging.getLogger("monoflex.trainer")
    output_dir = cfg.OUTPUT_DIR
    writer = ScalarWriter(os.path.join(output_dir, "tensorboard"))
    checkpointer = Checkpointer(os.path.join(output_dir, "ckpt"),
                                cfg.SOLVER.LOAD_OPTIMIZER_SCHEDULER)

    steps_per_epoch = max(1, len(train_loader.dataset) // cfg.SOLVER.IMS_PER_BATCH)
    if max_iter is None:
        if cfg.SOLVER.EVAL_AND_SAVE_EPOCH:
            max_iter = cfg.SOLVER.MAX_EPOCHS * steps_per_epoch
            eval_interval = cfg.SOLVER.EVAL_EPOCH_INTERVAL * steps_per_epoch
            save_interval = cfg.SOLVER.SAVE_CHECKPOINT_EPOCH_INTERVAL * steps_per_epoch
        else:
            max_iter = cfg.SOLVER.MAX_ITERATION
            eval_interval = cfg.SOLVER.EVAL_INTERVAL
            save_interval = cfg.SOLVER.SAVE_CHECKPOINT_INTERVAL
    else:
        eval_interval = cfg.SOLVER.EVAL_INTERVAL
        save_interval = cfg.SOLVER.SAVE_CHECKPOINT_INTERVAL

    meters = MetricLogger()
    best_ap = -1.0
    consecutive_skips = 0
    iteration = start_iter
    last_log_iter = start_iter
    data_iter = iter(train_loader)
    pending_batch = None
    if comm.get_world_size() > 1 and mesh is not None:
        # pre-compile the step, then meet at a COORDINATOR barrier: the first
        # collective dispatch must not be skewed by multi-minute per-host
        # compiles (device-collective rendezvous timeouts are much tighter
        # than a cold compile)
        pending_batch = shard_batch(next(data_iter), mesh)
        try:
            train_step.lower(state, pending_batch).compile()
        except AttributeError:
            pass  # not a jitted callable (tests pass plain functions)
        comm.coordination_barrier("train_step_compiled")
    logger.info(f"start training: {max_iter} iterations "
                f"({steps_per_epoch} steps/epoch)")
    if profile_steps > 0:
        # capture an XLA trace of the first steady-state steps
        # (reference has only wall-clock timers, SURVEY §5.1 — this is richer)
        jax.profiler.start_trace(os.path.join(output_dir, "profile"))
    end = time.time()
    end_window = end

    while iteration < max_iter:
        if pending_batch is not None:
            batch, pending_batch = pending_batch, None
        else:
            batch = next(data_iter)
            if mesh is not None:
                batch = shard_batch(batch, mesh)
        data_time = time.time() - end
        state, metrics = train_step(state, batch)
        iteration += 1

        if profile_steps > 0 and iteration - start_iter == profile_steps:
            jax.block_until_ready(metrics["total_loss"])
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {output_dir}/profile")
            profile_steps = 0

        if iteration % 10 == 0 or iteration == max_iter:
            metrics = {k: float(v) for k, v in jax.device_get(metrics).items()}
            # exact device-side counter (train_step.py accumulates it in
            # TrainState, so no non-finite step can hide between log points)
            consecutive_skips = int(metrics.get("consecutive_skips", 0.0))
            if consecutive_skips >= MAX_CONSECUTIVE_SKIPS:
                logger.error(
                    f"aborting: {consecutive_skips} consecutive non-finite "
                    f"steps (bad data or diverged optimizer)")
                checkpointer.save("model_aborted", state)
                writer.close()
                return state
            # device_get above synchronized on the metric values, so the
            # window since the last log point covers every dispatched step
            # (async dispatch: intermediate iterations return futures
            # instantly; dividing by the window length gives true s/step)
            window = max(1, iteration - last_log_iter)
            batch_time = (time.time() - end_window) / window
            last_log_iter = iteration
            end_window = time.time()
            meters.update(time=batch_time, data=data_time, **metrics)
            eta = datetime.timedelta(
                seconds=int(meters.meters["time"].global_avg * (max_iter - iteration)))
            lr = float(schedule(iteration)) if schedule is not None else float("nan")
            logger.info(f"iter {iteration}/{max_iter}  eta: {eta}  {meters}  lr: {lr:.6f}")
            writer.write(iteration, metrics, prefix="train/")
            if schedule is not None:
                writer.write(iteration, {"lr": lr})
        end = time.time()

        if iteration % save_interval == 0 and iteration != max_iter:
            checkpointer.save(f"model_checkpoint_{iteration}", state)

        if eval_dataset is not None and iteration % eval_interval == 0:
            logger.info(f"evaluating at iteration {iteration}")
            # with parameter EMA enabled, evaluate (and best-checkpoint) the
            # averaged weights — the raw weights stay in state for training
            from ..train.solver import get_ema_params

            ema = get_ema_params(state.opt_state)
            eval_state = state._replace(params=ema) if ema is not None else state
            results = inference(cfg, eval_step, eval_state, eval_dataset,
                                os.path.join(output_dir, f"eval_{iteration}"),
                                metrics=cfg.TEST.METRIC, logger=logger)
            # non-main ranks return early from inference() without AP keys,
            # but Checkpointer.save below is an orbax collective every
            # process must enter — share rank 0's result dict first
            results = comm.broadcast_object(results)
            writer.write(iteration, {k: v for k, v in results.items()
                                     if isinstance(v, (int, float))}, prefix="eval/")
            key_ap = results.get(DEFAULT_KEY_METRIC, None)
            if key_ap is not None and key_ap >= best_ap:
                best_ap = key_ap
                # save the WEIGHTS THAT WERE EVALUATED (EMA if enabled), so
                # --eval --ckpt <best> reproduces the gated metric
                checkpointer.save(f"model_moderate_best_{cfg.MODEL.HEAD.OUTPUT_DEPTH}",
                                  eval_state, tag_last=False)
                logger.info(f"new best {DEFAULT_KEY_METRIC}: {best_ap:.4f}")

    checkpointer.save("model_final", state)
    # with EMA the logged eval metrics come from the averaged weights;
    # ship them as their own artifact so deploys reproduce those numbers
    # (model_final stays raw — it is the resume point)
    from ..train.solver import get_ema_params

    ema = get_ema_params(state.opt_state)
    if ema is not None:
        checkpointer.save("model_final_ema", state._replace(params=ema),
                          tag_last=False)
    writer.close()
    logger.info(f"training done; best {DEFAULT_KEY_METRIC}: {best_ap:.4f}")
    return state
