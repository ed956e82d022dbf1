"""Optimizer + LR schedule factories (optax).

Capability port of the reference solver (reference: solver/__init__.py:10-92):
AdamW/Adam/SGD with betas (0.9, 0.99), bias parameters at BIAS_LR_FACTOR x
base LR, multi-step decay with an LR floor, optional cosine warmup, and a
one-cycle cosine schedule (the fastai OneCycle equivalent,
reference: solver/learning_schedules_fastai.py:60-79).

LR scaling by parameter group is realized as an optax scale mask rather than
torch param groups; the schedule multiplies the shared base LR.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import optax


def multi_step_schedule(base_lr: float, decay_steps: Sequence[int], decay: float,
                        lr_clip: float, warmup_steps: int = 0,
                        warmup_div: float = 10.0) -> Callable:
    """LR(step): base * decay^(#milestones passed), floored at lr_clip; optional
    cosine warmup from base/warmup_div (reference: solver/__init__.py:64-92)."""

    decay_steps = list(decay_steps)

    def schedule(step):
        step = jnp.asarray(step)
        factor = jnp.ones_like(step, dtype=jnp.float32)
        for s in decay_steps:
            factor = factor * jnp.where(step >= s, decay, 1.0)
        lr = jnp.maximum(base_lr * factor, lr_clip)
        if warmup_steps > 0:
            eta_min = base_lr / warmup_div
            warm = eta_min + (base_lr - eta_min) * 0.5 * (
                1 + jnp.cos(math.pi * step / warmup_steps + math.pi))
            lr = jnp.where(step < warmup_steps, warm, lr)
        return lr

    return schedule


def one_cycle_schedule(base_lr: float, total_steps: int, div_factor: float = 10.0,
                       pct_start: float = 0.4) -> Callable:
    """Cosine one-cycle: base/div -> base over pct_start, back down to
    base/(div*1e4) (reference: solver/learning_schedules_fastai.py:60-79)."""
    up = max(1, int(total_steps * pct_start))
    down = max(1, total_steps - up)
    low = base_lr / div_factor
    final = base_lr / (div_factor * 1e4)

    def cos_interp(a, b, t):
        # t=0 -> a, t=1 -> b along a half cosine
        return b + (a - b) * 0.5 * (1 + jnp.cos(math.pi * t))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        t_up = jnp.clip(step / up, 0.0, 1.0)
        t_down = jnp.clip((step - up) / down, 0.0, 1.0)
        return jnp.where(step < up, cos_interp(low, base_lr, t_up),
                         cos_interp(base_lr, final, t_down))

    return schedule


def one_cycle_momentum(total_steps: int, moms: Sequence[float] = (0.95, 0.85),
                       pct_start: float = 0.4) -> Callable:
    """fastai OneCycle momentum: b1 runs inverse to the LR — moms[0] ->
    moms[1] over the rising-LR phase, back to moms[0] over the rest
    (reference: solver/learning_schedules_fastai.py:60-79, OptimWrapper.mom)."""
    up = max(1, int(total_steps * pct_start))
    down = max(1, total_steps - up)
    hi, lo = float(moms[0]), float(moms[1])

    def cos_interp(a, b, t):
        return b + (a - b) * 0.5 * (1 + jnp.cos(math.pi * t))

    def schedule(step):
        step = jnp.asarray(step, dtype=jnp.float32)
        t_up = jnp.clip(step / up, 0.0, 1.0)
        t_down = jnp.clip((step - up) / down, 0.0, 1.0)
        return jnp.where(step < up, cos_interp(hi, lo, t_up),
                         cos_interp(lo, hi, t_down))

    return schedule


def _bias_mask(params) -> dict:
    return jax.tree_util.tree_map_with_path(
        lambda path, _: any(getattr(k, "key", None) == "bias" for k in path), params)


def build_optimizer(cfg, params, steps_per_epoch: int = 1):
    """Returns (optax transform, schedule fn). Decay milestones given in
    epochs are converted to iterations by the caller via steps_per_epoch."""
    s = cfg.SOLVER
    if s.EVAL_AND_SAVE_EPOCH:
        decay_iters = [e * steps_per_epoch for e in s.DECAY_EPOCH_STEPS]
        warmup = s.WARMUP_EPOCH * steps_per_epoch if s.LR_WARMUP else 0
    else:
        decay_iters = list(s.STEPS)
        warmup = s.WARMUP_STEPS if s.LR_WARMUP else 0

    name = s.OPTIMIZER
    if name == "adam_onecycle":
        schedule = one_cycle_schedule(s.BASE_LR, s.MAX_ITERATION, s.DIV_FACTOR, s.PCT_START)
    else:
        schedule = multi_step_schedule(s.BASE_LR, decay_iters, s.LR_DECAY, s.LR_CLIP,
                                       warmup, s.DIV_FACTOR)

    def lr_factor_schedule(step):
        return schedule(step) / s.BASE_LR

    bias_mask = _bias_mask(params)

    if name == "adam_onecycle":
        # fastai OptimWrapper semantics (reference: solver/fastai_optim.py:
        # 101-233 + solver/__init__.py:55-58): true (decoupled) weight decay
        # on ALL params (true_wd=True, bn_wd=True -> plain adamw, no mask)
        # and momentum cycled inversely to the LR per SOLVER.MOMS.  The
        # FastAIMixedOptim fp16-master-weights machinery is inherent here:
        # params stay f32 (TPU.PARAM_DTYPE) while compute may be bf16.
        mom = one_cycle_momentum(s.MAX_ITERATION, s.MOMS, s.PCT_START)
        base = optax.inject_hyperparams(
            lambda learning_rate, b1: optax.adamw(
                learning_rate, b1=b1, b2=0.99, weight_decay=s.WEIGHT_DECAY)
        )(learning_rate=schedule, b1=mom)
    elif name == "adamw":
        base = optax.adamw(learning_rate=schedule, b1=0.9, b2=0.99,
                           weight_decay=s.WEIGHT_DECAY)
    elif name == "adam":
        # torch Adam couples weight decay into the gradient (L2), unlike AdamW
        base = optax.chain(optax.add_decayed_weights(s.WEIGHT_DECAY),
                           optax.adam(learning_rate=schedule, b1=0.9, b2=0.99))
    elif name == "sgd":
        base = optax.chain(optax.add_decayed_weights(s.WEIGHT_DECAY),
                           optax.sgd(learning_rate=schedule, momentum=0.9))
    else:
        raise NotImplementedError(name)

    # bias params get BIAS_LR_FACTOR x lr (reference: solver/__init__.py:22)
    tx = optax.chain(
        base,
        optax.masked(optax.scale(s.BIAS_LR_FACTOR), bias_mask),
    )
    if s.BACKBONE_LR_FACTOR != 1.0:
        backbone_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: str(getattr(path[0], "key", "")) == "backbone", params)
        tx = optax.chain(tx, optax.masked(
            optax.scale(s.BACKBONE_LR_FACTOR), backbone_mask))
    if cfg.MODEL.BACKBONE.FREEZE_CONV_BODY_AT > 0:
        # freeze the trunk (reference: MODEL.BACKBONE.FREEZE_CONV_BODY_AT)
        trunk_mask = jax.tree_util.tree_map_with_path(
            lambda path, _: (len(path) >= 2
                             and str(getattr(path[0], "key", "")) == "backbone"
                             and str(getattr(path[1], "key", "")) == "base"), params)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), trunk_mask))
    if s.GRAD_NORM_CLIP > 0:
        tx = optax.chain(optax.clip_by_global_norm(s.GRAD_NORM_CLIP), tx)
    if getattr(s, "EMA_DECAY", 0.0) > 0.0:
        tx = with_param_ema(tx, s.EMA_DECAY)
    return tx, schedule


class ParamEmaState(NamedTuple):
    """Optimizer-state wrapper carrying an exponential moving average of the
    PARAMETERS (not the updates — optax.ema smooths updates).

    Keeping the shadow tree inside opt_state means no TrainState /
    checkpoint schema change, the non-finite skip guard covers it for free,
    and orbax saves/restores it with the optimizer.  The reference has no
    EMA; it was added to stabilize the late-training 3d@0.7 metric (the XL
    accuracy gate decayed 2x from its mid-run peak, BASELINE.md round 4).

    Known limitation: BN batch_stats are NOT shadowed — EMA evals pair the
    averaged weights with the raw run's running stats.  The stats are
    themselves a momentum-0.1 moving average and the measured effect is
    positive (XL gate), but a bit of the EMA benefit may be left on the
    table vs also averaging the buffers (as e.g. timm's ModelEmaV2 does)."""

    inner: Any
    ema: Any
    count: Any


def with_param_ema(tx, decay: float):
    def init(params):
        # jnp.copy, NOT asarray: the shadow tree must own its buffers, or
        # a donated train step sees the same buffer in params and opt_state
        # ("attempt to donate the same buffer twice")
        return ParamEmaState(inner=tx.init(params),
                             ema=jax.tree.map(jnp.copy, params),
                             count=jnp.zeros((), jnp.int32))

    def update(grads, state, params=None):
        updates, new_inner = tx.update(grads, state.inner, params)
        new_params = optax.apply_updates(params, updates)
        # bias-corrected decay so the first steps track params closely
        # instead of the init snapshot
        count = state.count + 1
        d = jnp.minimum(decay, (1.0 + count) / (10.0 + count))
        new_ema = jax.tree.map(lambda e, p: d * e + (1.0 - d) * p,
                               state.ema, new_params)
        return updates, ParamEmaState(inner=new_inner, ema=new_ema,
                                      count=count)

    return optax.GradientTransformation(init, update)


def get_ema_params(opt_state):
    """The EMA parameter tree, or None if EMA is not enabled."""
    return opt_state.ema if isinstance(opt_state, ParamEmaState) else None
