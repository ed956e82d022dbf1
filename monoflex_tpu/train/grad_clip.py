"""Adaptive gradient clipping as an optax transform.

Port of the reference's moving-average grad-norm clipper
(reference: utils/grad_clip.py:4-30, shipped but unused; the trainer uses
plain clip_grad_norm when SOLVER.GRAD_NORM_CLIP > 0, engine/trainer.py:119):
maintain an EMA of the gradient norm and clip to ``factor`` times it.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class AdaptiveClipState(NamedTuple):
    ema_norm: jnp.ndarray
    initialized: jnp.ndarray


def adaptive_grad_clip(factor: float = 1.5, alpha: float = 0.9) -> optax.GradientTransformation:
    """Clip the global grad norm to factor * EMA(norm)."""

    def init_fn(params):
        del params
        return AdaptiveClipState(ema_norm=jnp.zeros(()), initialized=jnp.zeros((), jnp.bool_))

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        ema = jnp.where(state.initialized,
                        alpha * state.ema_norm + (1 - alpha) * norm, norm)
        limit = factor * ema
        scale = jnp.where((norm > limit) & state.initialized,
                          limit / (norm + 1e-12), 1.0)
        updates = jax.tree.map(lambda g: g * scale, updates)
        return updates, AdaptiveClipState(ema_norm=ema,
                                          initialized=jnp.ones((), jnp.bool_))

    return optax.GradientTransformation(init_fn, update_fn)
