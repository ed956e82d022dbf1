"""Kendall-style multi-task uncertainty weighting.

Capability port of the reference's uncertainty wrapper (reference:
model/layers/uncert_wrapper.py:17-57, constructed but not wired into the
shipped config): each loss term i gets a learned log-variance s_i and
contributes  L_i * exp(-s_i) + 0.5 * s_i.

In this functional framework the log-variances are ordinary parameters the
caller owns (e.g. added to the optimizer state); ``apply_uncertainty_weights``
is pure.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp


def init_log_variances(loss_names) -> Dict[str, jnp.ndarray]:
    return {name: jnp.zeros(()) for name in loss_names}


def apply_uncertainty_weights(loss_dict: Dict[str, jnp.ndarray],
                              log_variances: Dict[str, jnp.ndarray],
                              enabled: Dict[str, bool] | None = None
                              ) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """Returns (weighted loss dict, regularizer sum)."""
    out = {}
    reg = jnp.zeros(())
    for name, loss in loss_dict.items():
        if enabled is not None and not enabled.get(name, False):
            out[name] = loss
            continue
        s = log_variances[name]
        out[name] = loss * jnp.exp(-s)
        reg = reg + 0.5 * s
    return out, reg
