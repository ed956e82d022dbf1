"""The jitted training step: forward + 11 losses + grads + optimizer.

One compiled function replaces the reference's eager hot loop
(reference: engine/trainer.py:103-163): model apply (with global-batch BN),
loss computation, gradient, AdamW update and the non-finite-loss guard
(reference drops into pdb on NaN, detector_loss.py:484-489; here the step is
skipped so long runs survive a bad batch).

Under a data mesh the same function is simply jitted with sharded batch
inputs; GSPMD inserts the gradient all-reduce over ICI.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from flax.core import FrozenDict


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # device-side consecutive non-finite-step counter: exact regardless of
    # how often the host samples metrics (VERDICT r1: the host-side counter
    # only saw every 10th step, so a NaN storm could run ~200 steps).
    # NO default value: a class-level default array would be one shared
    # buffer across every TrainState, and donating any one of those states
    # (donate_argnums) deletes the shared buffer for all of them.
    skips: jnp.ndarray


def create_train_state(model, tx, rng, sample_batch) -> TrainState:
    variables = model.init(
        rng, sample_batch["image"], sample_batch.get("edge_indices"),
        sample_batch.get("edge_len"), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        skips=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, loss_computer, tx):
    """Returns train_step(state, batch) -> (state, metrics)."""

    def train_step(state: TrainState, batch: Dict[str, jnp.ndarray]
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["image"], batch.get("edge_indices"), batch.get("edge_len"),
                train=True, mutable=["batch_stats"])
            loss_dict, log_dict = loss_computer(outputs, batch)
            total = sum(jax.tree.leaves(loss_dict))
            return total, (mutated["batch_stats"], loss_dict, log_dict)

        (total, (new_stats, loss_dict, log_dict)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)

        # non-finite guard: skip the whole update, keep counting steps
        finite = jnp.isfinite(total)
        select = lambda a, b: jax.tree.map(
            lambda x, y: jnp.where(finite, x, y), a, b)
        new_skips = jnp.where(finite, 0, state.skips + 1).astype(jnp.int32)
        new_state = TrainState(
            step=state.step + 1,
            params=select(new_params, state.params),
            batch_stats=select(new_stats, state.batch_stats),
            opt_state=select(new_opt_state, state.opt_state),
            skips=new_skips,
        )
        metrics = {"total_loss": total, "skipped": (~finite).astype(jnp.float32),
                   "consecutive_skips": new_skips.astype(jnp.float32), **log_dict}
        return new_state, metrics

    return train_step


def make_eval_step(model, post_processor):
    """Returns eval_step(state, batch) -> (results, valid, extras)."""

    def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
                  output_depth: str | None = None):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["image"], batch.get("edge_indices"), batch.get("edge_len"),
            train=False)
        return post_processor(outputs, batch, output_depth=output_depth)

    return eval_step
