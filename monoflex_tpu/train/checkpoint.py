"""Checkpoint save / resume (orbax).

Capability port of the reference checkpointer (reference:
utils/check_point.py:11-140): periodic ``model_checkpoint_*``, final
``model_final``, metric-gated ``model_moderate_best_*``, a ``last_checkpoint``
pointer file for resume-latest, and a LOAD_OPTIMIZER_SCHEDULER gate that
restores weights only.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import orbax.checkpoint as ocp

from ..utils import comm
from .train_step import TrainState

LAST_CHECKPOINT_FILE = "last_checkpoint"


class Checkpointer:
    def __init__(self, save_dir: str, load_optimizer_scheduler: bool = True):
        self.save_dir = os.path.abspath(save_dir)
        os.makedirs(self.save_dir, exist_ok=True)
        self.load_optimizer_scheduler = load_optimizer_scheduler
        self._ckptr = ocp.StandardCheckpointer()

    # -- save --------------------------------------------------------------
    def save(self, name: str, state: TrainState, tag_last: bool = True) -> str:
        """Multi-host safe save.

        orbax's save is itself a collective: EVERY process must call it (it
        barriers internally and only the primary host writes replicated
        arrays; sharded arrays write their own shards).  Rank-gating the call
        like the reference does for torch (utils/check_point.py:25-28) makes
        process 0 block in a barrier the other ranks never join — caught by
        tests/test_multiprocess.py.  Only the ``last_checkpoint`` pointer
        file is main-process-gated (it's a plain open()/write)."""
        path = os.path.join(self.save_dir, name)
        self._ckptr.save(path, jax.device_get(state), force=True)
        self._ckptr.wait_until_finished()
        if tag_last and comm.is_main_process():
            with open(os.path.join(self.save_dir, LAST_CHECKPOINT_FILE), "w") as f:
                f.write(name)
        comm.synchronize(f"ckpt_save_{name}")
        return path

    # -- load --------------------------------------------------------------
    def has_checkpoint(self) -> bool:
        return os.path.exists(os.path.join(self.save_dir, LAST_CHECKPOINT_FILE))

    def get_checkpoint_file(self) -> Optional[str]:
        tag = os.path.join(self.save_dir, LAST_CHECKPOINT_FILE)
        if not os.path.exists(tag):
            return None
        with open(tag) as f:
            name = f.read().strip()
        return os.path.join(self.save_dir, name)

    def load(self, template: TrainState, path: Optional[str] = None) -> Tuple[TrainState, int]:
        """Restore into the shape/dtype structure of ``template``. Returns
        (state, start_iteration). With load_optimizer_scheduler=False only the
        model weights and BN stats are taken from the checkpoint.

        Tolerates an opt_state STRUCTURE mismatch between the checkpoint and
        the template (e.g. loading a run saved with a different
        SOLVER.EMA_DECAY setting — the EMA shadow tree lives inside
        opt_state): falls back to a weights+stats-only restore instead of
        failing the full-template restore."""
        path = path or self.get_checkpoint_file()
        if path is None or not os.path.exists(path):
            return template, 0
        host_template = jax.device_get(template)
        try:
            restored = self._ckptr.restore(path, host_template)
        except ValueError:
            # structure mismatch: template-free restore of the raw saved
            # tree, then take weights + stats from it (TrainState is saved
            # as a pytree; field order is the NamedTuple order)
            raw = self._ckptr.restore(path)
            # orbax serializes the TrainState NamedTuple as a name-keyed dict
            params = raw["params"] if isinstance(raw, dict) else raw.params
            stats = (raw["batch_stats"] if isinstance(raw, dict)
                     else raw.batch_stats)
            return template._replace(params=params, batch_stats=stats), 0
        if not self.load_optimizer_scheduler:
            restored = template._replace(params=restored.params,
                                         batch_stats=restored.batch_stats)
            return restored, 0
        return restored, int(restored.step)
