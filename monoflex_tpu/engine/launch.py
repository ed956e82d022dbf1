"""Multi-host initialization.

TPU-native replacement for the reference's per-GPU process spawner + NCCL
rendezvous (reference: engine/launch.py:23-89): on TPU pods each host runs
the same program; ``jax.distributed.initialize`` wires the hosts together and
``jax.devices()`` then spans the full slice.  There is no mp.spawn — the
per-chip parallelism lives inside XLA via the mesh.
"""

from __future__ import annotations

import logging
from typing import Callable, Optional

import jax


def launch(main_func: Callable, coordinator_address: Optional[str] = None,
           num_processes: Optional[int] = None, process_id: Optional[int] = None,
           *args) -> None:
    """Initialize multi-host JAX (no-op on a single host) and run main."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
        logging.getLogger("monoflex").info(
            f"jax.distributed initialized: process {jax.process_index()}/"
            f"{jax.process_count()}, {len(jax.local_devices())} local devices")
    main_func(*args)


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def synchronize() -> None:
    """Barrier across hosts (reference: utils/comm.py:68-80)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("monoflex_barrier")
