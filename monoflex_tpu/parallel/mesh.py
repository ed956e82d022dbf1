"""Device mesh + sharding helpers.

TPU-native replacement for the reference's NCCL/gloo process groups
(reference: engine/launch.py:23-89, utils/comm.py:20-264): a
``jax.sharding.Mesh`` over all devices with a 1-D ``data`` axis (the model is
a 20M-param CNN — data parallelism is the right and only sharding; see
SURVEY.md §2.6).  GSPMD inserts the gradient all-reduce and makes BatchNorm
statistics global, replacing DDP + SyncBN.  Multi-host initialization goes
through ``jax.distributed`` instead of a TCP rendezvous.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    mesh_devices = mesh_utils.create_device_mesh((n,), devices=devices[:n])
    return Mesh(mesh_devices, (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension across the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh, axis: str = "data") -> Dict:
    """Shard a host batch's leading axis over the mesh.

    Single-process: a plain sharded device_put.  Multi-process: each process
    holds only ITS loader shard (rank-strided sampler), so the global array is
    assembled from process-local data — device_put would misread the local
    batch as the whole global array (caught by tests/test_multiprocess.py's
    GSPMD train-step parity check)."""
    sharding = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sharding, np.asarray(x)),
        batch)
