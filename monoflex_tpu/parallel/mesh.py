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
    """Device-put a host batch with its leading axis sharded over the mesh."""
    sharding = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
