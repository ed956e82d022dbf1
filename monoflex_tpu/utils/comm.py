"""Cross-process communication helpers.

TPU-native replacement for the reference's torch.distributed wrappers
(reference: utils/comm.py:20-264): rank/world-size come from jax process
topology, tensor reductions are GSPMD's job inside jitted programs, and
python-object exchange goes through multihost_utils over DCN instead of a
pickled-tensor gloo side channel.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import jax
import numpy as np


def get_rank() -> int:
    return jax.process_index()


def get_world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def synchronize(name: str = "barrier") -> None:
    if get_world_size() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)


def coordination_barrier(name: str, timeout_s: int = 3600) -> None:
    """Barrier through the jax.distributed COORDINATOR (gRPC), not device
    collectives: safe to hold for however long a per-host XLA compile takes.
    Device-collective rendezvous (gloo on CPU, ICI elsewhere) has much
    tighter timeouts — meet here first whenever per-host compile skew could
    span minutes (e.g. before the first train step of a cold run)."""
    if get_world_size() == 1:
        return
    from jax._src import distributed

    client = distributed.global_state.client
    if client is None:
        synchronize(name)
        return
    client.wait_at_barrier(name, timeout_in_ms=timeout_s * 1000)


def broadcast_object(obj: Any, root: int = 0) -> Any:
    """Broadcast a picklable object from the root process to all."""
    if get_world_size() == 1:
        return obj
    from jax.experimental import multihost_utils

    payload = pickle.dumps(obj) if get_rank() == root else b""
    data = np.frombuffer(payload.ljust(max(len(payload), 1), b"\0"), dtype=np.uint8)
    # exchange sizes first, then fixed-size buffers
    size = multihost_utils.broadcast_one_to_all(
        np.array([len(payload)], dtype=np.int64), is_source=get_rank() == root)
    buf = np.zeros(int(size[0]), dtype=np.uint8)
    if get_rank() == root:
        buf[:] = np.frombuffer(payload, dtype=np.uint8)
    buf = multihost_utils.broadcast_one_to_all(buf, is_source=get_rank() == root)
    return pickle.loads(bytes(buf.tobytes()))


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather a picklable object from every process (reference's all_gather)."""
    if get_world_size() == 1:
        return [obj]
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size], dtype=np.int64))
    max_size = int(sizes.max())
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [pickle.loads(bytes(gathered[i, : int(sizes[i, 0])].tobytes()))
            for i in range(get_world_size())]


def reduce_dict(metrics: dict, average: bool = True) -> dict:
    """Average scalar metrics across processes on the host
    (reference: utils/comm.py:235-264). Under GSPMD the in-graph losses are
    already global; this is for host-side bookkeeping."""
    if get_world_size() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics.keys())
    vec = np.array([float(metrics[k]) for k in keys], dtype=np.float64)
    total = multihost_utils.process_allgather(vec).sum(axis=0)
    if average:
        total = total / get_world_size()
    return dict(zip(keys, total.tolist()))


def shared_random_seed() -> int:
    """One seed agreed across processes (reference: utils/comm.py:221-232)."""
    seed = np.random.randint(2 ** 31)
    return int(broadcast_object(seed))
