"""Real 2-process jax.distributed test for rank-gated writes (VERDICT r1 #6).

Spawns two CPU processes wired via jax.distributed.initialize (the TPU-pod
topology the trainer runs under; reference equivalent is mp.spawn + NCCL,
reference engine/launch.py:23-89) and asserts:
- ranks/world size resolve through jax process topology,
- ScalarWriter writes scalars.jsonl only on process 0,
- Checkpointer.save writes only on process 0 while both processes pass the
  post-save barrier.
"""

import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2,
                           process_id=int(sys.argv[1]))
import jax.numpy as jnp
from monoflex_tpu.utils import comm
from monoflex_tpu.engine.trainer import ScalarWriter
from monoflex_tpu.train.checkpoint import Checkpointer
from monoflex_tpu.train.train_step import TrainState

rank = comm.get_rank()
assert comm.get_world_size() == 2, comm.get_world_size()
out = {out!r}

writer = ScalarWriter(os.path.join(out, "tb"))
writer.write(1, {{"loss": float(rank)}})
writer.close()

ckpt = Checkpointer(os.path.join(out, "ckpt"))
state = TrainState(step=jnp.zeros((), jnp.int32), params={{"w": jnp.ones(2)}},
                   batch_stats={{}}, opt_state={{}}, skips=jnp.zeros((), jnp.int32))
ckpt.save("model_x", state)
print(f"RANK_OK {{rank}}")
"""


def _run_workers(tmp_path, repo):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    script = WORKER.format(repo=repo, coord=coord, out=str(tmp_path))

    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PYTHONPATH"))}
    procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              env=env, text=True)
             for i in range(2)]
    return procs, [p.communicate(timeout=540)[0] for p in procs]


def test_two_process_rank_gated_writes(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # gloo's TCP rendezvous can time out when the build VM's single core is
    # saturated and one worker lags the other by minutes; that's a host
    # scheduling artifact, not a collectives bug — retry before failing
    for attempt in range(3):
        procs, outs = _run_workers(tmp_path, repo)
        if all(p.returncode == 0 for p in procs):
            break
        flaky = any("Gloo context initialization failed" in o
                    or "Connect timeout" in o for o in outs)
        if not flaky or attempt == 2:
            break
        for f in ("tb", "ckpt"):
            subprocess.run(["rm", "-rf", os.path.join(str(tmp_path), f)])
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"RANK_OK {i}" in out

    # only process 0 wrote scalars + checkpoint
    jsonl = os.path.join(str(tmp_path), "tb", "scalars.jsonl")
    assert os.path.exists(jsonl)
    lines = open(jsonl).read().strip().splitlines()
    assert len(lines) == 1 and '"train/loss": 0.0' not in lines[0]  # prefix-free key
    assert '"loss": 0.0' in lines[0]
    assert os.path.isdir(os.path.join(str(tmp_path), "ckpt", "model_x"))
    assert os.path.exists(os.path.join(str(tmp_path), "ckpt", "last_checkpoint"))
