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

pytestmark = pytest.mark.slow  # heavy integration: skip via -m 'not slow'

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
    return procs, [p.communicate(timeout=1500)[0] for p in procs]


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


# --- GSPMD train-step parity: 2 processes x 2 devices == 1 process x 4 ------

GSPMD_WORKER = r"""
import os, sys
sys.path.insert(0, {repo!r})
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           # compile skew between ranks must not trip the
                           # short gloo default while the peer still compiles
                           "--xla_cpu_collective_timeout_seconds=900")
import jax
jax.config.update("jax_platforms", "cpu")
# persistent cache: the train-step CPU compile is minutes; warm re-runs
jax.config.update("jax_compilation_cache_dir",
                  os.path.join({repo!r}, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(coordinator_address={coord!r},
                           num_processes=2,
                           process_id=int(sys.argv[1]))
assert jax.process_count() == 2 and jax.device_count() == 4, (
    jax.process_count(), jax.device_count())

import jax.numpy as jnp
from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.synthetic import make_dummy_batch
from monoflex_tpu.losses.loss_computation import LossComputer
from monoflex_tpu.models.detector import build_model
from monoflex_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from monoflex_tpu.train.solver import build_optimizer
from monoflex_tpu.train.train_step import TrainState, make_train_step

pid = int(sys.argv[1])
cfg = get_cfg_defaults()
cfg.merge_from_file(os.path.join({repo!r}, "runs", "monoflex.yaml"))
model = build_model(cfg)
loss_computer = LossComputer(cfg)

batch_np = make_dummy_batch(4, input_height=64, input_width=128, n_valid=2)
local = {{k: v[pid * 2:(pid + 1) * 2] for k, v in batch_np.items()}}

b0 = {{k: jnp.asarray(v[:1]) for k, v in batch_np.items()}}
variables = model.init(jax.random.PRNGKey(0), b0["image"], b0["edge_indices"],
                       b0["edge_len"], train=False)
tx, _ = build_optimizer(cfg, variables["params"])
state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                   batch_stats=variables["batch_stats"],
                   opt_state=tx.init(variables["params"]),
                   skips=jnp.zeros((), jnp.int32))

from monoflex_tpu.utils.comm import coordination_barrier

mesh = make_mesh(4)
# device_put's cross-process assert_equal rides gloo: meet at the
# coordinator first so init-compile skew can't hit the gloo rendezvous
coordination_barrier("gspmd_worker_init")
state = jax.device_put(state, replicated(mesh))
train_step = jax.jit(make_train_step(model, loss_computer, tx))
batch = shard_batch(local, mesh)
with mesh:
    # compile first, THEN meet at the coordinator barrier, so the gloo
    # rendezvous of the first collective never spans the compile skew
    train_step.lower(state, batch).compile()
    coordination_barrier("gspmd_worker_compiled")
    state2, metrics = train_step(state, batch)
print(f"TOTAL {{float(metrics['total_loss']):.6f}}", flush=True)
print(f"RANK_OK {{pid}}")
"""


def test_gspmd_two_process_train_step_parity(tmp_path):
    """The 2-host sharded train step computes the same loss as the same step
    on a single host (4 virtual devices each way). Exercises process-local
    batch assembly + GSPMD grad all-reduce / global BN stats end to end
    (reference's multi-GPU path is untested by its authors, README.md:56)."""
    import re

    import jax
    import jax.numpy as jnp

    from monoflex_tpu.config import get_cfg_defaults
    from monoflex_tpu.data.synthetic import make_dummy_batch
    from monoflex_tpu.losses.loss_computation import LossComputer
    from monoflex_tpu.models.detector import build_model
    from monoflex_tpu.parallel.mesh import make_mesh, replicated, shard_batch
    from monoflex_tpu.train.solver import build_optimizer
    from monoflex_tpu.train.train_step import TrainState, make_train_step

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # single-process reference on a 4-device mesh (conftest provides 8)
    cfg = get_cfg_defaults()
    cfg.merge_from_file(os.path.join(repo, "runs", "monoflex.yaml"))
    model = build_model(cfg)
    loss_computer = LossComputer(cfg)
    batch_np = make_dummy_batch(4, input_height=64, input_width=128, n_valid=2)
    b0 = {k: jnp.asarray(v[:1]) for k, v in batch_np.items()}
    variables = model.init(jax.random.PRNGKey(0), b0["image"],
                           b0["edge_indices"], b0["edge_len"], train=False)
    tx, _ = build_optimizer(cfg, variables["params"])
    state = TrainState(step=jnp.zeros((), jnp.int32), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]),
                       skips=jnp.zeros((), jnp.int32))
    mesh = make_mesh(4)
    state = jax.device_put(state, replicated(mesh))
    train_step = jax.jit(make_train_step(model, loss_computer, tx))
    with mesh:
        _, metrics = train_step(state, shard_batch(batch_np, mesh))
    expected = float(metrics["total_loss"])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = GSPMD_WORKER.format(repo=repo, coord=f"127.0.0.1:{port}")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PYTHONPATH"))}

    for attempt in range(3):
        procs = [subprocess.Popen([sys.executable, "-c", script, str(i)],
                                  stdout=subprocess.PIPE,
                                  stderr=subprocess.STDOUT, env=env, text=True)
                 for i in range(2)]
        outs = [p.communicate(timeout=1500)[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        flaky = any("Gloo context initialization failed" in o
                    or "Connect timeout" in o for o in outs)
        if not flaky or attempt == 2:
            break

    totals = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-3000:]}"
        assert f"RANK_OK {i}" in out
        m = re.search(r"TOTAL ([0-9.]+)", out)
        assert m, out[-2000:]
        totals.append(float(m.group(1)))

    # both processes observe the same replicated loss, equal to the
    # single-host result (same global batch, same init, same optimizer)
    assert totals[0] == pytest.approx(totals[1], rel=1e-5)
    assert totals[0] == pytest.approx(expected, rel=1e-3), (totals, expected)


# --- CLI-level 2-process e2e: train + eval + best-save + resume -------------

CLI_OPTS = [
    "SEED", "1",
    # >= the scale-4 synthetic image dims (310x93): the KITTI pipeline
    # pads up to the input canvas, it never shrinks
    "INPUT.HEIGHT_TRAIN", "96", "INPUT.WIDTH_TRAIN", "320",
    "INPUT.HEIGHT_TEST", "96", "INPUT.WIDTH_TEST", "320",
    "SOLVER.IMS_PER_BATCH", "4",
    "SOLVER.EVAL_AND_SAVE_EPOCH", "False",
    "SOLVER.EVAL_INTERVAL", "2",
    "SOLVER.SAVE_CHECKPOINT_INTERVAL", "100",
    "TEST.IMS_PER_BATCH", "2",
    "TEST.AP_DIFFICULTY_SCALE", "4.0",
    "DATALOADER.NUM_WORKERS", "0",
]


def _run_cli_pod(repo, data_dir, out_dir, coord, max_iter):
    cli = os.path.join(repo, "tools", "plain_train_net.py")
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PYTHONPATH"))}
    env.update(MONOFLEX_PLATFORM="cpu", MONOFLEX_DATA_DIR=str(data_dir),
               XLA_FLAGS=("--xla_force_host_platform_device_count=2 "
                          "--xla_cpu_collective_timeout_seconds=900"),
               MONOFLEX_COMPILE_CACHE=os.path.join(repo, ".jax_cache"))
    procs = [subprocess.Popen(
        [sys.executable, cli, "--config", os.path.join(repo, "runs", "monoflex.yaml"),
         "--output", str(out_dir), "--num_processes", "2", "--process_id",
         str(i), "--coordinator_address", coord,
         *CLI_OPTS, "SOLVER.MAX_ITERATION", str(max_iter)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        cwd=repo) for i in range(2)]
    return procs, [p.communicate(timeout=2400)[0] for p in procs]


def test_cli_two_process_train_eval_resume(tmp_path):
    """The SHIPPED CLI on a 2-process pod (VERDICT r4 #2): N train steps,
    mid-train eval whose result is broadcast so the best-checkpoint orbax
    collective is entered by BOTH processes (no deadlock), then a resume run
    continues from the saved iteration."""
    from synthetic_kitti import make_synthetic_kitti

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data_dir = tmp_path / "data"
    make_synthetic_kitti(str(data_dir / "kitti" / "training"), scale=4)
    out_dir = tmp_path / "out"

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs, outs = _run_cli_pod(repo, data_dir, out_dir,
                               f"127.0.0.1:{port}", max_iter=2)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} failed:\n{out[-4000:]}"

    ckpt_dir = out_dir / "ckpt"
    assert (ckpt_dir / "model_final").is_dir()
    # eval fired at iter 2 on the untrained model -> AP >= best(-1) -> the
    # collective best save completed on both ranks (would hang pre-fix)
    assert (ckpt_dir / "model_moderate_best_soft").is_dir()
    assert (out_dir / "eval_2" / "data").is_dir()
    # rank-gated logs: exactly one scalars.jsonl with train losses
    scalars = (out_dir / "tensorboard" / "scalars.jsonl").read_text()
    assert '"train/total_loss"' in scalars

    # resume: same pod continues from iteration 2
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs, outs = _run_cli_pod(repo, data_dir, out_dir,
                               f"127.0.0.1:{port}", max_iter=3)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {i} resume failed:\n{out[-4000:]}"
    assert any("resumed from iteration 2" in o for o in outs)
