"""CLI surface tests (fast paths only; full train/eval drives live in the
verify skill and e2e suite)."""

import os
import subprocess
import sys

REPO = os.path.join(os.path.dirname(__file__), "..")
CLI = os.path.join(REPO, "tools", "plain_train_net.py")


def run_cli(*args, **env):
    e = dict(os.environ, MONOFLEX_PLATFORM="cpu", **env)
    return subprocess.run([sys.executable, CLI, *args], capture_output=True,
                          text=True, env=e, timeout=120)


def test_help():
    r = run_cli("--help")
    assert r.returncode == 0
    for flag in ["--config", "--eval", "--ckpt", "--batch_size", "--vis",
                 "--num_chips", "--profile", "--eval_all_depths"]:
        assert flag in r.stdout


def test_unknown_config_key_clean_error():
    r = run_cli("--config", "runs/monoflex.yaml", "NO.SUCH.KEY", "1")
    assert r.returncode != 0
    assert "Unknown config key: NO.SUCH.KEY" in (r.stderr + r.stdout)


def test_missing_dataset_clean_error():
    r = run_cli("--config", "runs/monoflex.yaml", "--output", "/tmp/cli_test_out",
                MONOFLEX_DATA_DIR="/tmp/definitely_missing")
    assert r.returncode != 0
    assert "ImageSets file not found" in (r.stderr + r.stdout)
