"""Seeding + environment info (reference: utils/envs.py:10-32,
engine/defaults.py:71-83)."""

from __future__ import annotations

import datetime
import os
import random
import sys

import numpy as np


def seed_all_rng(seed: int | None = None) -> int:
    """Seed python/numpy; returns the seed (JAX PRNG keys are derived from it
    by callers — JAX has no global RNG to seed)."""
    if seed is None or seed < 0:
        seed = (os.getpid()
                + int(datetime.datetime.now().strftime("%S%f"))
                + int.from_bytes(os.urandom(2), "big"))
    np.random.seed(seed % (2 ** 31))
    random.seed(seed)
    return seed


def collect_env_info() -> str:
    import jax

    lines = [
        f"python: {sys.version.replace(os.linesep, ' ')}",
        f"jax: {jax.__version__}",
        f"backend: {jax.default_backend()}",
        f"devices: {[str(d) for d in jax.devices()]}",
        f"numpy: {np.__version__}",
    ]
    return "\n".join(lines)
