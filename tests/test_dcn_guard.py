"""Clamp-vs-import guard (utils/dcn_guard.py): importing unbounded-trained
DCN weights into a bounded-window impl must fire a loud warning / auto-fix
(the measured AP-0.00 footgun, docs/DESIGN.md round-2 clamp ablation)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.data.synthetic import make_dummy_batch
from monoflex_tpu.models.backbone.dla import N_DCN_STAGES, resolve_dcn_stages
from monoflex_tpu.models.detector import build_model
from monoflex_tpu.utils.dcn_guard import dcn_offset_guard, scan_offset_saturation

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


def _cfg(**tpu_overrides):
    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    cfg.defrost()
    cfg.TPU.DCN_FORCE_IMPL = "shift"  # bounded impl, cheap on CPU
    for k, v in tpu_overrides.items():
        setattr(cfg.TPU, k, v)
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = build_model(cfg)
    batch_np = make_dummy_batch(1, input_height=64, input_width=128, n_valid=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    variables = model.init(jax.random.PRNGKey(0), batch["image"],
                           batch["edge_indices"], batch["edge_len"], train=False)
    return cfg, variables, batch


def _inflate_offsets(params, magnitude=7.0):
    """Simulate unbounded-trained weights: bias every DCN offset conv so the
    learned offsets sit far outside the clamp window (o1/o2 = the first 2k of
    the 3k offset-mask channels)."""

    def walk(tree, in_dcn=False):
        out = {}
        for k, v in tree.items():
            here = in_dcn or k.startswith("DCN")
            if isinstance(v, dict):
                out[k] = walk(v, here)
            elif here and k == "bias" and v.shape[0] % 3 == 0 and v.ndim == 1:
                n = v.shape[0] // 3
                b = np.asarray(v).copy()
                b[: 2 * n] = magnitude
                out[k] = jnp.asarray(b)
            else:
                out[k] = v
        return out

    return walk(jax.device_get(params))


def test_guard_quiet_on_fresh_init(setup):
    cfg, variables, batch = setup
    fired, suggestion, rows = dcn_offset_guard(cfg, variables, batch)
    assert not fired and suggestion is None
    # zero-init offset convs -> all offsets exactly 0
    assert rows and all(r["max"] == 0.0 for r in rows)


def test_guard_fires_on_unbounded_weights(setup, caplog):
    cfg, variables, batch = setup
    bad = {"params": _inflate_offsets(variables["params"]),
           "batch_stats": variables["batch_stats"]}

    import logging

    with caplog.at_level(logging.WARNING, logger="monoflex"):
        fired, suggestion, rows = dcn_offset_guard(cfg, bad, batch)
    assert fired
    assert suggestion is None  # "warn" mode reports but does not reroute
    assert any("DCN OFFSET GUARD" in r.message for r in caplog.records)
    assert all(r["frac_clipped"] > 0.5 for r in rows)

    cfg_auto = _cfg(DCN_OFFSET_GUARD="auto")
    fired, suggestion, _ = dcn_offset_guard(cfg_auto, bad, batch)
    assert fired and suggestion == ("gather",) * N_DCN_STAGES


def test_guard_respects_unbounded_stages(setup):
    """Stages already on the gather impl never fire, whatever their offsets."""
    cfg, variables, batch = setup
    bad = {"params": _inflate_offsets(variables["params"]),
           "batch_stats": variables["batch_stats"]}
    cfg_mixed = _cfg(DCN_OFFSET_GUARD="auto",
                     DCN_IMPL_PER_STAGE=("gather", "gather", "shift", "shift"))
    fired, suggestion, rows = dcn_offset_guard(cfg_mixed, bad, batch)
    assert fired
    assert suggestion == ("gather",) * N_DCN_STAGES
    assert [r["bounded"] for r in rows] == [False, False, True, True]


def test_guard_off_mode(setup):
    cfg, variables, batch = setup
    cfg_off = _cfg(DCN_OFFSET_GUARD="off")
    fired, suggestion, rows = dcn_offset_guard(cfg_off, variables, batch)
    assert not fired and rows == []


def test_resolver_matches_build(setup):
    cfg, _, _ = setup
    impls, rs = resolve_dcn_stages(cfg)
    assert impls == ("shift",) * N_DCN_STAGES
    assert rs == (cfg.TPU.DCN_MAX_OFFSET,) * N_DCN_STAGES
