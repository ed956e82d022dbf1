"""Weight importer: the DLA-34 name map must cover exactly the trunk's params
with consistent shapes (validated against a synthetic torch-format state dict
generated from the flax tree — the real checkpoint needs network access)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.models.detector import build_model
from monoflex_tpu.utils.dla34_import import dla34_name_map, import_dla34_backbone
from monoflex_tpu.utils.weight_import import (align_and_update,
                                              convert_torch_entry,
                                              flatten_params)

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def variables():
    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    model = build_model(cfg)
    imgs = jnp.zeros((1, 64, 128, 3))
    edge = jnp.zeros((1, 96, 2), dtype=jnp.int32)
    return model.init(jax.random.PRNGKey(0), imgs, edge, jnp.array([10]), train=False)


def test_name_map_covers_trunk(variables):
    name_map = dla34_name_map()
    flat_p = flatten_params(variables["params"])
    flat_s = flatten_params(variables["batch_stats"])
    trunk_params = {k for k in flat_p if k.startswith("backbone/base/")}
    trunk_stats = {"stats:" + k for k in flat_s if k.startswith("backbone/base/")}
    mapped = set(name_map.values())
    missing_p = trunk_params - mapped
    missing_s = trunk_stats - mapped
    assert not missing_p, f"unmapped params: {sorted(missing_p)[:8]}"
    assert not missing_s, f"unmapped stats: {sorted(missing_s)[:8]}"
    # and nothing in the map points outside the tree
    all_targets = trunk_params | trunk_stats
    bogus = mapped - all_targets
    assert not bogus, f"map targets without a flax param: {sorted(bogus)[:8]}"


def test_synthetic_round_trip(variables):
    """Build a torch-layout state dict from the flax shapes, import it, and
    check values land in the right places."""
    name_map = dla34_name_map()
    flat_p = flatten_params(variables["params"])
    flat_s = flatten_params(variables["batch_stats"])

    rng = np.random.RandomState(0)
    torch_sd = {}
    for tname, fpath in name_map.items():
        target = flat_s if fpath.startswith("stats:") else flat_p
        key = fpath[6:] if fpath.startswith("stats:") else fpath
        shape = target[key].shape
        # reverse the layout conversion to build the torch-shaped array
        if tname.endswith(".weight") and len(shape) == 4:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        else:
            tshape = shape
        torch_sd[tname] = rng.randn(*tshape).astype(np.float32)

    new_p, new_s, missed = align_and_update(
        variables["params"], variables["batch_stats"], torch_sd, name_map)
    assert not missed, missed[:5]

    # spot check: the stem conv kernel
    stem_t = torch_sd["base_layer.0.weight"]
    stem_f = flatten_params(new_p)["backbone/base/Conv_0/kernel"]
    np.testing.assert_allclose(np.asarray(stem_f),
                               np.transpose(stem_t, (2, 3, 1, 0)), atol=1e-6)
    bn_mean = flatten_params(new_s)["backbone/base/BatchNorm_0/mean"]
    np.testing.assert_allclose(np.asarray(bn_mean),
                               torch_sd["base_layer.1.running_mean"], atol=1e-6)


def test_convert_torch_entry_roles():
    assert convert_torch_entry("x.bn.num_batches_tracked", np.zeros(()))[0] == "skip"
    role, val = convert_torch_entry("c.weight", np.zeros((8, 4, 3, 3)))
    assert role == "kernel" and val.shape == (3, 3, 4, 8)
    role, val = convert_torch_entry("c.weight", np.zeros((64,)))
    assert role == "scale"
    role, val = convert_torch_entry("c1d.weight", np.zeros((256, 256, 3)))
    assert role == "kernel" and val.shape == (3, 256, 256)


def test_monoflex_full_map_covers_model(variables):
    """Every param and BN stat in the model must be covered by the full
    checkpoint map (exactly — no dangling targets either)."""
    from monoflex_tpu.utils.monoflex_import import monoflex_name_map

    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    name_map = monoflex_name_map(cfg)
    flat_p = flatten_params(variables["params"])
    flat_s = flatten_params(variables["batch_stats"])
    all_targets = set(flat_p) | {"stats:" + k for k in flat_s}
    mapped = set(name_map.values())
    bogus = mapped - all_targets
    assert not bogus, f"map targets missing from the model: {sorted(bogus)[:8]}"
    missing = all_targets - mapped
    assert not missing, f"model params with no checkpoint source: {sorted(missing)[:10]}"


def test_monoflex_synthetic_import(variables):
    """Random torch-layout state dict -> model trees, end to end."""
    from monoflex_tpu.utils.monoflex_import import (import_monoflex_checkpoint,
                                                    monoflex_name_map)

    cfg = get_cfg_defaults()
    cfg.merge_from_file(RUN_YAML)
    name_map = monoflex_name_map(cfg)
    flat_p = flatten_params(variables["params"])
    flat_s = flatten_params(variables["batch_stats"])
    rng = np.random.RandomState(1)
    torch_sd = {}
    for tname, fpath in name_map.items():
        target = flat_s if fpath.startswith("stats:") else flat_p
        key = fpath[6:] if fpath.startswith("stats:") else fpath
        shape = target[key].shape
        if tname.endswith(".weight") and len(shape) == 4:
            tshape = (shape[3], shape[2], shape[0], shape[1])
        elif tname.endswith(".weight") and len(shape) == 3:
            tshape = (shape[2], shape[1], shape[0])
        else:
            tshape = shape
        torch_sd["module." + tname] = rng.randn(*tshape).astype(np.float32)
    new_p, new_s, missed = import_monoflex_checkpoint(
        variables["params"], variables["batch_stats"], torch_sd, cfg, strict=True)
    assert not missed, missed[:5]
    # spot check a DCN offset conv kernel landed transposed
    t = torch_sd["module.backbone.ida_up.proj_1.conv.conv_offset_mask.weight"]
    f = flatten_params(new_p)["backbone/ida_up/proj_1/DCN_0/Conv_0/kernel"]
    np.testing.assert_allclose(np.asarray(f), np.transpose(t, (2, 3, 1, 0)), atol=1e-6)
