import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.config import get_cfg_defaults
from monoflex_tpu.models.detector import build_model

RUN_YAML = os.path.join(os.path.dirname(__file__), "..", "runs", "monoflex.yaml")


@pytest.fixture(scope="module")
def cfg():
    c = get_cfg_defaults()
    c.merge_from_file(RUN_YAML)
    return c


@pytest.fixture(scope="module")
def small_inputs():
    # small spatial size keeps CPU compile fast; model is fully convolutional
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(1, 64, 128, 3).astype(np.float32))
    # feature map is 16 x 32 -> border chain length 2*(16+32)-4 = 92
    e = (16 + 32) * 2
    edge = np.zeros((1, e, 2), dtype=np.int32)
    # simple left-column chain
    edge[0, :16, 1] = np.arange(16)
    edge_len = np.array([16], dtype=np.int32)
    return images, jnp.asarray(edge), jnp.asarray(edge_len)


@pytest.fixture(scope="module")
def model_and_vars(cfg, small_inputs):
    model = build_model(cfg)
    images, edge, edge_len = small_inputs
    variables = model.init(jax.random.PRNGKey(0), images, edge, edge_len, train=False)
    return model, variables


def test_forward_shapes(model_and_vars, small_inputs):
    model, variables = model_and_vars
    images, edge, edge_len = small_inputs
    out = model.apply(variables, images, edge, edge_len, train=False)
    assert out["cls"].shape == (1, 16, 32, 3)
    # per-head regression maps (concatenated only after point gathers)
    assert all(m.shape[:3] == (1, 16, 32) for m in out["reg"])
    assert sum(m.shape[-1] for m in out["reg"]) == 50
    cls = np.asarray(out["cls"])
    assert cls.min() >= 1e-4 and cls.max() <= 1 - 1e-4


def test_param_count_near_reference(model_and_vars):
    """DLA-34 + MonoFlex heads is a ~21M-parameter model."""
    _, variables = model_and_vars
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    assert 15e6 < n < 30e6, f"param count {n}"


def test_train_mode_updates_batch_stats(model_and_vars, small_inputs):
    model, variables = model_and_vars
    images, edge, edge_len = small_inputs
    out, mutated = model.apply(variables, images, edge, edge_len, train=True,
                               mutable=["batch_stats"])
    assert "batch_stats" in mutated
    # some running mean must have moved
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    moved = any(not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after))
    assert moved


def test_heatmap_bias_prior(model_and_vars, small_inputs):
    """With zero-init DCN offsets and the -log((1-p)/p) class bias, initial
    heatmap probabilities should sit near the 0.01 prior."""
    model, variables = model_and_vars
    images, edge, edge_len = small_inputs
    out = model.apply(variables, images, edge, edge_len, train=False)
    med = float(jnp.median(out["cls"]))
    assert 1e-4 < med < 0.2


def test_edge_fusion_changes_boundary_only(cfg, model_and_vars, small_inputs):
    model, variables = model_and_vars
    images, edge, edge_len = small_inputs
    out_with = model.apply(variables, images, edge, edge_len, train=False)
    out_without = model.apply(variables, images, edge, jnp.array([0]), train=False)
    cls_w = np.asarray(out_with["cls"][0])
    cls_wo = np.asarray(out_without["cls"][0])
    diff = np.abs(cls_w - cls_wo).sum(axis=-1)
    # off-chain pixels identical
    mask = np.zeros((16, 32), dtype=bool)
    mask[np.asarray(edge[0, :16, 1]), np.asarray(edge[0, :16, 0])] = True
    assert np.allclose(diff[~mask], 0, atol=1e-6)


def test_plain_conv_backbone_variant(cfg, small_inputs):
    """The no-DCN (dlav0-style) backbone builds and runs."""
    c = cfg.clone()
    c.MODEL.BACKBONE.CONV_BODY = "dla34_nodcn"
    model = build_model(c)
    images, edge, edge_len = small_inputs
    variables = model.init(jax.random.PRNGKey(1), images, edge, edge_len, train=False)
    out = model.apply(variables, images, edge, edge_len, train=False)
    assert out["cls"].shape == (1, 16, 32, 3)
    # no DCN offset convs in the tree
    flat = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
    names = ["/".join(str(k.key) for k in path) for path, _ in flat]
    assert not any("DCN" in n for n in names)


def test_bfloat16_trunk(cfg, small_inputs):
    """bf16 compute dtype produces outputs close to f32 (params stay f32)."""
    c = cfg.clone()
    c.TPU.COMPUTE_DTYPE = "bfloat16"
    model_bf = build_model(c)
    images, edge, edge_len = small_inputs
    variables = model_bf.init(jax.random.PRNGKey(0), images, edge, edge_len,
                              train=False)
    # params stay f32
    assert all(p.dtype == jnp.float32 for p in jax.tree.leaves(variables["params"]))
    out_bf = model_bf.apply(variables, images, edge, edge_len, train=False)
    model_f32 = build_model(cfg)
    out_f32 = model_f32.apply(variables, images, edge, edge_len, train=False)
    assert out_bf["cls"].dtype == jnp.float32
    # heatmaps bounded [0,1]: bf16 trunk should stay within a few percent
    diff = float(jnp.abs(out_bf["cls"] - out_f32["cls"]).max())
    assert diff < 0.2, diff
