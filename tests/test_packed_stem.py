"""Packed (space-to-depth) stem == unpacked stem: values, grads, BN stats.

The packed stem (monoflex_tpu/models/backbone/packed_stem.py) is a pure
relayout of the same math onto MXU-friendly shapes; these tests pin that
claim numerically: identical parameter tree, forward outputs equal to f32
reassociation noise, gradients w.r.t. the canonical weights equal, and
BatchNorm batch statistics (the phase-aggregated ones) equal.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.models.backbone.dla import DLA, DLASeg
from monoflex_tpu.models.backbone.packed_stem import (depth_to_space,
                                                      pack_kernel,
                                                      space_to_depth)


def test_space_to_depth_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 8, 12, 5), jnp.float32)
    assert jnp.array_equal(depth_to_space(space_to_depth(x)), x)


@pytest.mark.parametrize("K,Kp,phases_out,stride", [
    (7, 5, True, 1), (3, 3, True, 1), (3, 2, False, 2)])
def test_packed_conv_exact(K, Kp, phases_out, stride):
    """The packed conv reproduces the direct conv exactly (same FLOP set)."""
    rng = np.random.RandomState(K * 10 + Kp)
    Cin, Cout = 3, 4
    x = jnp.asarray(rng.randn(2, 16, 20, Cin), jnp.float32)
    w = jnp.asarray(rng.randn(K, K, Cin, Cout), jnp.float32)
    P = (K - 1) // 2
    ref = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding=((P, P), (P, P)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))

    xp = space_to_depth(x)
    wp = pack_kernel(w, Kp=Kp, phases_out=phases_out)
    if phases_out:
        M = (Kp - 1) // 2
        out = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(1, 1), padding=((M, M), (M, M)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = depth_to_space(out)
    else:
        out = jax.lax.conv_general_dilated(
            xp, wp, window_strides=(1, 1),
            padding=((Kp - 1, 0), (Kp - 1, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def _init_and_run(packed: bool, x, train: bool = False):
    model = DLA(dtype=jnp.float32, packed_stem=packed)
    variables = model.init(jax.random.PRNGKey(3), x, train=False)
    if not train:
        outs = model.apply(variables, x, train=False)
        return variables, outs, None
    outs, mutated = model.apply(variables, x, train=True,
                                mutable=["batch_stats"])
    return variables, outs, mutated


def test_param_tree_identical():
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    v_ref = _init_and_run(False, x)[0]
    v_pkd = _init_and_run(True, x)[0]
    ref_shapes = jax.tree.map(lambda a: a.shape, v_ref)
    pkd_shapes = jax.tree.map(lambda a: a.shape, v_pkd)
    assert ref_shapes == pkd_shapes


def test_forward_outputs_match():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 32, 64, 3), jnp.float32)
    model_ref = DLA(dtype=jnp.float32, packed_stem=False)
    variables = model_ref.init(jax.random.PRNGKey(3), x, train=False)
    outs_ref = model_ref.apply(variables, x, train=False)
    model_pkd = DLA(dtype=jnp.float32, packed_stem=True)
    outs_pkd = model_pkd.apply(variables, x, train=False)   # same params!
    assert len(outs_ref) == len(outs_pkd)
    for i, (a, b) in enumerate(zip(outs_ref, outs_pkd)):
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5, err_msg=f"level {i}")


def test_train_mode_bn_stats_and_grads_match():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 32, 64, 3), jnp.float32)
    model_ref = DLA(dtype=jnp.float32, packed_stem=False)
    variables = model_ref.init(jax.random.PRNGKey(5), x, train=False)
    model_pkd = DLA(dtype=jnp.float32, packed_stem=True)

    def loss(m):
        def f(params):
            outs, mut = m.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=True, mutable=["batch_stats"])
            # stem-local loss (levels 0-1): gradients through deeper levels
            # accumulate reassociation noise from every downstream layer and
            # only blur what this test pins (the packed stem's own backward)
            return sum(jnp.sum(o * o) for o in outs[:2]), mut["batch_stats"]
        return f

    (l_ref, bs_ref), g_ref = jax.value_and_grad(loss(model_ref), has_aux=True)(
        variables["params"])
    (l_pkd, bs_pkd), g_pkd = jax.value_and_grad(loss(model_pkd), has_aux=True)(
        variables["params"])
    np.testing.assert_allclose(float(l_pkd), float(l_ref), rtol=1e-5)
    # running stats updated identically (stem + level0/1 BNs included)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        np.asarray(b), np.asarray(a), rtol=2e-4, atol=1e-5), bs_ref, bs_pkd)
    # gradients flow to the SAME canonical weights identically
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pkd = {jax.tree_util.keystr(k): v
                for k, v in jax.tree_util.tree_leaves_with_path(g_pkd)}
    for k, v in flat_ref:
        key = jax.tree_util.keystr(k)
        scale = max(1.0, float(jnp.max(jnp.abs(v))))
        np.testing.assert_allclose(np.asarray(flat_pkd[key]) / scale,
                                   np.asarray(v) / scale,
                                   rtol=2e-4, atol=3e-5, err_msg=key)


@pytest.mark.slow  # 85 s: two full-backbone variants end to end
def test_dlaseg_end_to_end_match():
    """Full backbone (trunk + DCN neck) agrees between stems."""
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    seg_ref = DLASeg(dcn_impl="shift", dtype=jnp.float32, packed_stem=False)
    variables = seg_ref.init(jax.random.PRNGKey(7), x, False)
    out_ref = seg_ref.apply(variables, x, False)
    seg_pkd = DLASeg(dcn_impl="shift", dtype=jnp.float32, packed_stem=True)
    out_pkd = seg_pkd.apply(variables, x, False)
    np.testing.assert_allclose(np.asarray(out_pkd), np.asarray(out_ref),
                               rtol=5e-4, atol=5e-5)


def test_multi_conv_levels_fall_back():
    """Stem configs the packing doesn't model (levels[0] != 1) silently use
    the unpacked path; packed_stem=True must not change their behavior."""
    x = jnp.zeros((1, 32, 64, 3), jnp.float32)
    model = DLA(levels=(2, 1, 1, 2, 2, 1), dtype=jnp.float32, packed_stem=True)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = model.apply(variables, x, train=False)
    assert outs[0].shape[1:3] == (32, 64)
    assert any("ConvBnRelu_1" in str(k) for k in variables["params"])
