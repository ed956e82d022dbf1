"""Pallas DCN v2 kernel (NHWC-native layout) vs the XLA oracle, interpreted.

Same contract as the v1 kernel (tests/test_dcn_pallas.py); the v2 kernel is
a performance restructure (docs/DESIGN.md), so parity against
modulated_deform_conv_shift pins that the layout change preserved the math.
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import monoflex_tpu.ops.dcn_pallas_bwd as DB
import monoflex_tpu.ops.dcn_pallas_v2 as DP2
from monoflex_tpu.ops.dcn import modulated_deform_conv_shift

pytestmark = pytest.mark.slow  # heavy integration: skip via -m 'not slow'



@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(DP2.pl, "pallas_call", patched)
    monkeypatch.setattr(DB.pl, "pallas_call", patched)


def make_inputs(seed=0, B=2, H=16, W=32, C=8, Co=8):
    rng = np.random.RandomState(seed)
    return (
        jnp.asarray(rng.randn(B, H, W, C).astype(np.float32)),
        jnp.asarray((rng.randn(B, H, W, 18) * 1.5).astype(np.float32)),
        jnp.asarray(rng.rand(B, H, W, 9).astype(np.float32)),
        jnp.asarray(rng.randn(3, 3, C, Co).astype(np.float32) * 0.1),
        jnp.asarray(rng.randn(Co).astype(np.float32)),
    )


@pytest.mark.parametrize("R", [1, 2, 3])
def test_v2_forward_matches_oracle(R):
    x, off, mask, w, b = make_inputs()
    out = DP2.dcn_pallas_v2(x, off, mask, w, b, max_offset=R)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_v2_non_divisible_height():
    # H=13 pads to one 16-row tile; H=40 pads to 48 (three tiles)
    for H in (13, 40):
        x, off, mask, w, b = make_inputs(H=H)
        out = DP2.dcn_pallas_v2(x, off, mask, w, b, max_offset=2)
        ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, err_msg=f"H={H}")


def test_v2_rect_channels():
    x, off, mask, w, b = make_inputs(C=16, Co=8)
    out = DP2.dcn_pallas_v2(x, off, mask, w, b, max_offset=2)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_v2_vjp_gradients_match_oracle():
    # v2 forward + the split backward kernels: all five grads vs jax.grad of
    # the XLA oracle
    x, off, mask, w, b = make_inputs(seed=2, B=1, H=16, W=16)

    def loss_v2(*a):
        return jnp.sum(jnp.sin(DP2.dcn_pallas_v2_vjp(*a, 2)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(modulated_deform_conv_shift(*a, max_offset=2)))

    g2 = jax.grad(loss_v2, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for a, bb, name in zip(g2, gr, ["dx", "doff", "dmask", "dw", "db"]):
        scale = max(1.0, float(jnp.abs(bb).max()))
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(bb) / scale,
                                   atol=2e-3, err_msg=name)


@pytest.mark.parametrize("chunk", [None, 4])
def test_v2_bwd_dx_matches_oracle(chunk):
    # standalone v2 dx kernel (incl. the channel-chunked grid) vs jax.grad
    x, off, mask, w, b = make_inputs(seed=4, B=1, H=16, W=16)
    g = jnp.asarray(np.random.RandomState(9).randn(1, 16, 16, 8),
                    jnp.float32)

    def loss_ref(x):
        out = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
        return jnp.sum(out * g)

    dx_ref = jax.grad(loss_ref)(x)
    dx_v2 = DP2.dcn_pallas_v2_bwd_dx(x, off, mask, w, g, max_offset=2,
                                     channel_chunk=chunk)
    np.testing.assert_allclose(np.asarray(dx_v2), np.asarray(dx_ref),
                               atol=2e-3)


def test_v2_fused_dwmo_matches_split():
    # the fused dmask+dW+doffset kernel vs the split dwm/doff kernels
    x, off, mask, w, b = make_inputs(seed=5, B=1, H=16, W=16)
    g = jnp.asarray(np.random.RandomState(11).randn(1, 16, 16, 8), jnp.float32)
    dmask_f, dw_f, doff_f = DP2.dcn_pallas_v2_bwd_dwmo(x, off, mask, w, g,
                                                       max_offset=2)
    dmask_s, dw_s = DP2.dcn_pallas_v2_bwd_dwm(x, off, mask, w, g, max_offset=2)
    doff_s = DP2.dcn_pallas_v2_bwd_doff(x, off, mask, w, g, max_offset=2)
    np.testing.assert_allclose(np.asarray(dmask_f), np.asarray(dmask_s),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_f), np.asarray(dw_s), atol=1e-5)
    np.testing.assert_allclose(np.asarray(doff_f), np.asarray(doff_s),
                               atol=1e-5)


def test_v2_bf16_window_close_to_f32():
    x, off, mask, w, b = make_inputs(seed=3)
    out_bf = DP2.dcn_pallas_v2(x, off, mask, w, b, max_offset=2,
                               compute_dtype=jnp.bfloat16)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
    # bf16 has ~3 decimal digits; window sums of ~9*25 terms stay within ~2%
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(ref),
                               rtol=0.05, atol=0.05)


def test_v2_packed_matches_plain():
    # lane-packed forward (two pixels per 128-lane tile) vs the standard
    # kernel and the oracle, including a non-divisible height
    for H in (16, 13):
        x, off, mask, w, b = make_inputs(seed=3, B=2, H=H, W=32, C=64, Co=64)
        out = DP2.dcn_pallas_v2_packed(x, off, mask, w, b, max_offset=2)
        ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, err_msg=f"H={H}")


def test_v2_vjp_packed_dispatch():
    # packed=True routes eligible shapes through the packed forward and
    # falls back on ineligible ones; gradients flow through the v2 backward
    x, off, mask, w, b = make_inputs(seed=4, B=1, H=16, W=16, C=64, Co=64)

    def loss(packed):
        return jnp.sum(DP2.dcn_pallas_v2_vjp(x, off, mask, w, b, 2, packed))

    np.testing.assert_allclose(float(loss(True)), float(loss(False)),
                               rtol=1e-5)
    g_p = jax.grad(lambda xx: jnp.sum(
        DP2.dcn_pallas_v2_vjp(xx, off, mask, w, b, 2, True)))(x)
    g_u = jax.grad(lambda xx: jnp.sum(
        DP2.dcn_pallas_v2_vjp(xx, off, mask, w, b, 2, False)))(x)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_u), atol=1e-4)

    # ineligible channel count silently uses the standard kernel
    x2, off2, mask2, w2, b2 = make_inputs(seed=5, B=1, H=16, W=16, C=16, Co=8)
    out = DP2.dcn_pallas_v2_vjp(x2, off2, mask2, w2, b2, 2, True)
    ref = modulated_deform_conv_shift(x2, off2, mask2, w2, b2, max_offset=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_v2_packed_bwd_dwmo_matches_plain():
    # lane-packed single-sweep backward vs the standard dwmo kernel
    x, off, mask, w, _ = make_inputs(seed=6, B=2, H=13, W=32, C=64, Co=64)
    g = jnp.asarray(np.random.RandomState(7).randn(2, 13, 32, 64), jnp.float32)
    ref = DP2.dcn_pallas_v2_bwd_dwmo(x, off, mask, w, g, max_offset=2)
    got = DP2.dcn_pallas_v2_packed_bwd_dwmo(x, off, mask, w, g, max_offset=2)
    for name, r, t in zip(("dmask", "dw", "doff"), ref, got):
        np.testing.assert_allclose(np.asarray(t), np.asarray(r), atol=1e-3,
                                   err_msg=name)


def test_v2_packed_bwd_dx_matches_plain():
    # lane-packed dx vs the standard dx kernel
    x, off, mask, w, _ = make_inputs(seed=8, B=2, H=13, W=32, C=64, Co=64)
    g = jnp.asarray(np.random.RandomState(9).randn(2, 13, 32, 64), jnp.float32)
    ref = DP2.dcn_pallas_v2_bwd_dx(x, off, mask, w, g, max_offset=2)
    got = DP2.dcn_pallas_v2_packed_bwd_dx(x, off, mask, w, g, max_offset=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-3)
