"""Pallas DCN v3 kernel (C-sublane/W-lane layout) vs the XLA oracle.

v3 is a performance relayout of the v2 kernels (docs/DESIGN.md round-3
ablation: the v2 hat-map relayout was 82% of the kernel), so parity against
modulated_deform_conv_shift pins that the layout change preserved the math.
Interpret-mode only — on-device parity runs via
tools/compile_v2_kernels.py --impl v3 --oracle (the dynamic-roll hazard
class is invisible to interpret mode; docs/DESIGN.md item 8).
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import monoflex_tpu.ops.dcn_pallas_v3 as DP3
from monoflex_tpu.ops.dcn import modulated_deform_conv_shift

pytestmark = pytest.mark.slow  # heavy integration: skip via -m 'not slow'


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(DP3.pl, "pallas_call", patched)


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
def test_v3_forward_matches_oracle(R):
    x, off, mask, w, b = make_inputs()
    out = DP3.dcn_pallas_v3(x, off, mask, w, b, max_offset=R)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=R)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_v3_bf16_transfer_matches_quantized_oracle():
    """transfer_dtype=bf16 ships x in bf16 but keeps f32 window math: the
    output must equal the f32 oracle fed the bf16-quantized x (the upcast is
    exact, so only the input quantization differs from the f32 path)."""
    x, off, mask, w, b = make_inputs()
    out = DP3.dcn_pallas_v3(x, off, mask, w, b, max_offset=2,
                            transfer_dtype=jnp.bfloat16)
    xq = x.astype(jnp.bfloat16).astype(jnp.float32)
    ref = modulated_deform_conv_shift(xq, off, mask, w, b, max_offset=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)
    # and it is NOT the unquantized result (the cast really happened)
    ref_f32 = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
    assert np.abs(np.asarray(out) - np.asarray(ref_f32)).max() > 1e-4


def test_v3_non_divisible_shapes():
    # H=13 pads to one 16-row tile; W=20 pads to 128 lanes; odd channels
    for H, W, C, Co in ((13, 32, 8, 8), (40, 20, 8, 16), (16, 32, 24, 8)):
        x, off, mask, w, b = make_inputs(H=H, W=W, C=C, Co=Co)
        out = DP3.dcn_pallas_v3(x, off, mask, w, b, max_offset=2)
        ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, err_msg=f"{(H, W, C, Co)}")


def test_v3_vjp_gradients_match_oracle():
    # v3 forward + v3 backward kernels: all five grads vs jax.grad of the
    # XLA oracle
    x, off, mask, w, b = make_inputs(seed=2, B=1, H=16, W=16)

    def loss_v3(*a):
        return jnp.sum(jnp.sin(DP3.dcn_pallas_v3_vjp(*a, 2)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(modulated_deform_conv_shift(*a, max_offset=2)))

    got = jax.grad(loss_v3, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    names = ("dx", "doffset", "dmask", "dweight", "dbias")
    for n, g, r in zip(names, got, want):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(r) / scale,
                                   atol=2e-3, err_msg=n)


def test_v3_vjp_bf16_transfer_gradients():
    """transfer_dtype=bf16 VJP == jax.grad of the oracle evaluated at the
    bf16-quantized x: the forward windows xq, and the dwmo backward now ships
    x through the same quantization, so doffset/dmask/dweight are the TRUE
    gradients of the quantized forward (dx never reads x)."""
    x, off, mask, w, b = make_inputs(seed=4, B=1, H=16, W=16)
    xq = x.astype(jnp.bfloat16).astype(jnp.float32)

    def loss_v3(*a):
        return jnp.sum(jnp.sin(DP3.dcn_pallas_v3_vjp(*a, 2, jnp.bfloat16)))

    def loss_ref(*a):
        return jnp.sum(jnp.sin(modulated_deform_conv_shift(*a, max_offset=2)))

    got = jax.grad(loss_v3, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(xq, off, mask, w, b)
    for n, g, r in zip(("dx", "doffset", "dmask", "dweight", "dbias"),
                       got, want):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(r) / scale,
                                   atol=2e-3, err_msg=n)


@pytest.mark.parametrize("R", [1, 2, 3])
def test_dx4_matches_dx3(R):
    """The roll-free dx (python-unrolled taps, rows-untiled maps) computes
    the same clamped-window gradient as dx3 — only the shift mechanics
    (static lane slices / untiled row starts vs dynamic pltpu.roll) differ."""
    x, off, mask, w, _ = make_inputs(seed=5)
    rng = np.random.RandomState(6)
    g = jnp.asarray(rng.randn(*x.shape[:3], w.shape[-1]).astype(np.float32))
    d3 = DP3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=R)
    d4 = DP3.dcn_pallas_v4_bwd_dx(x, off, mask, w, g, max_offset=R)
    np.testing.assert_allclose(np.asarray(d4), np.asarray(d3), atol=1e-5)


def test_dx4_non_divisible_and_rect():
    for H, W, C, Co in ((13, 32, 8, 8), (40, 20, 8, 16), (16, 32, 24, 8)):
        x, off, mask, w, _ = make_inputs(H=H, W=W, C=C, Co=Co)
        rng = np.random.RandomState(7)
        g = jnp.asarray(rng.randn(*x.shape[:3], Co).astype(np.float32))
        d3 = DP3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=2)
        d4 = DP3.dcn_pallas_v4_bwd_dx(x, off, mask, w, g, max_offset=2)
        np.testing.assert_allclose(np.asarray(d4), np.asarray(d3),
                                   atol=1e-5, err_msg=f"{(H, W, C, Co)}")


def test_dx4_bf16_transfer_matches_quantized():
    """transfer_dtype=bf16 ships g and W in bf16; the u = W^T g matmul
    accumulates f32 (exact on bf16 inputs), so dx4b == dx4 fed the
    bf16-quantized (g, W)."""
    x, off, mask, w, _ = make_inputs(seed=8)
    rng = np.random.RandomState(9)
    g = jnp.asarray(rng.randn(*x.shape[:3], w.shape[-1]).astype(np.float32))
    got = DP3.dcn_pallas_v4_bwd_dx(x, off, mask, w, g, max_offset=2,
                                   transfer_dtype=jnp.bfloat16)
    gq = g.astype(jnp.bfloat16).astype(jnp.float32)
    wq = w.astype(jnp.bfloat16).astype(jnp.float32)
    ref = DP3.dcn_pallas_v4_bwd_dx(x, off, mask, wq, gq, max_offset=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    ref_f32 = DP3.dcn_pallas_v4_bwd_dx(x, off, mask, w, g, max_offset=2)
    assert np.abs(np.asarray(got) - np.asarray(ref_f32)).max() > 1e-5


@pytest.mark.parametrize("R", [1, 2, 3])
def test_dx5_matches_dx3(R):
    """dx5 reassociates the contraction (window-sum per tap first, W^T
    contraction on the MXU after) — same clamped-window gradient as dx3/dx4
    up to f32 reassociation."""
    x, off, mask, w, _ = make_inputs(seed=5)
    rng = np.random.RandomState(6)
    g = jnp.asarray(rng.randn(*x.shape[:3], w.shape[-1]).astype(np.float32))
    d3 = DP3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=R)
    d5 = DP3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=R)
    np.testing.assert_allclose(np.asarray(d5), np.asarray(d3), atol=1e-5)


def test_dx5_non_divisible_and_rect():
    for H, W, C, Co in ((13, 32, 8, 8), (40, 20, 8, 16), (16, 32, 24, 8)):
        x, off, mask, w, _ = make_inputs(H=H, W=W, C=C, Co=Co)
        rng = np.random.RandomState(7)
        g = jnp.asarray(rng.randn(*x.shape[:3], Co).astype(np.float32))
        d3 = DP3.dcn_pallas_v3_bwd_dx(x, off, mask, w, g, max_offset=2)
        d5 = DP3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=2)
        np.testing.assert_allclose(np.asarray(d5), np.asarray(d3),
                                   atol=1e-5, err_msg=f"{(H, W, C, Co)}")


def test_dx5_bf16_transfer_matches_quantized():
    """dx5's transfer_dtype=bf16 ships only g (W stays f32); the weighted
    window sum accumulates g upcast to f32, so dx5b == dx5 fed the
    bf16-quantized g."""
    x, off, mask, w, _ = make_inputs(seed=8)
    rng = np.random.RandomState(9)
    g = jnp.asarray(rng.randn(*x.shape[:3], w.shape[-1]).astype(np.float32))
    got = DP3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=2,
                                   transfer_dtype=jnp.bfloat16)
    gq = g.astype(jnp.bfloat16).astype(jnp.float32)
    ref = DP3.dcn_pallas_v5_bwd_dx(x, off, mask, w, gq, max_offset=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    ref_f32 = DP3.dcn_pallas_v5_bwd_dx(x, off, mask, w, g, max_offset=2)
    assert np.abs(np.asarray(got) - np.asarray(ref_f32)).max() > 1e-5


def test_v3_bwd_rect_channels():
    # C != Co exercises the transposed-weight u path in both bwd kernels
    x, off, mask, w, b = make_inputs(seed=3, B=1, H=16, W=32, C=16, Co=8)

    def loss_v3(*a):
        return jnp.sum(jnp.cos(DP3.dcn_pallas_v3_vjp(*a, 2)))

    def loss_ref(*a):
        return jnp.sum(jnp.cos(modulated_deform_conv_shift(*a, max_offset=2)))

    got = jax.grad(loss_v3, argnums=(0, 1, 2, 3))(x, off, mask, w, b)
    want = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, off, mask, w, b)
    for n, g, r in zip(("dx", "doffset", "dmask", "dweight"), got, want):
        scale = max(1.0, float(jnp.max(jnp.abs(r))))
        np.testing.assert_allclose(np.asarray(g) / scale,
                                   np.asarray(r) / scale,
                                   atol=2e-3, err_msg=n)


def test_fwd_epilogue_fuses_bn_relu():
    """epilogue=(a, b) applies relu(out*a + b) in-kernel == separate
    eval-BN + ReLU on the plain kernel output (folded form, f32)."""
    x, off, mask, w, bias = make_inputs()
    Co = w.shape[-1]
    rng = np.random.RandomState(5)
    scale = jnp.asarray(rng.rand(Co).astype(np.float32) + 0.5)
    shift = jnp.asarray(rng.randn(Co).astype(np.float32) * 0.2)

    plain = DP3.dcn_pallas_v3(x, off, mask, w, bias, max_offset=2)
    want = jnp.maximum(plain * scale + shift, 0.0)
    got = DP3.dcn_pallas_v3(x, off, mask, w, None, max_offset=2,
                            epilogue=(scale, shift + bias * scale))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_deform_conv_block_fused_matches_unfused():
    """DeformConvBlock with TPU.DCN_FUSE_BN_RELU: identical param tree and
    (eval) outputs vs the unfused module, on randomized BN stats."""
    import flax
    from monoflex_tpu.models.backbone import dla

    x = jnp.asarray(np.random.RandomState(0).randn(1, 16, 32, 8), jnp.float32)
    try:
        dla.set_fuse_bn_relu(False)
        block = dla.DeformConvBlock(8, dcn_impl="pallas3")
        vs = block.init(jax.random.PRNGKey(0), x, train=False)
        # randomize stats/params so folding errors cannot cancel
        rng = np.random.RandomState(1)
        vs = flax.core.unfreeze(vs)
        bn_s = vs["batch_stats"]["BatchNorm_0"]
        bn_s["mean"] = jnp.asarray(rng.randn(8).astype(np.float32) * 0.3)
        bn_s["var"] = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
        bn_p = vs["params"]["BatchNorm_0"]
        bn_p["scale"] = jnp.asarray(rng.rand(8).astype(np.float32) + 0.5)
        bn_p["bias"] = jnp.asarray(rng.randn(8).astype(np.float32) * 0.2)
        vs["params"]["DCN_0"]["bias"] = jnp.asarray(
            rng.randn(8).astype(np.float32) * 0.1)
        want = block.apply(vs, x, train=False)

        dla.set_fuse_bn_relu(True)
        fused = dla.DeformConvBlock(8, dcn_impl="pallas3")
        vs2 = fused.init(jax.random.PRNGKey(0), x, train=False)
        paths = lambda t: sorted(
            jax.tree_util.keystr(p) for p, _ in
            jax.tree_util.tree_flatten_with_path(t)[0])
        assert paths(vs2) == paths(vs)  # checkpoint-compatible tree
        got = fused.apply(vs, x, train=False)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)
        # train mode under the fuse flag uses real BatchNorm on the SAME tree
        got_t, mut = fused.apply(vs, x, train=True, mutable=["batch_stats"])
        assert np.isfinite(np.asarray(got_t)).all()
    finally:
        dla.set_fuse_bn_relu(False)
