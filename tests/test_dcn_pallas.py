"""Pallas DCN kernel vs the XLA oracle, in interpreter mode (CPU).

On real TPU hardware the same kernels compile via Mosaic; these tests pin the
math (forward + all five gradients of the custom VJP).
"""

import jax
import jax.experimental.pallas as pl
import jax.numpy as jnp
import numpy as np
import pytest

import monoflex_tpu.ops.dcn_pallas as DP
import monoflex_tpu.ops.dcn_pallas_bwd as DB
from monoflex_tpu.ops.dcn import modulated_deform_conv_shift

pytestmark = pytest.mark.slow  # heavy integration: skip via -m 'not slow'



@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(DP.pl, "pallas_call", patched)
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


def test_forward_matches_oracle():
    x, off, mask, w, b = make_inputs()
    out = DP.dcn_pallas(x, off, mask, w, b, max_offset=3)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_forward_non_divisible_height():
    x, off, mask, w, b = make_inputs(H=13)
    out = DP.dcn_pallas(x, off, mask, w, b, max_offset=2)
    ref = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_custom_vjp_gradients():
    x, off, mask, w, b = make_inputs(seed=1)

    def loss_ref(x, o, m, w, b):
        return jnp.sum(jnp.sin(modulated_deform_conv_shift(x, o, m, w, b, max_offset=3)))

    def loss_pal(x, o, m, w, b):
        return jnp.sum(jnp.sin(DB.dcn_pallas_vjp(x, o, m, w, b, 3)))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2, 3, 4))(x, off, mask, w, b)
    for name, a, p in zip(["dx", "doffset", "dmask", "dweight", "dbias"],
                          g_ref, g_pal):
        rel = float(jnp.abs(a - p).max()) / (float(jnp.abs(a).max()) + 1e-9)
        assert rel < 1e-3, f"{name}: rel err {rel}"
