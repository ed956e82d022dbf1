import jax
import jax.numpy as jnp
import numpy as np

from monoflex_tpu.ops.psroi import deform_psroi_pooling


def test_constant_input_pools_to_constant():
    x = jnp.ones((1, 16, 16, 4))  # output_dim=1, group_size=2 -> C=4
    rois = jnp.array([[0.0, 2, 2, 10, 10]])
    out = deform_psroi_pooling(x, rois, output_dim=1, group_size=2,
                               pooled_size=4, sample_per_part=2)
    assert out.shape == (1, 4, 4, 1)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_position_sensitive_channels():
    # channel c constant value c; group_size=2 -> parts read their own group
    C = 4
    x = jnp.tile(jnp.arange(C, dtype=jnp.float32).reshape(1, 1, 1, C), (1, 16, 16, 1))
    rois = jnp.array([[0.0, 0, 0, 15, 15]])
    out = deform_psroi_pooling(x, rois, output_dim=1, group_size=2,
                               pooled_size=2, sample_per_part=2)
    # part (0,0) -> group 0, (0,1) -> 1, (1,0) -> 2, (1,1) -> 3
    np.testing.assert_allclose(np.asarray(out[0, :, :, 0]), [[0, 1], [2, 3]], atol=1e-5)


def test_trans_shifts_sampling():
    x = jnp.zeros((1, 16, 16, 1)).at[:, :, 8:, :].set(1.0)  # right half ones
    rois = jnp.array([[0.0, 4, 4, 8, 8]])
    base = deform_psroi_pooling(x, rois, output_dim=1, group_size=1,
                                pooled_size=2, sample_per_part=2)
    trans = jnp.ones((1, 2, 2, 2)) * jnp.array([1.0, 0.0])  # shift right
    shifted = deform_psroi_pooling(x, rois, trans, output_dim=1, group_size=1,
                                   pooled_size=2, sample_per_part=2, trans_std=1.0)
    assert float(shifted.mean()) > float(base.mean())


def test_gradients_flow():
    x = jnp.ones((1, 8, 8, 1))
    rois = jnp.array([[0.0, 1, 1, 6, 6]])
    trans = jnp.zeros((1, 2, 2, 2))
    g = jax.grad(lambda t: deform_psroi_pooling(
        jnp.arange(64.0).reshape(1, 8, 8, 1), rois, t, output_dim=1,
        group_size=1, pooled_size=2, sample_per_part=2, trans_std=1.0).sum())(trans)
    assert np.abs(np.asarray(g)).sum() > 0
