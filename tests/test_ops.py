import jax
import jax.numpy as jnp
import numpy as np
import pytest

from monoflex_tpu.ops.dcn import (bilinear_gather, modulated_deform_conv,
                                  modulated_deform_conv_shift,
                                  plain_conv_equivalent)
from monoflex_tpu.ops.image_ops import (nms_hm, scatter_add_edge,
                                        select_point_of_interest, select_topk,
                                        sigmoid_hm)


class TestDCN:
    def test_zero_offset_equals_conv(self):
        """DCN with zero offsets and mask==1 must reproduce a regular conv
        (the reference native op's own correctness test,
        reference: model/backbone/DCNv2/testcuda.py:32)."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(6).astype(np.float32))
        offset = jnp.zeros((2, 12, 16, 18))
        mask = jnp.ones((2, 12, 16, 9))
        out = modulated_deform_conv(x, offset, mask, w, b)
        ref = plain_conv_equivalent(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_integer_shift_offset(self):
        """A uniform integer offset shifts the sampling grid exactly."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(1, 10, 10, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 4, 4).astype(np.float32) * 0.1)
        # dy=0, dx=1 for every tap: equivalent to conv on x shifted left
        offset = jnp.zeros((1, 10, 10, 18)).at[..., 1::2].set(1.0)
        mask = jnp.ones((1, 10, 10, 9))
        out = modulated_deform_conv(x, offset, mask, w, None)
        x_shift = jnp.pad(x[:, :, 1:], ((0, 0), (0, 0), (0, 1), (0, 0)))
        ref = plain_conv_equivalent(x_shift, w, None)
        # interior columns only (both boundaries differ: the shifted input
        # loses a column on each side to padding)
        np.testing.assert_allclose(np.asarray(out)[:, :, 1:-2],
                                   np.asarray(ref)[:, :, 1:-2], atol=1e-4)

    def test_mask_scales_output(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 8, 8, 4).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 4, 2).astype(np.float32))
        offset = jnp.zeros((1, 8, 8, 18))
        out_half = modulated_deform_conv(x, offset, jnp.full((1, 8, 8, 9), 0.5), w, None)
        out_full = modulated_deform_conv(x, offset, jnp.ones((1, 8, 8, 9)), w, None)
        np.testing.assert_allclose(np.asarray(out_half), np.asarray(out_full) / 2, atol=1e-5)

    def test_bilinear_gather_exact_at_integers(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(1, 6, 7, 3).astype(np.float32))
        ys = jnp.array([[[[2.0], [4.0]]]])  # (1,1,2,1)
        xs = jnp.array([[[[3.0], [5.0]]]])
        g = bilinear_gather(x, ys, xs)
        np.testing.assert_allclose(np.asarray(g[0, 0, 0, 0]), np.asarray(x[0, 2, 3]), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g[0, 0, 1, 0]), np.asarray(x[0, 4, 5]), atol=1e-6)

    def test_bilinear_gather_midpoint(self):
        x = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0).at[0, 1, 2, 0].set(3.0)
        g = bilinear_gather(x, jnp.full((1, 1, 1, 1), 1.0), jnp.full((1, 1, 1, 1), 1.5))
        np.testing.assert_allclose(float(g[0, 0, 0, 0, 0]), 2.0, atol=1e-6)

    def test_out_of_bounds_zero(self):
        x = jnp.ones((1, 4, 4, 1))
        g = bilinear_gather(x, jnp.full((1, 1, 1, 1), -5.0), jnp.full((1, 1, 1, 1), 0.0))
        np.testing.assert_allclose(float(g.sum()), 0.0)
        # half inside at the boundary
        g2 = bilinear_gather(x, jnp.full((1, 1, 1, 1), -0.5), jnp.full((1, 1, 1, 1), 1.0))
        np.testing.assert_allclose(float(g2[0, 0, 0, 0, 0]), 0.5, atol=1e-6)

    def test_gradients_finite_difference(self):
        """Finite-difference gradcheck on every DCN input (mirrors the
        reference's double-precision gradcheck, testcuda.py:94-98)."""
        rng = np.random.RandomState(4)
        x = rng.randn(1, 5, 6, 3).astype(np.float64)
        w = rng.randn(3, 3, 3, 2).astype(np.float64) * 0.3
        b = rng.randn(2).astype(np.float64)
        off = rng.randn(1, 5, 6, 18).astype(np.float64) * 0.4
        mask = jax.nn.sigmoid(jnp.asarray(rng.randn(1, 5, 6, 9)))

        def f(x_, off_, w_, b_):
            out = modulated_deform_conv(jnp.asarray(x_), jnp.asarray(off_), mask,
                                        jnp.asarray(w_), jnp.asarray(b_))
            return jnp.sum(jnp.sin(out))

        with jax.enable_x64(True):
            grads = jax.grad(f, argnums=(0, 1, 2, 3))(x, off, w, b)
            eps = 1e-6
            for argi, arg in enumerate([x, off, w, b]):
                flat = arg.reshape(-1)
                for j in rng.choice(flat.size, size=min(5, flat.size), replace=False):
                    ap = arg.copy().reshape(-1)
                    ap[j] += eps
                    am = arg.copy().reshape(-1)
                    am[j] -= eps
                    args_p = [x, off, w, b]
                    args_p[argi] = ap.reshape(arg.shape)
                    args_m = [x, off, w, b]
                    args_m[argi] = am.reshape(arg.shape)
                    fd = (float(f(*args_p)) - float(f(*args_m))) / (2 * eps)
                    an = float(np.asarray(grads[argi]).reshape(-1)[j])
                    assert abs(fd - an) < 1e-4, f"arg {argi} idx {j}: fd={fd} an={an}"


class TestShiftDCN:
    """The gather-free TPU formulation must match the exact gather path."""

    def _inputs(self, seed=0, off_scale=2.0):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(2, 12, 16, 8).astype(np.float32))
        off = jnp.asarray((rng.randn(2, 12, 16, 18) * off_scale).astype(np.float32))
        mask = jnp.asarray(rng.rand(2, 12, 16, 9).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 8, 6).astype(np.float32) * 0.1)
        b = jnp.asarray(rng.randn(6).astype(np.float32))
        return x, off, mask, w, b

    def test_matches_gather_path(self):
        x, off, mask, w, b = self._inputs()
        ref = modulated_deform_conv(x, off, mask, w, b)
        out = modulated_deform_conv_shift(x, off, mask, w, b, max_offset=8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    def test_zero_offset_equals_conv(self):
        x, off, mask, w, b = self._inputs()
        out = modulated_deform_conv_shift(x, jnp.zeros_like(off),
                                          jnp.ones_like(mask), w, b, max_offset=4)
        ref = plain_conv_equivalent(x, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_clamps_large_offsets(self):
        x, off, mask, w, b = self._inputs(off_scale=1.0)
        big = off + 100.0
        out = modulated_deform_conv_shift(x, big, mask, w, b, max_offset=4)
        ref = modulated_deform_conv(x, jnp.clip(big, -4, 4), mask, w, b)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)

    @pytest.mark.slow  # 103 s: finite-difference cross-check of 5 grads
    def test_gradients_match_gather_path(self):
        x, off, mask, w, b = self._inputs(off_scale=1.0)

        def total(fn):
            def f(x_, off_, w_):
                return jnp.sum(jnp.sin(fn(x_, off_, mask, w_, b)))
            return f

        g_ref = jax.grad(total(lambda *a: modulated_deform_conv(*a)), argnums=(0, 1, 2))(x, off, w)
        g_out = jax.grad(total(lambda x_, o_, m_, w_, b_: modulated_deform_conv_shift(
            x_, o_, m_, w_, b_, max_offset=8)), argnums=(0, 1, 2))(x, off, w)
        for a, b_ in zip(g_ref, g_out):
            np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=5e-4)


class TestImageOps:
    def test_sigmoid_hm_clamp(self):
        out = sigmoid_hm(jnp.array([[-100.0, 0.0, 100.0]]))
        np.testing.assert_allclose(np.asarray(out), [[1e-4, 0.5, 1 - 1e-4]], atol=1e-6)

    def test_nms_hm_keeps_peaks(self):
        hm = jnp.zeros((1, 8, 8, 1)).at[0, 3, 3, 0].set(0.9).at[0, 3, 4, 0].set(0.5)
        out = nms_hm(hm)
        assert float(out[0, 3, 3, 0]) == pytest.approx(0.9)
        assert float(out[0, 3, 4, 0]) == 0.0

    def test_select_topk(self):
        hm = jnp.zeros((1, 8, 10, 3))
        hm = hm.at[0, 2, 3, 0].set(0.9).at[0, 5, 7, 1].set(0.8).at[0, 1, 1, 2].set(0.7)
        scores, inds, clses, ys, xs = select_topk(hm, k=4)
        assert float(scores[0, 0]) == pytest.approx(0.9)
        assert (float(xs[0, 0]), float(ys[0, 0]), float(clses[0, 0])) == (3.0, 2.0, 0.0)
        assert (float(xs[0, 1]), float(ys[0, 1]), float(clses[0, 1])) == (7.0, 5.0, 1.0)
        assert float(inds[0, 0]) == 2 * 10 + 3

    def test_select_point_of_interest(self):
        fm = jnp.arange(2 * 4 * 5 * 3, dtype=jnp.float32).reshape(2, 4, 5, 3)
        idx = jnp.array([[[1, 2], [3, 0]], [[0, 0], [4, 3]]])  # (B,2,2) [x,y]
        out = select_point_of_interest(fm, idx)
        np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(fm[0, 2, 1]))
        np.testing.assert_allclose(np.asarray(out[1, 1]), np.asarray(fm[1, 3, 4]))

    def test_scatter_add_edge_masks_padding(self):
        out = jnp.zeros((2, 4, 6, 2))
        idx = jnp.zeros((2, 5, 2), dtype=jnp.int32)
        idx = idx.at[0, 0].set(jnp.array([1, 2])).at[0, 1].set(jnp.array([3, 3]))
        vals = jnp.ones((2, 5, 2))
        res = scatter_add_edge(out, idx, vals, jnp.array([2, 0]))
        assert float(res[0, 2, 1, 0]) == 1.0
        assert float(res[0, 3, 3, 1]) == 1.0
        assert float(res[0].sum()) == 4.0  # only 2 valid pixels x 2 channels
        assert float(res[1].sum()) == 0.0  # edge_len 0 -> nothing added


def test_select_topk_approx_flag_cpu_exact():
    """approx=True must be a no-op off-TPU (exact path, bit-equal decode)."""
    import numpy as np
    from monoflex_tpu.ops.image_ops import select_topk

    rng = np.random.RandomState(0)
    hm = jnp.asarray(rng.rand(2, 24, 80, 3).astype(np.float32))
    exact = select_topk(hm, 50, approx=False)
    approx = select_topk(hm, 50, approx=True)
    for a, b in zip(exact, approx):
        assert jnp.array_equal(a, b)
