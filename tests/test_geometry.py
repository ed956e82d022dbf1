import math

import numpy as np
import pytest

from monoflex_tpu.core import geometry as G


def make_calib():
    # KITTI-like P2
    P = np.array([
        [721.5377, 0.0, 609.5593, 44.85728],
        [0.0, 721.5377, 172.854, 0.2163791],
        [0.0, 0.0, 1.0, 0.002745884],
    ])
    return G.Calibration(P)


def test_projection_round_trip():
    calib = make_calib()
    pts = np.array([[1.5, 0.3, 12.0], [-4.0, 1.2, 30.0], [0.0, -0.5, 5.0]])
    uv, depth = calib.project_rect_to_image(pts)
    back = calib.project_image_to_rect(np.concatenate([uv, depth[:, None]], axis=1))
    # the KITTI P matrix has a small non-zero P[2,3], so the pinhole inverse is
    # approximate by construction (the reference shares this quirk); the error
    # is bounded by P[2,3] ~ 3mm
    np.testing.assert_allclose(back, pts, atol=2e-2)


def test_alpha_roty_round_trip():
    rng = np.random.RandomState(0)
    for _ in range(100):
        ry = rng.uniform(-math.pi, math.pi)
        x, z = rng.uniform(-20, 20), rng.uniform(1, 60)
        alpha = G.convert_rot_to_alpha(ry, z, x)
        assert -math.pi <= alpha <= math.pi
        ry2 = alpha + math.atan2(x, z)
        # wrap
        while ry2 > math.pi:
            ry2 -= 2 * math.pi
        while ry2 < -math.pi:
            ry2 += 2 * math.pi
        assert abs(ry2 - ry) < 1e-9


def test_box3d_corners_identity_rotation():
    corners = G.box3d_corners(np.array([4.0, 1.5, 2.0]), np.array([1.0, 2.0, 10.0]), 0.0)
    assert corners.shape == (8, 3)
    # bottom face at y = location y, top face at y - h
    np.testing.assert_allclose(corners[:4, 1], 2.0)
    np.testing.assert_allclose(corners[4:, 1], 0.5)
    np.testing.assert_allclose(corners[:, 0].max(), 3.0)  # 1 + l/2
    np.testing.assert_allclose(corners[:, 2].min(), 9.0)  # 10 - w/2


def test_multibin_round_trip():
    rng = np.random.RandomState(1)
    for _ in range(50):
        alpha = rng.uniform(-math.pi, math.pi)
        enc = G.encode_alpha_multibin(alpha, num_bin=4)
        assert enc.shape == (8,)
        active = enc[:4] == 1
        assert active.sum() >= 1
        # reconstruct from any active bin
        for i in range(4):
            if active[i]:
                rec = G.ALPHA_CENTERS[i] + enc[4 + i]
                d = (rec - alpha + math.pi) % (2 * math.pi) - math.pi
                assert abs(d) < 1e-6


def test_multibin_decode_matches_encode():
    for alpha in np.linspace(-3.1, 3.1, 25):
        enc = G.encode_alpha_multibin(float(alpha), num_bin=4)
        # build a fake network output: logits from cls targets, exact sin/cos
        vec = np.zeros(16, dtype=np.float32)
        for i in range(4):
            vec[2 * i] = 0.0
            vec[2 * i + 1] = 10.0 if enc[i] == 1 else -10.0
            off = enc[4 + i] if enc[i] == 1 else 0.0
            vec[8 + 2 * i] = math.sin(off)
            vec[8 + 2 * i + 1] = math.cos(off)
        dec = G.decode_alpha_multibin(vec, num_bin=4)
        d = (dec - alpha + math.pi) % (2 * math.pi) - math.pi
        assert abs(d) < 1e-5


def test_approx_proj_center_on_border():
    # projected center left of the image; 2D box center inside
    res = G.approx_proj_center(np.array([-50.0, 100.0]), np.array([[200.0, 120.0]]), (1242, 375))
    assert res is not None
    pt, edge = res
    assert edge == 0  # left border
    assert pt[0] == 0.0
    assert 0 <= pt[1] <= 374
    # point lies on the line
    a = (120.0 - 100.0) / (200.0 - (-50.0))
    b = 100.0 - a * (-50.0)
    np.testing.assert_allclose(pt[1], b, atol=1e-9)


def test_flip_calibration():
    calib = make_calib()
    img_w = 1242
    pts = np.array([[2.0, 0.5, 15.0]])
    uv, _ = calib.project_rect_to_image(pts)
    calib2 = make_calib()
    calib2.flip_horizontally(img_w)
    uv2, _ = calib2.project_rect_to_image(np.array([[-2.0, 0.5, 15.0]]))
    # the flip is exact only when P[2,3] == 0; KITTI's |P[2,3]| ~ 3mm bounds the
    # residual at (W-1)*P23/Z ~ 0.23px here (the reference trick shares this)
    np.testing.assert_allclose(uv2[0, 0], img_w - uv[0, 0] - 1, atol=0.3)
    np.testing.assert_allclose(uv2[0, 1], uv[0, 1], atol=1e-6)


class TestJaxParity:
    def test_encode_box3d_matches_numpy(self):
        import jax.numpy as jnp
        from monoflex_tpu.core import geometry_jax as GJ

        rng = np.random.RandomState(2)
        n = 16
        rotys = rng.uniform(-math.pi, math.pi, n).astype(np.float32)
        dims = rng.uniform(0.5, 4.0, (n, 3)).astype(np.float32)
        locs = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        locs[:, 2] += 20

        out = np.asarray(GJ.encode_box3d(jnp.array(rotys), jnp.array(dims), jnp.array(locs)))
        # the network-side corner order is rotated by two within each face
        # relative to the label-side Object3d order (the reference has the same
        # two conventions; each is used self-consistently)
        perm = np.array([2, 3, 0, 1, 6, 7, 4, 5])
        for i in range(n):
            l, h, w = dims[i]
            # geometry.box3d_corners takes bottom-center; here locs is 3D center
            bottom = locs[i].copy()
            bottom[1] += h / 2
            ref = G.box3d_corners(np.array([l, h, w]), bottom, rotys[i])
            np.testing.assert_allclose(out[i], ref[perm], atol=1e-4)

    def test_decode_location_matches_calib(self):
        import jax.numpy as jnp
        from monoflex_tpu.core import geometry_jax as GJ

        calib = make_calib()
        rng = np.random.RandomState(3)
        n = 8
        points = rng.uniform(0, 300, (n, 2)).astype(np.float32)
        offsets = rng.uniform(-2, 2, (n, 2)).astype(np.float32)
        depths = rng.uniform(5, 60, n).astype(np.float32)
        pad = np.tile(np.array([[19.0, 4.0]], dtype=np.float32), (n, 1))
        params = np.tile(calib.as_params()[None], (n, 1))

        out = np.asarray(GJ.decode_location(
            jnp.array(points), jnp.array(offsets), jnp.array(depths),
            jnp.array(params), jnp.array(pad), down_ratio=4))
        uv = (points + offsets) * 4 - pad
        ref = calib.project_image_to_rect(np.concatenate([uv, depths[:, None]], axis=1))
        np.testing.assert_allclose(out, ref, atol=1e-3)

    def test_keypoint_depth_formula(self):
        import jax.numpy as jnp
        from monoflex_tpu.core import geometry_jax as GJ

        calib = make_calib()
        n = 4
        h3d = np.full(n, 1.5, dtype=np.float32)
        dims = np.stack([np.full(n, 4.0), h3d, np.full(n, 2.0)], axis=1).astype(np.float32)
        # keypoints: bottom corners at y=+5, top at y=-5 => pixel height 10
        kpts = np.zeros((n, 10, 2), dtype=np.float32)
        kpts[:, :4, 1] = 5.0
        kpts[:, 4:8, 1] = -5.0
        kpts[:, 8, 1] = 5.0
        kpts[:, 9, 1] = -5.0
        params = np.tile(calib.as_params()[None], (n, 1))

        out = np.asarray(GJ.decode_depth_from_keypoints(
            jnp.array(kpts), jnp.array(dims), jnp.array(params), down_ratio=4))
        expect = calib.f_u * 1.5 / (10.0 * 4 + 1e-3)
        np.testing.assert_allclose(out, expect, rtol=1e-5)

    def test_decode_orientation_round_trip(self):
        import jax.numpy as jnp
        from monoflex_tpu.core import geometry_jax as GJ

        alphas = np.linspace(-3.0, 3.0, 13)
        locs = np.stack([np.full(13, 3.0), np.zeros(13), np.full(13, 20.0)], axis=1)
        vecs = []
        for alpha in alphas:
            enc = G.encode_alpha_multibin(float(alpha), num_bin=4)
            vec = np.zeros(16, dtype=np.float32)
            for i in range(4):
                vec[2 * i + 1] = 10.0 if enc[i] == 1 else -10.0
                off = enc[4 + i] if enc[i] == 1 else 0.0
                vec[8 + 2 * i] = math.sin(off)
                vec[8 + 2 * i + 1] = math.cos(off)
            vecs.append(vec)
        rotys, alphas_out = GJ.decode_axes_orientation(
            jnp.array(np.stack(vecs)), jnp.array(locs.astype(np.float32)), num_bin=4)
        ray = math.atan2(3.0, 20.0)
        for i, alpha in enumerate(alphas):
            d = (float(alphas_out[i]) - alpha + math.pi) % (2 * math.pi) - math.pi
            assert abs(d) < 1e-4
            expect_ry = alpha + ray
            if expect_ry > math.pi:
                expect_ry -= 2 * math.pi
            d2 = (float(rotys[i]) - expect_ry + math.pi) % (2 * math.pi) - math.pi
            assert abs(d2) < 1e-4

    def test_decode_dimension(self):
        import jax.numpy as jnp
        from monoflex_tpu.core import geometry_jax as GJ

        mean = jnp.array([[3.884, 1.5261, 1.6286], [0.8423, 1.7607, 0.6602], [1.7635, 1.7372, 0.5968]])
        std = jnp.ones((3, 3))
        cls_ids = jnp.array([0, 1, 2])
        offs = jnp.zeros((3, 3))
        dims = np.asarray(GJ.decode_dimension(cls_ids, offs, mean, std, mode="exp"))
        np.testing.assert_allclose(dims, np.asarray(mean), rtol=1e-6)


def test_gaussian_radius_positive():
    from monoflex_tpu.core import heatmap as H

    r = H.gaussian_radius(20, 40)
    assert r > 0
    # big overlap demand -> smaller radius
    assert H.gaussian_radius(20, 40, 0.9) < H.gaussian_radius(20, 40, 0.5)


def test_draw_gaussian_peak():
    from monoflex_tpu.core import heatmap as H

    hm = np.zeros((96, 320), dtype=np.float32)
    H.draw_gaussian(hm, (100, 50), 5)
    assert hm[50, 100] == 1.0
    assert hm[50, 105] > 0
    assert hm[50, 107] == 0.0
    # edge clipping does not crash
    H.draw_gaussian(hm, (0, 0), 3)
    assert hm[0, 0] == 1.0


def test_draw_ellip_gaussian_1d_degenerate():
    from monoflex_tpu.core import heatmap as H

    hm = np.zeros((96, 320), dtype=np.float32)
    H.draw_ellip_gaussian(hm, (0, 50), 0, 8)  # radius_x = 0 => vertical 1-D strip
    assert hm[50, 0] == 1.0
    assert hm[54, 0] > 0
    assert hm[50, 2] == 0.0


def test_affine_transform_helpers():
    from monoflex_tpu.core.heatmap import affine_transform, get_transform_matrix

    M = get_transform_matrix([(621, 187), (1242, 375)], (320, 96))
    # image center -> output center; corners scale accordingly
    np.testing.assert_allclose(affine_transform(np.array([621, 187]), M),
                               [160, 48], atol=1e-3)
    out = affine_transform(np.array([[0.0, 187], [621, 0.0]]), M)
    np.testing.assert_allclose(out[0], [0.0, 48], atol=1e-3)
    np.testing.assert_allclose(out[1], [160, 0.12], atol=0.2)


def test_head_axis_orientation_decode():
    import jax.numpy as jnp
    from monoflex_tpu.core import geometry_jax as GJ

    # axis class 1 (pi/2 family), heading 0, zero offset -> alpha = pi/2
    v = jnp.array([[-5.0, 5.0, 5.0, -5.0, 0.0, 1.0]])
    locs = jnp.array([[0.0, 0.0, 20.0]])
    roty, alpha = GJ.decode_axes_orientation_head_axis(v, locs)
    assert abs(float(alpha[0]) - math.pi / 2) < 1e-5
    assert abs(float(roty[0]) - math.pi / 2) < 1e-5  # ray = 0 at x=0
