"""Rotated-box / 3D box IoU, vectorized JAX (on-device diagnostics).

TPU replacement for the reference's shapely-based 3D IoU diagnostics
(reference: model/layers/iou_loss.py:176-216, detector_infer.py:454-490):
exact convex polygon clipping (Sutherland-Hodgman) over fixed-size vertex
buffers so it jits, vmapped over box pairs.

The offline AP evaluator has its own numpy/native implementation
(eval/rotate_iou.py) mirroring the reference's numba-CUDA kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_VMAX = 16  # intersection of two convex quads has <= 8 vertices; padded


def _clip_by_halfplane(poly: jnp.ndarray, count: jnp.ndarray,
                       p1: jnp.ndarray, p2: jnp.ndarray):
    """Clip a polygon (VMAX, 2) with ``count`` valid vertices by the half-plane
    left of the directed edge p1 -> p2. Returns (new_poly, new_count)."""

    edge = p2 - p1

    def side(pt):
        d = pt - p1
        return edge[0] * d[1] - edge[1] * d[0]

    def body(i, state):
        out, m = state
        cur = poly[i]
        nxt = poly[jnp.where(i + 1 >= count, 0, i + 1)]
        s_cur = side(cur)
        s_nxt = side(nxt)
        inside_cur = s_cur >= 0
        inside_nxt = s_nxt >= 0
        denom = s_cur - s_nxt
        t = jnp.where(jnp.abs(denom) < 1e-12, 0.0, s_cur / jnp.where(denom == 0, 1.0, denom))
        inter = cur + (nxt - cur) * t

        emit_cur = inside_cur & (i < count)
        out = out.at[m].set(jnp.where(emit_cur, cur, out[m]))
        m = m + emit_cur.astype(jnp.int32)
        emit_inter = (inside_cur != inside_nxt) & (i < count)
        out = out.at[m].set(jnp.where(emit_inter, inter, out[m]))
        m = m + emit_inter.astype(jnp.int32)
        return out, m

    out = jnp.zeros_like(poly)
    out, m = jax.lax.fori_loop(0, _VMAX, body, (out, jnp.int32(0)))
    return out, m


def _polygon_area(poly: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area over the first ``count`` vertices."""
    idx = jnp.arange(_VMAX)
    nxt = jnp.where(idx + 1 >= count, 0, idx + 1)
    x, y = poly[:, 0], poly[:, 1]
    contrib = x * y[nxt] - x[nxt] * y
    contrib = jnp.where(idx < count, contrib, 0.0)
    return 0.5 * jnp.abs(jnp.sum(contrib))


def _intersection_area_single(quad_a: jnp.ndarray, quad_b: jnp.ndarray) -> jnp.ndarray:
    """Area of intersection of two convex quads (4, 2) with CCW or CW winding."""

    def orient_ccw(q):
        # shoelace sign; flip if clockwise
        s = jnp.sum(q[:, 0] * jnp.roll(q[:, 1], -1) - jnp.roll(q[:, 0], -1) * q[:, 1])
        return jnp.where(s < 0, q[::-1], q)

    a = orient_ccw(quad_a)
    b = orient_ccw(quad_b)
    poly = jnp.zeros((_VMAX, 2)).at[:4].set(a)
    count = jnp.int32(4)
    for i in range(4):
        poly, count = _clip_by_halfplane(poly, count, b[i], b[(i + 1) % 4])
    return _polygon_area(poly, count)


def rotated_iou_pairs(corners_a: jnp.ndarray, corners_b: jnp.ndarray) -> jnp.ndarray:
    """BEV IoU for matched pairs of rotated rectangles.

    corners_a/b: (N, 4, 2). Returns (N,).
    """
    inter = jax.vmap(_intersection_area_single)(corners_a, corners_b)
    area_a = jax.vmap(lambda q: _polygon_area(jnp.zeros((_VMAX, 2)).at[:4].set(q), jnp.int32(4)))(corners_a)
    area_b = jax.vmap(lambda q: _polygon_area(jnp.zeros((_VMAX, 2)).at[:4].set(q), jnp.int32(4)))(corners_b)
    return inter / jnp.clip(area_a + area_b - inter, 1e-7, None)


def iou_3d_pairs(pred_corners: jnp.ndarray, target_corners: jnp.ndarray) -> jnp.ndarray:
    """3D IoU for matched pairs of 8-corner boxes in rect camera coords
    (y down; corners 0-3 bottom, 4-7 top), matching the reference diagnostic
    (reference: model/layers/iou_loss.py:176-216)."""
    A, B = pred_corners, target_corners
    min_h_a = -jnp.mean(A[:, 0:4, 1], axis=1)
    max_h_a = -jnp.mean(A[:, 4:8, 1], axis=1)
    min_h_b = -jnp.mean(B[:, 0:4, 1], axis=1)
    max_h_b = -jnp.mean(B[:, 4:8, 1], axis=1)
    h_overlap = jnp.clip(jnp.minimum(max_h_a, max_h_b) - jnp.maximum(min_h_a, min_h_b), 0.0, None)

    bev_a = A[:, 0:4][:, :, [0, 2]]
    bev_b = B[:, 0:4][:, :, [0, 2]]
    inter_bev = jax.vmap(_intersection_area_single)(bev_a, bev_b)
    overlap3d = inter_bev * h_overlap

    area_a = jax.vmap(_intersection_area_single)(bev_a, bev_a)
    area_b = jax.vmap(_intersection_area_single)(bev_b, bev_b)
    union3d = (area_a * (max_h_a - min_h_a) + area_b * (max_h_b - min_h_b) - overlap3d)
    return overlap3d / jnp.clip(union3d, 1e-7, None)
