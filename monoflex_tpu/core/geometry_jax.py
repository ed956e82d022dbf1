"""Device-side geometry codec (JAX, batched, jit/vmap-friendly).

TPU-first re-design of the reference ``Anno_Encoder`` (reference:
model/anno_encoder.py:10-295).  Differences from the reference are purely
structural, not semantic:

  * Per-image python loops over ``calibs`` become arithmetic on packed
    per-sample intrinsics ``calib_params`` = [f_u f_v c_u c_v b_x b_y] (N, 6):
    one fused elementwise op instead of a host loop
    (reference: model/anno_encoder.py:142-155, 187-219).
  * Everything is fixed shape; invalid rows are simply garbage the caller
    masks out, which XLA handles far better than boolean compaction.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp

PI = math.pi

# plain numpy, NOT jnp: a module-level device array would initialize the
# XLA backend at import time, which breaks multi-host startup (the CLI must
# reach jax.distributed.initialize before any backend use)
import numpy as _np

ALPHA_CENTERS = _np.array([0.0, PI / 2, PI, -PI / 2], dtype=_np.float32)


def rad_to_matrix(rotys: jnp.ndarray) -> jnp.ndarray:
    """(N,) yaw -> (N, 3, 3) rotation about the camera Y axis."""
    cos, sin = jnp.cos(rotys), jnp.sin(rotys)
    zeros = jnp.zeros_like(cos)
    ones = jnp.ones_like(cos)
    return jnp.stack([
        jnp.stack([cos, zeros, sin], axis=-1),
        jnp.stack([zeros, ones, zeros], axis=-1),
        jnp.stack([-sin, zeros, cos], axis=-1),
    ], axis=-2)


# Corner assembly: dims are (l, h, w); the reference gathers a fixed index
# pattern so corners 0-3 are the bottom face (y=0 ... actually y=+h/2 around
# the 3D center) and 4-7 the top face (reference: model/anno_encoder.py:111-122).
_CORNER_INDEX = _np.array([
    [4, 5, 0, 1, 6, 7, 2, 3],   # x from +-l/2
    [0, 1, 2, 3, 4, 5, 6, 7],   # y from +-h/2
    [4, 0, 1, 5, 6, 2, 3, 7],   # z from +-w/2
], dtype=_np.int32)


def encode_box3d(rotys: jnp.ndarray, dims: jnp.ndarray, locs: jnp.ndarray) -> jnp.ndarray:
    """(N,), (N,3 l-h-w), (N,3 center) -> (N, 8, 3) corners in rect coords.

    ``locs`` here is the 3D *center* (not the KITTI bottom-center).
    """
    rotys = rotys.reshape(-1)
    dims = dims.reshape(-1, 3)
    locs = locs.reshape(-1, 3)
    ry = rad_to_matrix(rotys)                                 # (N, 3, 3)

    # gather per-row index pattern: for row r (x/y/z), corner c uses column
    # _CORNER_INDEX[r, c] of the +-dim/2 table for that axis.
    half_dims = dims * 0.5                                     # (N, 3)
    plus_minus = jnp.stack([half_dims] * 4 + [-half_dims] * 4, axis=-1)  # (N, 3, 8) cols 0-3:+, 4-7:-
    box_obj = jnp.take_along_axis(plus_minus, jnp.broadcast_to(_CORNER_INDEX, plus_minus.shape), axis=-1)
    # tiny 3x3 matmuls where 1e-3 MXU rounding would move corners by mm: keep
    # them in full f32 (negligible FLOPs, decode accuracy matters)
    corners = jnp.einsum("nij,njk->nik", ry, box_obj,
                         precision=jax.lax.Precision.HIGHEST)   # (N, 3, 8)
    corners = corners + locs[..., None]
    return jnp.transpose(corners, (0, 2, 1))


def decode_depth(depths_offset: jnp.ndarray, mode: str = "inv_sigmoid",
                 depth_ref: Sequence[float] = (26.494627, 16.05988),
                 depth_range: Sequence[float] = (0.1, 100.0)) -> jnp.ndarray:
    """Depth head output -> metric depth (reference: model/anno_encoder.py:124-140)."""
    if mode == "exp":
        depth = jnp.exp(depths_offset)
    elif mode == "linear":
        depth = depths_offset * depth_ref[1] + depth_ref[0]
    elif mode == "inv_sigmoid":
        depth = 1.0 / jax.nn.sigmoid(depths_offset) - 1.0
    else:
        raise ValueError(f"unknown depth mode {mode}")
    if depth_range is not None:
        depth = jnp.clip(depth, depth_range[0], depth_range[1])
    return depth


def project_image_to_rect(points_uv: jnp.ndarray, depths: jnp.ndarray,
                          calib_params: jnp.ndarray) -> jnp.ndarray:
    """Batched pinhole back-projection.

    points_uv: (N, 2) pixel coords in the ORIGINAL image frame.
    depths:    (N,)
    calib_params: (N, 6) rows [f_u f_v c_u c_v b_x b_y] (already gathered per
    object, e.g. ``batch_params[batch_idxs]``).
    """
    f_u, f_v = calib_params[:, 0], calib_params[:, 1]
    c_u, c_v = calib_params[:, 2], calib_params[:, 3]
    b_x, b_y = calib_params[:, 4], calib_params[:, 5]
    x = (points_uv[:, 0] - c_u) * depths / f_u + b_x
    y = (points_uv[:, 1] - c_v) * depths / f_v + b_y
    return jnp.stack([x, y, depths], axis=1)


def decode_location(points: jnp.ndarray, offsets: jnp.ndarray, depths: jnp.ndarray,
                    calib_params: jnp.ndarray, pad_size: jnp.ndarray,
                    down_ratio: int = 4) -> jnp.ndarray:
    """Feature-map peak + offset + depth -> 3D location (rect coords).

    points/offsets: (N, 2) in feature-map pixels; pad_size: (N, 2) per object
    (reference: model/anno_encoder.py:142-155, loop -> vectorized).
    """
    uv = (points + offsets) * down_ratio - pad_size
    return project_image_to_rect(uv, depths, calib_params)


def decode_depth_from_keypoints(keypoints: jnp.ndarray, dims: jnp.ndarray,
                                calib_params: jnp.ndarray, down_ratio: int = 4,
                                depth_range: Sequence[float] = (0.1, 100.0),
                                eps: float = 1e-3) -> jnp.ndarray:
    """Keypoint-triangulated depths (N, 3): [center-pair, diag-02, diag-13].

    keypoints: (N, 10, 2) offsets in feature pixels (8 corners + bottom/top
    centers); depth = f_u * H3D / (pixel_height * down_ratio)
    (reference: model/anno_encoder.py:187-219).
    """
    f_u = calib_params[:, 0]
    height_3d = dims[:, 1]

    center_h = keypoints[:, 8, 1] - keypoints[:, 9, 1]
    corner_02_h = keypoints[:, [0, 2], 1] - keypoints[:, [4, 6], 1]
    corner_13_h = keypoints[:, [1, 3], 1] - keypoints[:, [5, 7], 1]

    def h2d(hh):
        return jax.nn.relu(hh) * down_ratio + eps

    center_depth = f_u * height_3d / h2d(center_h)
    corner_02_depth = (f_u * height_3d)[:, None] / h2d(corner_02_h)
    corner_13_depth = (f_u * height_3d)[:, None] / h2d(corner_13_h)
    depths = jnp.stack([
        center_depth,
        corner_02_depth.mean(axis=1),
        corner_13_depth.mean(axis=1),
    ], axis=1)
    return jnp.clip(depths, depth_range[0], depth_range[1])


def decode_dimension(cls_ids: jnp.ndarray, dims_offset: jnp.ndarray,
                     dim_mean: jnp.ndarray, dim_std: jnp.ndarray,
                     mode: str = "exp", use_mean: bool = True,
                     use_std: bool = False) -> jnp.ndarray:
    """Class-conditioned dimension decode (reference: model/anno_encoder.py:221-243)."""
    cls_ids = jnp.clip(cls_ids.reshape(-1).astype(jnp.int32), 0, dim_mean.shape[0] - 1)
    mean = dim_mean[cls_ids]
    if mode == "exp":
        dims_offset = jnp.exp(dims_offset)
    if use_std:
        return dims_offset * dim_std[cls_ids] + mean
    return dims_offset * mean


def decode_axes_orientation(vector_ori: jnp.ndarray, locations: jnp.ndarray,
                            num_bin: int = 4):
    """Multibin head output + location -> (roty, alpha), both wrapped to [-pi, pi].

    vector_ori: (N, 4*num_bin) = [bin cls logits (2/bin), sin/cos (2/bin)]
    (reference: model/anno_encoder.py:245-295, masked loop -> gather).
    """
    n = vector_ori.shape[0]
    logits = vector_ori[:, : num_bin * 2].reshape(n, num_bin, 2)
    probs = jax.nn.softmax(logits, axis=2)[..., 1]
    best = jnp.argmax(probs, axis=1)                            # (N,)

    sincos = vector_ori[:, num_bin * 2:].reshape(n, num_bin, 2)
    chosen = jnp.take_along_axis(sincos, best[:, None, None].astype(jnp.int32), axis=1)[:, 0]
    alphas = (jnp.arctan2(chosen[:, 0], chosen[:, 1])
              + jnp.asarray(ALPHA_CENTERS)[best])

    locations = locations.reshape(-1, 3)
    rays = jnp.arctan2(locations[:, 0], locations[:, 2])
    rotys = alphas + rays

    rotys = jnp.where(rotys > PI, rotys - 2 * PI, rotys)
    rotys = jnp.where(rotys < -PI, rotys + 2 * PI, rotys)
    alphas = jnp.where(alphas > PI, alphas - 2 * PI, alphas)
    alphas = jnp.where(alphas < -PI, alphas + 2 * PI, alphas)
    return rotys, alphas


def decode_axes_orientation_head_axis(vector_ori: jnp.ndarray,
                                      locations: jnp.ndarray):
    """Non-multibin ('head-axis') orientation decode: 2-way axis class +
    2-way heading class + normalized (sin, cos) offset
    (reference: model/anno_encoder.py:266-274; the reference dataset never
    emits these targets — kept for API parity with the decode branch)."""
    axis_cls = (vector_ori[:, 1] > vector_ori[:, 0]).astype(jnp.int32)
    head_cls = (vector_ori[:, 3] > vector_ori[:, 2]).astype(jnp.int32)
    sincos = vector_ori[:, 4:6]
    sincos = sincos / jnp.linalg.norm(sincos, axis=1, keepdims=True).clip(1e-9)
    alphas = (jnp.asarray(ALPHA_CENTERS)[axis_cls + head_cls * 2]
              + jnp.arctan(sincos[:, 0] / jnp.where(sincos[:, 1] == 0, 1e-9,
                                                    sincos[:, 1])))
    locations = locations.reshape(-1, 3)
    rays = jnp.arctan2(locations[:, 0], locations[:, 2])
    rotys = alphas + rays
    rotys = jnp.where(rotys > PI, rotys - 2 * PI, rotys)
    rotys = jnp.where(rotys < -PI, rotys + 2 * PI, rotys)
    alphas = jnp.where(alphas > PI, alphas - 2 * PI, alphas)
    alphas = jnp.where(alphas < -PI, alphas + 2 * PI, alphas)
    return rotys, alphas


def decode_box2d_fcos(centers: jnp.ndarray, pred_offset: jnp.ndarray,
                      pad_size: jnp.ndarray = None, out_size: jnp.ndarray = None,
                      down_ratio: int = 4) -> jnp.ndarray:
    """FCOS-style l/t/r/b offsets -> absolute 2D boxes; optionally upscale to
    the original image and clamp (reference: model/anno_encoder.py:69-86)."""
    box2d = jnp.concatenate([
        centers - pred_offset[:, :2],
        centers + pred_offset[:, 2:],
    ], axis=1)
    if pad_size is not None:
        box2d = box2d * down_ratio - jnp.tile(pad_size, (1, 2))
        w = out_size[:, 0:1]
        h = out_size[:, 1:2]
        x_lo = jnp.zeros_like(w)
        box2d = jnp.concatenate([
            jnp.clip(box2d[:, 0:1], x_lo, w - 1),
            jnp.clip(box2d[:, 1:2], x_lo, h - 1),
            jnp.clip(box2d[:, 2:3], x_lo, w - 1),
            jnp.clip(box2d[:, 3:4], x_lo, h - 1),
        ], axis=1)
    return box2d
