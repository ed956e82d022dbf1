"""Deformable position-sensitive ROI pooling (DCN PSROI).

API-completeness port of the reference extension's second op
(reference: model/backbone/DCNv2/src/cuda/dcn_v2_psroi_pooling_cuda.cu,
dcn_v2.py:132-303) - exposed by the reference but unused by MonoFlex.  Pure
XLA: bilinear gathers over sample points; autodiff provides all gradients.

rois: (N, 5) rows [batch_index, x1, y1, x2, y2] in input pixels.
input: (B, H, W, C) NHWC.  Output: (N, pooled, pooled, output_dim).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .dcn import bilinear_gather


def deform_psroi_pooling(x: jnp.ndarray, rois: jnp.ndarray,
                         trans: Optional[jnp.ndarray] = None,
                         spatial_scale: float = 1.0, output_dim: int = 1,
                         group_size: int = 1, pooled_size: int = 7,
                         sample_per_part: int = 4,
                         trans_std: float = 0.1) -> jnp.ndarray:
    """Position-sensitive ROI pooling with optional learned part offsets.

    ``trans`` (N, pooled, pooled, 2) shifts each part bin (dx, dy) in units of
    the roi size * trans_std; None = no deformation (no_trans).
    """
    B, H, W, C = x.shape
    N = rois.shape[0]
    P = pooled_size
    S = sample_per_part
    assert C == output_dim * group_size * group_size, (
        f"channels {C} != output_dim*group_size^2")

    batch_idx = rois[:, 0].astype(jnp.int32)
    # roi corners, shifted/rounded like the reference kernel
    x1 = jnp.round(rois[:, 1]) * spatial_scale - 0.5
    y1 = jnp.round(rois[:, 2]) * spatial_scale - 0.5
    x2 = (jnp.round(rois[:, 3]) + 1.0) * spatial_scale - 0.5
    y2 = (jnp.round(rois[:, 4]) + 1.0) * spatial_scale - 0.5
    roi_w = jnp.maximum(x2 - x1, 0.1)
    roi_h = jnp.maximum(y2 - y1, 0.1)
    bin_w = roi_w / P
    bin_h = roi_h / P

    # part offsets
    if trans is None:
        dxy = jnp.zeros((N, P, P, 2))
    else:
        dxy = trans * trans_std
        dxy = dxy * jnp.stack([roi_w, roi_h], axis=1)[:, None, None, :]

    # sample grid: for part (i, j), S x S points
    pj, pi = jnp.meshgrid(jnp.arange(P), jnp.arange(P), indexing="ij")  # (P, P) y, x
    sj, si = jnp.meshgrid(jnp.arange(S), jnp.arange(S), indexing="ij")
    # (N, P, P, S, S)
    ys = (y1[:, None, None, None, None]
          + pj[None, :, :, None, None] * bin_h[:, None, None, None, None]
          + (sj[None, None, None] + 0.5) * bin_h[:, None, None, None, None] / S
          + dxy[..., 1][..., None, None])
    xs = (x1[:, None, None, None, None]
          + pi[None, :, :, None, None] * bin_w[:, None, None, None, None]
          + (si[None, None, None] + 0.5) * bin_w[:, None, None, None, None] / S
          + dxy[..., 0][..., None, None])

    # gather from the right batch image: arrange as (N, P*P*S*S) points
    ys_f = ys.reshape(N, -1)
    xs_f = xs.reshape(N, -1)
    x_sel = x[batch_idx]                                   # (N, H, W, C)
    # bilinear_gather wants (B', Ho, Wo, K); use Ho=1, Wo=points, K=1
    sampled = bilinear_gather(x_sel, ys_f[:, None, :, None], xs_f[:, None, :, None])
    sampled = sampled.reshape(N, P, P, S, S, C)

    # position-sensitive channel selection: part (i, j) reads channel group
    # (gj, gi) where g = floor(part / P * group_size)
    gj = (pj * group_size // P)
    gi = (pi * group_size // P)
    group_index = (gj * group_size + gi)                    # (P, P)
    # channel layout: c = (group_idx * output_dim + od)
    chan = group_index[..., None] * output_dim + jnp.arange(output_dim)  # (P,P,od)
    chan = jnp.broadcast_to(chan[None, :, :, None, None, :],
                            (N, P, P, S, S, output_dim))
    ps = jnp.take_along_axis(sampled, chan, axis=-1)
    return ps.mean(axis=(3, 4))
