"""On-device diagnostic evaluators (depth-error suite + disentangled 3D IoU).

Ports of the reference's rich in-model diagnostics (reference:
model/head/detector_infer.py:280-452): per-estimator depth errors with the
oracle lower bound, and 3D IoU disentangled per component (offset / depth /
dimension / orientation each swapped into the ground-truth box).  Masked
fixed-shape re-expressions of the reference's boolean-compacted math; enabled
via TEST.EVAL_DEPTH / TEST.EVAL_DIS_IOUS.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from ..core import geometry_jax as GJ
from ..models.heads.key2channel import Key2Channel
from ..ops.image_ops import select_point_of_interest
from ..ops.rotated_iou import iou_3d_pairs
from ..losses.primitives import masked_mean


class DiagnosticEvaluator:
    def __init__(self, cfg):
        h = cfg.MODEL.HEAD
        self.k2c = Key2Channel(h.REGRESSION_HEADS, h.REGRESSION_CHANNELS)
        self.down_ratio = cfg.MODEL.BACKBONE.DOWN_RATIO
        self.num_bin = cfg.INPUT.ORIENTATION_BIN_SIZE
        self.depth_mode = h.DEPTH_MODE
        self.depth_range = tuple(h.DEPTH_RANGE)
        self.depth_ref = tuple(h.DEPTH_REFERENCE)
        self.dim_mean = jnp.asarray(h.DIMENSION_MEAN, dtype=jnp.float32)
        self.dim_std = jnp.asarray(h.DIMENSION_STD, dtype=jnp.float32)
        self.dim_mode = h.DIMENSION_REG

    def _poi(self, batch, reg_map):
        if isinstance(reg_map, (list, tuple)):
            B = reg_map[0].shape[0]
            C = sum(m.shape[-1] for m in reg_map)
        else:
            B, _, _, C = reg_map.shape
        M = batch["reg_mask"].shape[1]
        N = B * M
        poi = select_point_of_interest(reg_map, batch["target_centers"]).reshape(N, C)
        mask = batch["reg_mask"].reshape(N).astype(jnp.float32)
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
        return poi, mask, batch_idx, N

    def _decode_common(self, batch, poi, batch_idx, N):
        k2c = self.k2c
        calib = batch["calib_params"][batch_idx]
        cls_ids = batch["cls_ids"].reshape(N)
        dims = GJ.decode_dimension(cls_ids, poi[:, k2c("3d_dim")], self.dim_mean,
                                   self.dim_std, mode=self.dim_mode[0],
                                   use_std=bool(self.dim_mode[2]))
        direct_depth = GJ.decode_depth(poi[:, k2c("depth")][:, 0], self.depth_mode,
                                       self.depth_ref, self.depth_range)
        kpts = poi[:, k2c("corner_offset")].reshape(N, 10, 2)
        kpt_depths = GJ.decode_depth_from_keypoints(kpts, dims, calib,
                                                    self.down_ratio, self.depth_range)
        direct_unc = jnp.exp(poi[:, k2c("depth_uncertainty")])
        kpt_unc = jnp.exp(poi[:, k2c("corner_uncertainty")])
        comb_depths = jnp.concatenate([direct_depth[:, None], kpt_depths], axis=1)
        comb_unc = jnp.concatenate([direct_unc, kpt_unc], axis=1)
        return dims, direct_depth, kpt_depths, comb_depths, comb_unc, calib

    def evaluate_depths(self, batch, reg_map) -> Dict[str, jnp.ndarray]:
        """Masked means of per-estimator absolute depth errors
        (reference: detector_infer.py:280-359)."""
        poi, mask, batch_idx, N = self._poi(batch, reg_map)
        (_, direct_depth, kpt_depths, comb_depths, comb_unc,
         _) = self._decode_common(batch, poi, batch_idx, N)

        target_depths = batch["locations"].reshape(N, 3)[:, 2]
        err = jnp.abs(comb_depths - target_depths[:, None])

        hard_idx = jnp.argmin(comb_unc, axis=1)
        hard_err = jnp.take_along_axis(err, hard_idx[:, None], axis=1)[:, 0]
        weights = 1.0 / comb_unc
        weights = weights / weights.sum(axis=1, keepdims=True)
        soft_depth = jnp.sum(comb_depths * weights, axis=1)

        out = {
            "direct": err[:, 0],
            "keypoint_center": err[:, 1],
            "keypoint_02": err[:, 2],
            "keypoint_13": err[:, 3],
            "sigma_min": hard_err,
            "sigma_weighted": jnp.abs(soft_depth - target_depths),
            "mean": jnp.abs(comb_depths.mean(axis=1) - target_depths),
            "min": jnp.min(err, axis=1),
            "direct_sigma": comb_unc[:, 0],
            "keypoint_center_sigma": comb_unc[:, 1],
            "keypoint_02_sigma": comb_unc[:, 2],
            "keypoint_13_sigma": comb_unc[:, 3],
        }
        return {k: masked_mean(v, mask) for k, v in out.items()}

    def evaluate_disentangled_iou(self, batch, reg_map,
                                  output_depth: str = "soft") -> Dict[str, jnp.ndarray]:
        """3D IoU with one predicted component swapped into the GT box
        (reference: detector_infer.py:361-452)."""
        k2c = self.k2c
        poi, mask, batch_idx, N = self._poi(batch, reg_map)
        (dims, direct_depth, kpt_depths, comb_depths, comb_unc,
         calib) = self._decode_common(batch, poi, batch_idx, N)
        pad = batch["pad_size"][batch_idx]
        points = batch["target_centers"].reshape(N, 2).astype(jnp.float32)

        t_locs = batch["locations"].reshape(N, 3)
        t_dims = batch["dimensions"].reshape(N, 3)
        t_rotys = batch["rotys"].reshape(N)
        t_offset = batch["offset_3D"].reshape(N, 2)
        t_depths = t_locs[:, 2]

        pred_offset = poi[:, k2c("3d_offset")]
        pred_ori = jnp.concatenate([poi[:, k2c("ori_cls")], poi[:, k2c("ori_offset")]],
                                   axis=1)
        if output_depth == "direct":
            pred_depths = direct_depth
        else:
            idx = jnp.argmin(comb_unc, axis=1)
            pred_depths = jnp.take_along_axis(comb_depths, idx[:, None], axis=1)[:, 0]

        dec = lambda off, dep: GJ.decode_location(points, off, dep, calib, pad,
                                                  self.down_ratio)
        loc_offset = dec(pred_offset, t_depths)      # only offset predicted
        loc_depth = dec(t_offset, pred_depths)       # only depth predicted
        loc_full = dec(pred_offset, pred_depths)

        rotys_at_gt, _ = GJ.decode_axes_orientation(pred_ori, t_locs, self.num_bin)
        rotys_full, _ = GJ.decode_axes_orientation(pred_ori, loc_full, self.num_bin)

        def iou(locs, dims_, rotys_):
            pred_c = GJ.encode_box3d(rotys_, dims_, locs)
            tgt_c = GJ.encode_box3d(t_rotys, t_dims, t_locs)
            return masked_mean(iou_3d_pairs(pred_c, tgt_c), mask)

        return {
            "pred_IoU": iou(loc_full, dims, rotys_full),
            "offset_IoU": iou(loc_offset, t_dims, t_rotys),
            "depth_IoU": iou(loc_depth, t_dims, t_rotys),
            "dims_IoU": iou(t_locs, dims, t_rotys),
            "orien_IoU": iou(t_locs, t_dims, rotys_at_gt),
        }
