"""The MonoFlex multi-task loss (11 terms, learned uncertainties).

Re-derivation of the reference loss computation (reference:
model/head/detector_loss.py:22-517) in fixed-shape masked form: the
reference's boolean compaction (``flatten_reg_mask_gt`` gathers,
detector_loss.py:124-160) becomes mask-weighted reductions with clamped
denominators, preserving every normalization constant while keeping all
shapes static for XLA.

The whole computation is one pure function of (head outputs, batch targets)
so it lives inside the jitted train step; per-image calibration enters as
packed intrinsics, never as host objects.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..core import geometry_jax as GJ
from ..models.heads.key2channel import Key2Channel
from ..ops.image_ops import select_point_of_interest
from ..ops.rotated_iou import iou_3d_pairs
from .primitives import (berhu_loss, iou_loss_2d, l1, log_l1_loss, masked_mean,
                         multibin_orientation_loss, penalty_reduced_focal_loss,
                         smooth_l1)


class LossComputer:
    def __init__(self, cfg):
        h = cfg.MODEL.HEAD
        self.k2c = Key2Channel(h.REGRESSION_HEADS, h.REGRESSION_CHANNELS)
        self.max_objs = cfg.DATASETS.MAX_OBJECTS
        self.down_ratio = cfg.MODEL.BACKBONE.DOWN_RATIO
        self.num_bin = cfg.INPUT.ORIENTATION_BIN_SIZE

        self.loss_weights = dict(zip(h.LOSS_NAMES, h.INIT_LOSS_WEIGHT))
        self.loss_keys = list(h.LOSS_NAMES)
        self.focal_alpha = h.LOSS_PENALTY_ALPHA
        self.focal_beta = h.LOSS_BETA
        self.iou_type = h.LOSS_TYPE[2]
        self.reg_loss_name = h.LOSS_TYPE[1]
        self.depth_loss_name = h.LOSS_TYPE[3]
        self.trunc_offset_loss_type = h.TRUNCATION_OFFSET_LOSS
        self.uncertainty_range = h.UNCERTAINTY_RANGE
        self.corner_loss_depth = h.CORNER_LOSS_DEPTH
        self.modify_invalid_keypoint_depths = h.MODIFY_INVALID_KEYPOINT_DEPTH
        self.dim_weight = jnp.asarray(h.DIMENSION_WEIGHT, dtype=jnp.float32).reshape(1, 3)
        self.dim_mean = jnp.asarray(h.DIMENSION_MEAN, dtype=jnp.float32)
        self.dim_std = jnp.asarray(h.DIMENSION_STD, dtype=jnp.float32)
        self.dim_mode = h.DIMENSION_REG
        self.depth_mode = h.DEPTH_MODE
        self.depth_range = tuple(h.DEPTH_RANGE)
        self.depth_ref = tuple(h.DEPTH_REFERENCE)

        self.compute_direct_depth_loss = "depth_loss" in self.loss_keys
        self.compute_keypoint_depth_loss = "keypoint_depth_loss" in self.loss_keys
        self.compute_weighted_depth_loss = "weighted_avg_depth_loss" in self.loss_keys
        self.compute_corner_loss = "corner_loss" in self.loss_keys
        self.separate_trunc_offset = "trunc_offset_loss" in self.loss_keys
        self.pred_direct_depth = "depth" in self.k2c
        self.depth_with_uncertainty = "depth_uncertainty" in self.k2c
        self.compute_keypoint_corner = "corner_offset" in self.k2c
        self.corner_with_uncertainty = "corner_uncertainty" in self.k2c

    def _reg_fn(self, pred, target):
        return l1(pred, target) if self.reg_loss_name == "L1" else smooth_l1(pred, target)

    def _depth_fn(self, pred_depth, target_depth):
        if self.depth_loss_name == "L1":
            return l1(pred_depth, target_depth)
        if self.depth_loss_name == "berhu":
            return berhu_loss(pred_depth, target_depth)
        if self.depth_loss_name == "log":
            return log_l1_loss(pred_depth, target_depth)
        raise NotImplementedError(self.depth_loss_name)

    def __call__(self, predictions: Dict[str, jnp.ndarray], batch: Dict[str, jnp.ndarray]
                 ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
        k2c = self.k2c
        w = self.loss_weights
        reg_map = predictions["reg"]
        if isinstance(reg_map, (list, tuple)):
            B, H, W, _ = reg_map[0].shape
            C = sum(m.shape[-1] for m in reg_map)
        else:
            B, H, W, C = reg_map.shape
        M = self.max_objs
        N = B * M

        def flat(x, *trailing):
            return x.reshape((N,) + trailing)

        mask3d = flat(batch["reg_mask"].astype(jnp.float32))
        batch_idx = jnp.repeat(jnp.arange(B, dtype=jnp.int32), M)
        calib_params = batch["calib_params"][batch_idx]          # (N, 6)
        pad_size = batch["pad_size"][batch_idx]                  # (N, 2)

        points = flat(batch["target_centers"], 2).astype(jnp.float32)
        target_boxes = flat(batch["2d_bboxes"], 4)
        t_h = target_boxes[:, 3] - target_boxes[:, 1]
        t_w = target_boxes[:, 2] - target_boxes[:, 0]
        mask2d = mask3d * ((t_h > 0) & (t_w > 0)).astype(jnp.float32)

        target_reg_2d = jnp.concatenate(
            [points - target_boxes[:, :2], target_boxes[:, 2:] - points], axis=1)

        target_cls = flat(batch["cls_ids"]).astype(jnp.int32)
        target_depth = flat(batch["locations"], 3)[:, 2]
        target_rotys = flat(batch["rotys"])
        target_offset = flat(batch["offset_3D"], 2)
        target_dims = flat(batch["dimensions"], 3)
        target_ori = flat(batch["orientations"], self.num_bin * 2)
        trunc_mask = flat(batch["trunc_mask"].astype(jnp.float32)) * mask3d

        # the reference re-derives target locations from (center+offset, depth)
        # rather than the raw labels (detector_loss.py:150-151)
        target_locs = GJ.decode_location(points, target_offset, target_depth,
                                         calib_params, pad_size, self.down_ratio)
        target_corners = GJ.encode_box3d(target_rotys, target_dims, target_locs)

        # ---- gather predictions at GT centers ----
        poi = select_point_of_interest(reg_map, batch["target_centers"]).reshape(N, C)

        pred_reg_2d = jax.nn.relu(poi[:, k2c("2d_dim")])
        pred_offset = poi[:, k2c("3d_offset")]
        pred_dim_offsets = poi[:, k2c("3d_dim")]
        pred_ori = jnp.concatenate([poi[:, k2c("ori_cls")], poi[:, k2c("ori_offset")]], axis=1)
        pred_dims = GJ.decode_dimension(
            target_cls, pred_dim_offsets, self.dim_mean, self.dim_std,
            mode=self.dim_mode[0], use_std=bool(self.dim_mode[2]))

        loss_dict: Dict[str, jnp.ndarray] = {}
        log_dict: Dict[str, jnp.ndarray] = {}

        # ---- heatmap focal loss ----
        hm_loss, num_pos = penalty_reduced_focal_loss(
            predictions["cls"], batch["hm"], self.focal_alpha, self.focal_beta)
        loss_dict["hm_loss"] = w["hm_loss"] * hm_loss / jnp.clip(num_pos, 1.0, None)

        # ---- 2D GIoU ----
        reg2d_losses, ious_2d = iou_loss_2d(pred_reg_2d, target_reg_2d, self.iou_type)
        loss_dict["bbox_loss"] = w["bbox_loss"] * masked_mean(reg2d_losses, mask2d)
        log_dict["2D_IoU"] = masked_mean(ious_2d, mask2d)

        # ---- direct depth (+ uncertainty) ----
        pred_direct_depth = None
        pred_depth_unc = None
        if self.pred_direct_depth:
            pred_depth_offset = poi[:, k2c("depth")][:, 0]
            pred_direct_depth = GJ.decode_depth(
                pred_depth_offset, self.depth_mode, self.depth_ref, self.depth_range)
        if self.depth_with_uncertainty:
            pred_depth_unc = jnp.clip(poi[:, k2c("depth_uncertainty")][:, 0],
                                      self.uncertainty_range[0], self.uncertainty_range[1])
        if self.compute_direct_depth_loss and pred_direct_depth is not None:
            depth_l = w["depth_loss"] * self._depth_fn(pred_direct_depth, target_depth)
            log_dict["depth_loss"] = masked_mean(jax.lax.stop_gradient(depth_l), mask3d)
            if pred_depth_unc is not None:
                depth_l = depth_l * jnp.exp(-pred_depth_unc) + pred_depth_unc * w["depth_loss"]
            loss_dict["depth_loss"] = masked_mean(depth_l, mask3d)
            log_dict["depth_MAE"] = masked_mean(
                jnp.abs(pred_direct_depth - target_depth) / target_depth.clip(1e-6), mask3d)

        # ---- offset (truncated objects split off with a log penalty) ----
        offset_l = self._reg_fn(pred_offset, target_offset).sum(axis=1)
        if self.separate_trunc_offset:
            if self.trunc_offset_loss_type == "log":
                trunc_l = jnp.log1p(offset_l)
            else:
                trunc_l = offset_l
            loss_dict["trunc_offset_loss"] = (
                w["trunc_offset_loss"] * jnp.sum(trunc_l * trunc_mask)
                / jnp.clip(jnp.sum(trunc_mask), 1.0, None))
            loss_dict["offset_loss"] = w["offset_loss"] * masked_mean(
                offset_l, mask3d * (1.0 - trunc_mask))
        else:
            loss_dict["offset_loss"] = w["offset_loss"] * masked_mean(offset_l, mask3d)

        # ---- orientation ----
        loss_dict["orien_loss"] = w["orien_loss"] * multibin_orientation_loss(
            pred_ori, target_ori, mask3d, self.num_bin)

        # ---- dimensions ----
        dims_l = (self._reg_fn(pred_dims, target_dims) * self.dim_weight).sum(axis=1)
        loss_dict["dims_loss"] = w["dims_loss"] * masked_mean(dims_l, mask3d)

        # ---- keypoints + keypoint depths ----
        pred_kpt_depths = None
        pred_corner_unc = None
        if self.compute_keypoint_corner:
            target_kpts = flat(batch["keypoints"], 10, 3)
            kpt_mask = target_kpts[..., 2] * mask3d[:, None]
            pred_kpts = poi[:, k2c("corner_offset")].reshape(N, 10, 2)
            kpt_l = l1(pred_kpts, target_kpts[..., :2]).sum(axis=2) * kpt_mask
            loss_dict["keypoint_loss"] = (w["keypoint_loss"] * jnp.sum(kpt_l)
                                          / jnp.clip(jnp.sum(kpt_mask), 1.0, None))

            pred_kpt_depths = GJ.decode_depth_from_keypoints(
                pred_kpts, pred_dims, calib_params, self.down_ratio, self.depth_range)

            if self.corner_with_uncertainty:
                pred_corner_unc = jnp.clip(poi[:, k2c("corner_uncertainty")],
                                           self.uncertainty_range[0], self.uncertainty_range[1])

            if self.compute_keypoint_depth_loss:
                kd_valid = flat(batch["keypoints_depth_mask"], 3) * mask3d[:, None]
                kd_invalid = (1.0 - flat(batch["keypoints_depth_mask"], 3)) * mask3d[:, None]
                target_kd = jnp.tile(target_depth[:, None], (1, 3))

                wk = w["keypoint_depth_loss"]
                valid_l = wk * self._reg_fn(pred_kpt_depths, target_kd)
                invalid_l = wk * self._reg_fn(jax.lax.stop_gradient(pred_kpt_depths), target_kd)
                log_dict["keypoint_depth_loss"] = (
                    jnp.sum(jax.lax.stop_gradient(valid_l) * kd_valid)
                    / jnp.clip(jnp.sum(kd_valid), 1.0, None))
                if pred_corner_unc is not None:
                    valid_l = valid_l * jnp.exp(-pred_corner_unc) + wk * pred_corner_unc
                    invalid_l = invalid_l * jnp.exp(-pred_corner_unc)
                valid_term = jnp.sum(valid_l * kd_valid) / jnp.clip(jnp.sum(kd_valid), 1.0, None)
                invalid_term = jnp.sum(invalid_l * kd_invalid) / jnp.clip(jnp.sum(kd_invalid), 1.0, None)
                if self.modify_invalid_keypoint_depths:
                    loss_dict["keypoint_depth_loss"] = valid_term + invalid_term
                else:
                    loss_dict["keypoint_depth_loss"] = valid_term

            kpt_mae = (jnp.abs(pred_kpt_depths - target_depth[:, None])
                       / target_depth[:, None].clip(1e-6))
            log_dict["center_MAE"] = masked_mean(kpt_mae[:, 0], mask3d)
            log_dict["02_MAE"] = masked_mean(kpt_mae[:, 1], mask3d)
            log_dict["13_MAE"] = masked_mean(kpt_mae[:, 2], mask3d)

        # ---- depth ensembles for the corner loss + diagnostics ----
        soft_depths = None
        if (self.corner_with_uncertainty and self.pred_direct_depth
                and self.depth_with_uncertainty and pred_kpt_depths is not None):
            combined_depth = jnp.concatenate(
                [pred_direct_depth[:, None], pred_kpt_depths], axis=1)      # (N, 4)
            combined_unc = jnp.exp(jnp.concatenate(
                [pred_depth_unc[:, None], pred_corner_unc], axis=1))
            combined_mae = (jnp.abs(combined_depth - target_depth[:, None])
                            / target_depth[:, None].clip(1e-6))
            log_dict["lower_MAE"] = masked_mean(jnp.min(combined_mae, axis=1), mask3d)
            hard_idx = jnp.argmin(combined_unc, axis=1)
            log_dict["hard_MAE"] = masked_mean(
                jnp.take_along_axis(combined_mae, hard_idx[:, None], axis=1)[:, 0], mask3d)
            weights = 1.0 / combined_unc
            weights = weights / jnp.sum(weights, axis=1, keepdims=True)
            soft_depths = jnp.sum(combined_depth * weights, axis=1)
            log_dict["soft_MAE"] = masked_mean(
                jnp.abs(soft_depths - target_depth) / target_depth.clip(1e-6), mask3d)
            log_dict["mean_MAE"] = masked_mean(
                jnp.abs(combined_depth.mean(axis=1) - target_depth)
                / target_depth.clip(1e-6), mask3d)

        if self.corner_loss_depth == "direct":
            corner_depth = pred_direct_depth
        elif self.corner_loss_depth == "keypoint_mean":
            corner_depth = pred_kpt_depths.mean(axis=1)
        elif self.corner_loss_depth == "soft_combine":
            corner_depth = soft_depths
        elif self.corner_loss_depth == "hard_combine":
            combined_depth = jnp.concatenate([pred_direct_depth[:, None], pred_kpt_depths], axis=1)
            combined_unc = jnp.exp(jnp.concatenate(
                [pred_depth_unc[:, None], pred_corner_unc], axis=1))
            idx = jnp.argmin(combined_unc, axis=1)
            corner_depth = jnp.take_along_axis(combined_depth, idx[:, None], axis=1)[:, 0]
        else:
            raise NotImplementedError(self.corner_loss_depth)

        # ---- 3D box assembly + corner loss ----
        pred_locs = GJ.decode_location(points, pred_offset, corner_depth,
                                       calib_params, pad_size, self.down_ratio)
        pred_rotys, _ = GJ.decode_axes_orientation(pred_ori, pred_locs, self.num_bin)
        pred_corners = GJ.encode_box3d(pred_rotys, pred_dims, pred_locs)

        log_dict["3D_IoU"] = masked_mean(
            jax.lax.stop_gradient(iou_3d_pairs(pred_corners, target_corners)), mask3d)

        if self.compute_corner_loss:
            corner_l = self._reg_fn(pred_corners, target_corners).sum(axis=2)   # (N, 8)
            loss_dict["corner_loss"] = w["corner_loss"] * masked_mean(
                corner_l, jnp.tile(mask3d[:, None], (1, 8)))

        if self.compute_weighted_depth_loss and soft_depths is not None:
            loss_dict["weighted_avg_depth_loss"] = (
                w["weighted_avg_depth_loss"]
                * masked_mean(self._reg_fn(soft_depths, target_depth), mask3d))

        for key, value in loss_dict.items():
            if key not in log_dict:
                log_dict[key] = jax.lax.stop_gradient(value)

        return loss_dict, log_dict
