"""Multi-head prediction tower with edge-feature fusion.

Re-design of the reference predictor (reference:
model/head/detector_predictor.py:20-165): a class tower plus N regression
towers whose topology is config data (REGRESSION_HEADS / REGRESSION_CHANNELS
-> channel slices, see key2channel.py).  All outputs concatenate into one
(B, H, W, C_total) map so downstream gathers touch a single tensor.

Edge fusion: features from the class tower and the offset tower are gathered
along the precomputed image-boundary pixel chain (an exact gather - the
reference's grid_sample at integer coords), passed through 1-D conv stacks,
and added back onto the boundary pixels of the heatmap / offset channels
(reference: model/head/detector_predictor.py:107-158).  Fixed max chain
length + a validity mask keep shapes static for XLA.

The reference's InPlaceABN is a GPU memory trick; BN + LeakyReLU here, which
XLA fuses into the convs anyway (reference: model/head/detector_predictor.py:17,50).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Sequence

import jax.numpy as jnp
from flax import linen as nn

from ...ops.image_ops import gather_edge_features, scatter_add_edge, sigmoid_hm
from .key2channel import Key2Channel

BN_MOMENTUM = 0.9


class TowerBlock(nn.Module):
    """3x3 conv -> norm -> activation, the shared stem of every head."""

    features: int
    norm: str = "BN"          # BN | GN | none
    leaky: bool = False       # InPlaceABN used leaky_relu(0.01)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=self.dtype)(x.astype(self.dtype))
        if self.norm == "BN":
            x = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=1e-5, dtype=self.dtype)(x)
        elif self.norm == "GN":
            x = nn.GroupNorm(num_groups=32, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.01) if self.leaky else nn.relu(x)


class Conv1DStack(nn.Module):
    """k-tap 1-D conv (replicate padded) -> [BN] -> [ReLU] -> 1x1 conv, applied
    along the boundary chain (reference: model/head/detector_predictor.py:111-119)."""

    hidden: int
    out_features: int
    kernel: int = 3
    use_bn: bool = True
    use_relu: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        # x: (B, E, C); replicate-pad the sequence dim
        pad = self.kernel // 2
        xp = jnp.concatenate([
            jnp.repeat(x[:, :1], pad, axis=1), x, jnp.repeat(x[:, -1:], pad, axis=1)
        ], axis=1)
        y = nn.Conv(self.hidden, (self.kernel,), padding="VALID")(xp)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                             epsilon=1e-5)(y)
        if self.use_relu:
            y = nn.relu(y)
        return nn.Conv(self.out_features, (1,))(y)


def _final_bias_init(prior_prob: float):
    b = -math.log(1.0 / prior_prob - 1.0)

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, b, dtype)

    return init


def _uncertainty_kernel_init(key, shape, dtype=jnp.float32):
    """Xavier-normal with gain 0.01 so uncertainty heads start near zero
    (reference: model/head/detector_predictor.py:87-88)."""
    fan_in = shape[0] * shape[1] * shape[2]
    fan_out = shape[0] * shape[1] * shape[3]
    std = 0.01 * math.sqrt(2.0 / (fan_in + fan_out))
    return std * nn.initializers.normal(stddev=1.0)(key, shape, dtype)


class Predictor(nn.Module):
    """cls tower + per-group regression towers + edge fusion."""

    num_classes: int
    head_conv: int
    regression_heads: Sequence[Sequence[str]]
    regression_channels: Sequence[Sequence[int]]
    norm: str = "BN"
    leaky: bool = True                 # parity with InPlaceABN(leaky_relu)
    init_p: float = 0.01
    uncertainty_init: bool = True
    enable_edge_fusion: bool = True
    edge_kernel_size: int = 3
    edge_fusion_norm: str = "BN"
    edge_fusion_relu: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, features: jnp.ndarray, edge_indices: jnp.ndarray | None = None,
                 edge_len: jnp.ndarray | None = None, train: bool = False
                 ) -> Dict[str, jnp.ndarray]:
        k2c = Key2Channel(self.regression_heads, self.regression_channels)

        # ---- class tower ----
        feat_cls = TowerBlock(self.head_conv, self.norm, self.leaky,
                              dtype=self.dtype,
                              name="class_tower")(features, train=train)
        out_cls = nn.Conv(self.num_classes, (1, 1),
                          bias_init=_final_bias_init(self.init_p),
                          name="class_out")(feat_cls.astype(jnp.float32))

        # ---- regression towers ----
        reg_outputs: List[jnp.ndarray] = []
        offset_feature = None
        offset_out_index = None
        for gi, group in enumerate(self.regression_heads):
            feat = TowerBlock(self.head_conv, self.norm, self.leaky,
                              dtype=self.dtype,
                              name=f"reg_tower_{gi}")(features, train=train)
            feat = feat.astype(jnp.float32)
            for ki, key in enumerate(group):
                ch = self.regression_channels[gi][ki]
                kernel_init = (_uncertainty_kernel_init
                               if ("uncertainty" in key and self.uncertainty_init)
                               else nn.initializers.lecun_normal())
                out = nn.Conv(ch, (1, 1), kernel_init=kernel_init,
                              name=f"reg_out_{key}")(feat)
                if key == "3d_offset":
                    offset_feature = feat
                    offset_out_index = len(reg_outputs)
                reg_outputs.append(out)

        # ---- edge fusion on heatmap + 3d_offset ----
        if self.enable_edge_fusion and edge_indices is not None and offset_feature is not None:
            # gather each tower map and concat at (B, E, 2H): a dense
            # concat of the two (B,H,W,256) maps forced a 0.74 ms/iter
            # relayout copy on TPU before the gather could consume it
            edge_feat = gather_edge_features((feat_cls, offset_feature),
                                             edge_indices)                 # (B,E,2H)
            edge_cls_feat = edge_feat[..., : self.head_conv]
            edge_off_feat = edge_feat[..., self.head_conv:]
            edge_cls_out = Conv1DStack(self.head_conv, self.num_classes,
                                       self.edge_kernel_size,
                                       use_bn=self.edge_fusion_norm == "BN",
                                       use_relu=self.edge_fusion_relu,
                                       name="trunc_heatmap_conv")(edge_cls_feat, train=train)
            edge_off_out = Conv1DStack(self.head_conv, 2, self.edge_kernel_size,
                                       use_bn=self.edge_fusion_norm == "BN",
                                       use_relu=self.edge_fusion_relu,
                                       name="trunc_offset_conv")(edge_off_feat, train=train)
            out_cls = scatter_add_edge(out_cls, edge_indices, edge_cls_out, edge_len)
            reg_outputs[offset_out_index] = scatter_add_edge(
                reg_outputs[offset_out_index], edge_indices, edge_off_out, edge_len)

        # Per-head maps, NOT concatenated: every consumer point-gathers, and
        # gathering each head then concatenating at (B, K, sum C) avoids the
        # dense (B, H, W, 50) concat + layout copies (~2.1 ms/iter on TPU).
        # Channel order matches Key2Channel (reg_outputs appended in
        # REGRESSION_HEADS group order).
        return {
            "cls": sigmoid_hm(out_cls),
            "reg": tuple(reg_outputs),
        }


def build_predictor(cfg) -> Predictor:
    dtype = jnp.bfloat16 if cfg.TPU.COMPUTE_DTYPE == "bfloat16" else jnp.float32
    return Predictor(
        dtype=dtype,
        num_classes=len(cfg.DATASETS.DETECT_CLASSES),
        head_conv=cfg.MODEL.HEAD.NUM_CHANNEL,
        regression_heads=tuple(tuple(g) for g in cfg.MODEL.HEAD.REGRESSION_HEADS),
        regression_channels=tuple(tuple(g) for g in cfg.MODEL.HEAD.REGRESSION_CHANNELS),
        norm=cfg.MODEL.HEAD.USE_NORMALIZATION,
        leaky=bool(cfg.MODEL.INPLACE_ABN),
        init_p=cfg.MODEL.HEAD.INIT_P,
        uncertainty_init=cfg.MODEL.HEAD.UNCERTAINTY_INIT,
        enable_edge_fusion=cfg.MODEL.HEAD.ENABLE_EDGE_FUSION,
        edge_kernel_size=cfg.MODEL.HEAD.EDGE_FUSION_KERNEL_SIZE,
        edge_fusion_norm=cfg.MODEL.HEAD.EDGE_FUSION_NORM,
        edge_fusion_relu=cfg.MODEL.HEAD.EDGE_FUSION_RELU,
    )
