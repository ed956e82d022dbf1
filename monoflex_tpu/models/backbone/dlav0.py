"""Vanilla DLA backbone family ("dlav0"): plain-conv aggregation, deep trunks.

Ground-up flax re-implementation of the reference's alternative backbone file
(reference: model/backbone/dlav0.py) — the pre-DCN DLA family used by early
CenterNet: the same Tree/Root trunk as dla.py but with a pluggable residual
block (BasicBlock / Bottleneck / BottleneckX), and an upsampling neck whose
projection is a 1x1 conv, whose node is a 3x3 conv over a concatenation
(reference: model/backbone/dlav0.py:440-496), and whose upsample is the same
bilinear-initialised depthwise transposed conv.  No deformable convolutions
anywhere — every op is a dense conv, so the whole family runs on the MXU with
no custom kernels.

The reference never wires these into the detector (model/backbone/__init__.py
imports only dla_dcn) but ships ten constructors (dla34 ... dla169,
model/backbone/dlav0.py:320-412) plus a DLASeg head wrapper (:534).  Here the
family is a first-class CONV_BODY choice: ``dlav0`` (= vanilla dla34) or
``dlav0_<name>`` for the deeper trunks.
"""

from __future__ import annotations

import math
from typing import Any, List, Sequence

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .dla import BN_MOMENTUM, BilinearUp, ConvBnRelu, DLA

# name -> (levels, channels, block, residual_root, cardinality)
# (reference: model/backbone/dlav0.py:320-412; Bottleneck.expansion is set to
# 2 by every constructor there, which _make_block mirrors as the default)
DLAV0_FAMILY = {
    "dla34": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512),
              "basic", False, 32),
    "dla46_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256),
                "bottleneck", False, 32),
    "dla46x_c": ((1, 1, 1, 2, 2, 1), (16, 32, 64, 64, 128, 256),
                 "bottleneckx", False, 32),
    "dla60x_c": ((1, 1, 1, 2, 3, 1), (16, 32, 64, 64, 128, 256),
                 "bottleneckx", False, 32),
    "dla60": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
              "bottleneck", False, 32),
    "dla60x": ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneckx", False, 32),
    "dla102": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneck", True, 32),
    "dla102x": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
                "bottleneckx", True, 32),
    "dla102x2": ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024),
                 "bottleneckx", True, 64),
    "dla169": ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024),
               "bottleneck", True, 32),
}


class VanillaIDAUp(nn.Module):
    """Plain-conv iterative deep aggregation (reference:
    model/backbone/dlav0.py:440-496): project each input to ``out_dim`` with
    a 1x1 conv (identity when channels already match), upsample, then merge
    left-to-right with 3x3 "node" convs over the channel concatenation.

    Returns the final merged map plus the per-step merge outputs, which
    VanillaDLAUp feeds back into the pyramid."""

    out_dim: int
    up_factors: Sequence[int]
    node_kernel: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        for i, layer in enumerate(layers):
            if layer.shape[-1] != self.out_dim:
                layer = ConvBnRelu(self.out_dim, kernel=1, dtype=self.dtype,
                                   name=f"proj_{i}")(layer, train=train)
            f = int(self.up_factors[i])
            if f > 1:
                layer = BilinearUp(f, name=f"up_{i}")(layer)
            layers[i] = layer
        x = layers[0]
        merged = []
        for i in range(1, len(layers)):
            x = ConvBnRelu(self.out_dim, kernel=self.node_kernel,
                           dtype=self.dtype, name=f"node_{i}")(
                jnp.concatenate([x, layers[i]], axis=-1), train=train)
            merged.append(x)
        return x, merged


class VanillaDLAUp(nn.Module):
    """Pyramid aggregation for the vanilla family (reference:
    model/backbone/dlav0.py:499-521): repeatedly merge the deepest remaining
    levels upward, rewriting the tail of the pyramid with the merge outputs."""

    channels: Sequence[int]
    scales: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layers: List[jnp.ndarray], train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        in_channels = list(self.channels)
        scales = np.array(self.scales, dtype=int)
        x = layers[-1]
        for i in range(len(layers) - 1):
            j = -i - 2
            ida = VanillaIDAUp(channels[j], (scales[j:] // scales[j]).tolist(),
                               dtype=self.dtype, name=f"ida_{i}")
            x, merged = ida(layers[j:], train=train)
            layers[-i - 1:] = merged
            scales[j + 1:] = scales[j]
            in_channels[j + 1:] = [channels[j]] * len(in_channels[j + 1:])
        return x


class DLAV0Seg(nn.Module):
    """Backbone entry for the vanilla family: deep-block DLA trunk ->
    plain-conv DLAUp -> one stride-``down_ratio`` feature map (reference:
    model/backbone/dlav0.py:534-585, minus the per-task heads which live in
    models/heads/predictor.py here)."""

    base_name: str = "dla34"
    down_ratio: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> jnp.ndarray:
        levels, channels, block, residual_root, cardinality = \
            DLAV0_FAMILY[self.base_name]
        first_level = int(math.log2(self.down_ratio))
        feats = DLA(levels, channels, residual_root=residual_root,
                    block=block, cardinality=cardinality, dtype=self.dtype,
                    name="base")(x, train)
        feats = [f.astype(self.dtype) for f in feats]
        ch = list(channels[first_level:])
        scales = [2 ** i for i in range(len(ch))]
        return VanillaDLAUp(ch, scales, dtype=self.dtype,
                            name="dla_up")(feats[first_level:], train=train)
