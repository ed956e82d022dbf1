"""torch DLA-34 (ImageNet `dla34-ba72cf86.pth`) -> flax backbone name map.

The reference initializes its trunk from this checkpoint
(reference: model/backbone/dla_dcn.py:333-344, 60-61).  This module builds
the explicit {torch_name: flax_flat_path} correspondence by walking the DLA
structure (levels [1,1,1,2,2,1]) the same way both module systems create it.

Flax naming facts used (linen auto-names, creation order inside each scope):
  * Tree creates the projection conv FIRST (Conv_0/BatchNorm_0 when present),
    then BasicBlock_0/1 (levels==1) or nested Tree_0/Tree_1, then Root_0.
  * BasicBlock: Conv_0/BatchNorm_0 then Conv_1/BatchNorm_1.
  * DLA: stem Conv_0/BatchNorm_0, ConvBnRelu_0 (level0), ConvBnRelu_1
    (level1), Tree_0..Tree_3 (levels 2-5).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

_LEVELS = (1, 1, 1, 2, 2, 1)
_CHANNELS = (16, 32, 64, 128, 256, 512)


def _conv_bn(torch_conv: str, torch_bn: str, flax_scope: str,
             conv_name: str = "Conv_0", bn_name: str = "BatchNorm_0"):
    """Map one conv + one batchnorm."""
    out = {
        f"{torch_conv}.weight": f"{flax_scope}/{conv_name}/kernel",
        f"{torch_bn}.weight": f"{flax_scope}/{bn_name}/scale",
        f"{torch_bn}.bias": f"{flax_scope}/{bn_name}/bias",
        f"{torch_bn}.running_mean": f"stats:{flax_scope}/{bn_name}/mean",
        f"{torch_bn}.running_var": f"stats:{flax_scope}/{bn_name}/var",
    }
    return out


def _basic_block(torch_prefix: str, flax_scope: str) -> Dict[str, str]:
    m = {}
    m.update(_conv_bn(f"{torch_prefix}.conv1", f"{torch_prefix}.bn1", flax_scope,
                      "Conv_0", "BatchNorm_0"))
    m.update(_conv_bn(f"{torch_prefix}.conv2", f"{torch_prefix}.bn2", flax_scope,
                      "Conv_1", "BatchNorm_1"))
    return m


def _tree(torch_prefix: str, flax_scope: str, levels: int,
          in_ch: int, out_ch: int) -> Dict[str, str]:
    m: Dict[str, str] = {}
    # projection (only when in_ch != out_ch; both systems create it conditionally)
    if in_ch != out_ch:
        m.update(_conv_bn(f"{torch_prefix}.project.0", f"{torch_prefix}.project.1",
                          flax_scope, "Conv_0", "BatchNorm_0"))
    if levels == 1:
        m.update(_basic_block(f"{torch_prefix}.tree1", f"{flax_scope}/BasicBlock_0"))
        m.update(_basic_block(f"{torch_prefix}.tree2", f"{flax_scope}/BasicBlock_1"))
        m.update(_conv_bn(f"{torch_prefix}.root.conv", f"{torch_prefix}.root.bn",
                          f"{flax_scope}/Root_0", "Conv_0", "BatchNorm_0"))
    else:
        m.update(_tree(f"{torch_prefix}.tree1", f"{flax_scope}/Tree_0",
                       levels - 1, in_ch, out_ch))
        m.update(_tree(f"{torch_prefix}.tree2", f"{flax_scope}/Tree_1",
                       levels - 1, out_ch, out_ch))
    return m


def dla34_name_map(base_scope: str = "backbone/base") -> Dict[str, str]:
    """Full map for the trunk. ``base_scope`` is where the DLA module sits in
    the flax tree (build_backbone puts it at backbone/base)."""
    m: Dict[str, str] = {}
    m.update(_conv_bn("base_layer.0", "base_layer.1", base_scope,
                      "Conv_0", "BatchNorm_0"))
    m.update(_conv_bn("level0.0", "level0.1", f"{base_scope}/ConvBnRelu_0"))
    m.update(_conv_bn("level1.0", "level1.1", f"{base_scope}/ConvBnRelu_1"))
    tree_specs: List[Tuple[int, int, int]] = [
        (_LEVELS[2], _CHANNELS[1], _CHANNELS[2]),
        (_LEVELS[3], _CHANNELS[2], _CHANNELS[3]),
        (_LEVELS[4], _CHANNELS[3], _CHANNELS[4]),
        (_LEVELS[5], _CHANNELS[4], _CHANNELS[5]),
    ]
    for i, (levels, in_ch, out_ch) in enumerate(tree_specs):
        m.update(_tree(f"level{i + 2}", f"{base_scope}/Tree_{i}", levels, in_ch, out_ch))
    return m


def import_dla34_backbone(params: Dict, batch_stats: Dict, torch_sd: Dict,
                          base_scope: str = "backbone/base", strict: bool = True):
    """Apply the ImageNet trunk weights onto a freshly initialized model."""
    from .weight_import import align_and_update

    return align_and_update(params, batch_stats, torch_sd,
                            dla34_name_map(base_scope), strict=strict)
