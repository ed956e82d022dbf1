"""Full reference-checkpoint -> flax name map (trunk + DCN neck + heads).

Extends the DLA-34 trunk map (dla34_import.py) to the whole MonoFlex model so
a reference training checkpoint (torch state dict with ``backbone.*`` /
``heads.predictor.*`` keys, reference: model/detector.py:11-38,
model/backbone/dla_dcn.py:399-452, model/head/detector_predictor.py:20-119)
can initialize this model for decode-parity evaluation.

Structural facts mirrored from both module systems:
  * reference IDAUp children: proj_j/node_j = DeformConv{conv: DCN(+ its
    conv_offset_mask), actf: [BN, ReLU]}, up_j = depthwise ConvTranspose2d.
  * our DeformConvBlock: DCN_0 {Conv_0 (offset/mask conv), kernel, bias} +
    BatchNorm_0; BilinearUp: kernel.
  * reference DLAUp ida_i slices shrink (2, 3, 4 entries); ours mirrors.
  * heads: class_head [conv3x3, norm, conv1x1]; reg_features[i] + reg_heads
    [i][j]; trunc_{heatmap,offset}_conv [conv1d, norm, (relu), conv1d].
"""

from __future__ import annotations

from typing import Dict, List

from .dla34_import import _conv_bn, dla34_name_map


def _deform_conv(torch_prefix: str, flax_scope: str) -> Dict[str, str]:
    """reference DeformConv (DCN + BN) -> our DeformConvBlock."""
    m = {
        # the deformable conv's own weight/bias
        f"{torch_prefix}.conv.weight": f"{flax_scope}/DCN_0/kernel",
        f"{torch_prefix}.conv.bias": f"{flax_scope}/DCN_0/bias",
        # the offset/mask-producing regular conv
        f"{torch_prefix}.conv.conv_offset_mask.weight": f"{flax_scope}/DCN_0/Conv_0/kernel",
        f"{torch_prefix}.conv.conv_offset_mask.bias": f"{flax_scope}/DCN_0/Conv_0/bias",
        # actf = Sequential(BN, ReLU)
        f"{torch_prefix}.actf.0.weight": f"{flax_scope}/BatchNorm_0/scale",
        f"{torch_prefix}.actf.0.bias": f"{flax_scope}/BatchNorm_0/bias",
        f"{torch_prefix}.actf.0.running_mean": f"stats:{flax_scope}/BatchNorm_0/mean",
        f"{torch_prefix}.actf.0.running_var": f"stats:{flax_scope}/BatchNorm_0/var",
    }
    return m


def _ida_up(torch_prefix: str, flax_scope: str, n_layers: int) -> Dict[str, str]:
    m: Dict[str, str] = {}
    for j in range(1, n_layers):
        m.update(_deform_conv(f"{torch_prefix}.proj_{j}", f"{flax_scope}/proj_{j}"))
        m.update(_deform_conv(f"{torch_prefix}.node_{j}", f"{flax_scope}/node_{j}"))
        m[f"{torch_prefix}.up_{j}.weight"] = f"{flax_scope}/up_{j}/kernel"
    return m


def _conv1d_stack(torch_prefix: str, flax_scope: str, use_bn: bool = True
                  ) -> Dict[str, str]:
    """reference Sequential[conv1d, norm, act, conv1d] -> our Conv1DStack."""
    m = {
        f"{torch_prefix}.0.weight": f"{flax_scope}/Conv_0/kernel",
        f"{torch_prefix}.0.bias": f"{flax_scope}/Conv_0/bias",
        f"{torch_prefix}.3.weight": f"{flax_scope}/Conv_1/kernel",
        f"{torch_prefix}.3.bias": f"{flax_scope}/Conv_1/bias",
    }
    if use_bn:
        m.update({
            f"{torch_prefix}.1.weight": f"{flax_scope}/BatchNorm_0/scale",
            f"{torch_prefix}.1.bias": f"{flax_scope}/BatchNorm_0/bias",
            f"{torch_prefix}.1.running_mean": f"stats:{flax_scope}/BatchNorm_0/mean",
            f"{torch_prefix}.1.running_var": f"stats:{flax_scope}/BatchNorm_0/var",
        })
    return m


def monoflex_name_map(cfg) -> Dict[str, str]:
    m: Dict[str, str] = {}

    # ---- trunk ----
    m.update({f"backbone.base.{k}": v
              for k, v in dla34_name_map("backbone/base").items()})

    # ---- DLAUp: ida_0 over 2 layers, ida_1 over 3, ida_2 over 4 ----
    for i, n_layers in enumerate((2, 3, 4)):
        m.update(_ida_up(f"backbone.dla_up.ida_{i}",
                         f"backbone/dla_up/ida_{i}", n_layers))
    # ---- final IDAUp over 3 layers ----
    m.update(_ida_up("backbone.ida_up", "backbone/ida_up", 3))

    # ---- heads ----
    p = "heads.predictor"
    m.update(_conv_bn(f"{p}.class_head.0", f"{p}.class_head.1",
                      "predictor/class_tower"))
    # reference stores the BN of class_head at index 1 (conv has no bias);
    # final 1x1 conv at index 2 (or after InPlaceABN, same index)
    m[f"{p}.class_head.2.weight"] = "predictor/class_out/kernel"
    m[f"{p}.class_head.2.bias"] = "predictor/class_out/bias"

    for gi, group in enumerate(cfg.MODEL.HEAD.REGRESSION_HEADS):
        m.update(_conv_bn(f"{p}.reg_features.{gi}.0", f"{p}.reg_features.{gi}.1",
                          f"predictor/reg_tower_{gi}"))
        for ki, key in enumerate(group):
            m[f"{p}.reg_heads.{gi}.{ki}.weight"] = f"predictor/reg_out_{key}/kernel"
            m[f"{p}.reg_heads.{gi}.{ki}.bias"] = f"predictor/reg_out_{key}/bias"

    if cfg.MODEL.HEAD.ENABLE_EDGE_FUSION:
        use_bn = cfg.MODEL.HEAD.EDGE_FUSION_NORM == "BN"
        m.update(_conv1d_stack(f"{p}.trunc_heatmap_conv",
                               "predictor/trunc_heatmap_conv", use_bn))
        m.update(_conv1d_stack(f"{p}.trunc_offset_conv",
                               "predictor/trunc_offset_conv", use_bn))
    return m


def import_monoflex_checkpoint(params: Dict, batch_stats: Dict,
                               torch_sd: Dict, cfg, strict: bool = False):
    """Load a reference checkpoint's weights into this model's trees."""
    from .weight_import import align_and_update

    # the reference saves under 'model'; keys may carry a 'module.' DDP prefix
    torch_sd = {k[len("module."):] if k.startswith("module.") else k: v
                for k, v in torch_sd.items()}
    return align_and_update(params, batch_stats, torch_sd,
                            monoflex_name_map(cfg), strict=strict)
