"""TEST-ONLY import shim for the reference decode path.

Loads the reference repository's PostProcessor (torch, CPU) from
/root/reference as an executable oracle for decode golden-parity tests
(tests/test_decode_parity.py).  Missing heavyweight deps (yacs, shapely,
torchvision, numba) are stubbed — none of their functionality is exercised by
the decode path under test.  Nothing here ships in the framework.
"""

from __future__ import annotations

import os
import sys
import types

REF = "/root/reference"


def _stub(name, **attrs):
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def load_reference_postprocessor(run_yaml: str):
    """Returns (cfg, make_post_processor, ParamsList, Calibration) from the
    reference tree, configured for CPU."""
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # yacs -> our API-compatible CfgNode
    from monoflex_tpu.config.node import CfgNode

    yacs = _stub("yacs")
    yacs_config = _stub("yacs.config", CfgNode=CfgNode)
    yacs.config = yacs_config

    # shapely: only get_iou3d uses Polygon (not exercised here)
    shapely = _stub("shapely")
    shapely_geom = _stub("shapely.geometry", Polygon=None)
    shapely.geometry = shapely_geom

    # torchvision: anno_encoder imports roi_align at module top (used only by
    # the uncertainty-eval diagnostics, not decode)
    tv = _stub("torchvision")
    tv_ops = _stub("torchvision.ops", roi_align=None)
    tv.ops = tv_ops
    # `import torchvision.ops.roi_align as roi_align` needs a submodule
    tv_roi = _stub("torchvision.ops.roi_align", roi_align=None)
    tv_ops.roi_align = tv_roi
    tv_functional = _stub("torchvision.transforms.functional")
    tv_transforms = _stub("torchvision.transforms", functional=tv_functional)
    tv.transforms = tv_transforms

    # numba: evaluation modules jit-decorate at import
    def _jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]
        return lambda f: f

    numba = _stub("numba", jit=_jit, njit=_jit, float32=None, int32=None)
    numba.cuda = _stub("numba.cuda", jit=_jit, local=None, shared=None)

    # skimage: heatmap_coder uses transform.estimate_transform (dataset-side
    # affine helper, not decode)
    skimage = _stub("skimage")
    skimage.transform = _stub("skimage.transform", estimate_transform=None)

    # reference utils/visualizer (detectron2 copy) pulls several extras
    pycoco = _stub("pycocotools")
    pycoco.mask = _stub("pycocotools.mask")
    iopath = _stub("iopath")
    iopath.common = _stub("iopath.common")
    iopath.common.file_io = _stub("iopath.common.file_io", PathManager=object)

    from config import cfg as ref_cfg  # reference global config

    ref_cfg.merge_from_file(run_yaml)
    ref_cfg.MODEL.DEVICE = "cpu"

    import model.head.detector_infer as ref_infer
    from structures.params_3d import ParamsList
    from data.datasets.kitti_utils import Calibration

    # The reference's select_topk was written for torch 1.4 + CUDA: it
    # asserts torch.cuda.FloatTensor and relies on 1.4's `/` on int tensors
    # being floor division (torch 2.x made it true division).  Reproduce the
    # 1.4 semantics faithfully for CPU (reference model/layers/utils.py:61-100).
    import torch

    def select_topk_14(heat_map, K=100):
        from model.layers.utils import _gather_feat

        batch, cls, height, width = heat_map.size()
        heat_map = heat_map.view(batch, cls, -1)
        topk_scores_all, topk_inds_all = torch.topk(heat_map, K)
        topk_ys = torch.div(topk_inds_all, width,
                            rounding_mode="floor").float()
        topk_xs = (topk_inds_all % width).float()
        topk_scores_all = topk_scores_all.view(batch, -1)
        topk_scores, topk_inds = torch.topk(topk_scores_all, K)
        topk_clses = torch.div(topk_inds, K, rounding_mode="floor").float()
        topk_inds_all = _gather_feat(
            topk_inds_all.view(batch, -1, 1), topk_inds).view(batch, K)
        topk_ys = _gather_feat(topk_ys.view(batch, -1, 1), topk_inds).view(batch, K)
        topk_xs = _gather_feat(topk_xs.view(batch, -1, 1), topk_inds).view(batch, K)
        return topk_scores, topk_inds_all, topk_clses, topk_ys, topk_xs

    ref_infer.select_topk = select_topk_14

    return ref_cfg, ref_infer.make_post_processor, ParamsList, Calibration


def make_ref_targets(ParamsList, Calibration, calib_file: str, img_size,
                     pad_size, n: int):
    import torch

    targets = []
    for _ in range(n):
        t = ParamsList(image_size=img_size, is_train=False)
        t.add_field("calib", Calibration(calib_file))
        t.add_field("pad_size", torch.tensor(pad_size, dtype=torch.float32))
        targets.append(t)
    return targets
