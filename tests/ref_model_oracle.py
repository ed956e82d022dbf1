"""TEST-ONLY executable oracle for the FULL reference network.

Loads the reference repository's KeypointDetector (torch, CPU) from
/root/reference and RUNS it, so the weight importers
(utils/monoflex_import.py, utils/dla34_import.py) can be validated
end-to-end: a name-map transposition or layout bug that per-op goldens miss
shows up as a feature-map / head-output mismatch (VERDICT r4 missing #2).

The reference's DCNv2 extension (`_ext`) is CUDA/C++; here it is stubbed
with a pure-torch modulated deformable conv implementing the exact
semantics of the reference's CPU mirror
(reference: model/backbone/DCNv2/src/cpu/dcn_v2_im2col_cpu.cpp:154-199:
h_im = h_in + i*dilation + offset_h, bilinear with zero outside, mask
modulation, then a plain GEMM).  InPlaceABN is stubbed as
BatchNorm2d + leaky_relu — the same deviation the framework documents
(docs/PARITY.md): in eval mode ABN is exactly BN followed by its
activation.  Nothing here ships in the framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np
import torch
import torch.nn.functional as F

from ref_decode_oracle import REF, _stub


def torch_dcn_v2_forward(input, weight, bias, offset, mask,
                         kh, kw, sh, sw, ph, pw, dh, dw, deformable_groups):
    """Pure-torch DCNv2 forward, reference CPU-kernel semantics.

    input (B,C,H,W); offset (B,2K,Ho,Wo) with channel 2k = dy_k and
    2k+1 = dx_k; mask (B,K,Ho,Wo); weight (Co,C,kh,kw).
    """
    assert deformable_groups == 1
    B, C, H, W = input.shape
    Co = weight.shape[0]
    Ho = (H + 2 * ph - (dh * (kh - 1) + 1)) // sh + 1
    Wo = (W + 2 * pw - (dw * (kw - 1) + 1)) // sw + 1
    K = kh * kw

    # base sampling positions per output pixel and tap
    ys0 = (torch.arange(Ho, dtype=torch.float32) * sh - ph)
    xs0 = (torch.arange(Wo, dtype=torch.float32) * sw - pw)
    ky = (torch.arange(kh, dtype=torch.float32) * dh)
    kx = (torch.arange(kw, dtype=torch.float32) * dw)
    base_y = ys0.view(1, Ho, 1) + ky.repeat_interleave(kw).view(K, 1, 1)
    base_x = xs0.view(1, 1, Wo) + kx.repeat(kh).view(K, 1, 1)

    h_im = base_y.unsqueeze(0) + offset[:, 0::2]          # (B,K,Ho,Wo)
    w_im = base_x.unsqueeze(0) + offset[:, 1::2]

    # bilinear gather with zero padding outside, per-corner masking
    # (equivalent to dmcn_im2col_bilinear_cpu's corner guards)
    imf = input.reshape(B, C, H * W)
    h0 = torch.floor(h_im)
    w0 = torch.floor(w_im)
    val = torch.zeros(B, C, K, Ho, Wo, dtype=input.dtype)
    for dy in (0, 1):
        for dx in (0, 1):
            hh = h0 + dy
            ww = w0 + dx
            wgt = (1 - (h_im - hh).abs()) * (1 - (w_im - ww).abs())
            inb = ((hh >= 0) & (hh <= H - 1) & (ww >= 0) & (ww <= W - 1))
            idx = (hh.clamp(0, H - 1) * W + ww.clamp(0, W - 1)).long()
            g = torch.gather(imf, 2, idx.view(B, 1, -1).expand(B, C, -1))
            val += (g.view(B, C, K, Ho, Wo) *
                    (wgt * inb.to(input.dtype)).unsqueeze(1))
    val = val * mask.unsqueeze(1)                          # (B,C,K,Ho,Wo)

    out = torch.einsum("bckhw,ock->bohw",
                       val.reshape(B, C, K, Ho * Wo).view(B, C, K, Ho, Wo),
                       weight.reshape(Co, C, K))
    return out + bias.view(1, Co, 1, 1)


class _ABNStub(torch.nn.BatchNorm2d):
    """InPlaceABN == BN + activation in eval mode (state-dict compatible)."""

    def __init__(self, num_features, eps=1e-5, momentum=0.1, affine=True,
                 activation="leaky_relu", activation_param=0.01, **kw):
        super().__init__(num_features, eps=eps, momentum=momentum,
                         affine=affine)
        self.activation = activation
        self.slope = activation_param

    def forward(self, x):
        x = super().forward(x)
        if self.activation == "leaky_relu":
            return F.leaky_relu(x, self.slope)
        if self.activation == "identity":
            return x
        raise NotImplementedError(self.activation)


def load_reference_detector(run_yaml: str, input_height: int,
                            input_width: int):
    """Build the reference KeypointDetector on CPU (random init, eval mode).

    Returns (ref_cfg, model).  PRETRAIN is disabled (zero egress).
    """
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # the decode-oracle shim installs yacs/shapely/torchvision/numba stubs
    # and loads the reference cfg tree
    from ref_decode_oracle import load_reference_postprocessor

    ref_cfg, _, _, _ = load_reference_postprocessor(run_yaml)

    # DCNv2's python wrapper does `import _ext` at module import
    _stub("_ext", dcn_v2_forward=torch_dcn_v2_forward)
    inplace_abn = _stub("inplace_abn", InPlaceABN=_ABNStub)
    sys.modules.setdefault("inplace_abn.abn", types.ModuleType("abn"))
    inplace_abn.ABN = _ABNStub

    ref_cfg.defrost()
    ref_cfg.MODEL.PRETRAIN = False
    ref_cfg.MODEL.DEVICE = "cpu"
    ref_cfg.INPUT.HEIGHT_TRAIN = input_height
    ref_cfg.INPUT.WIDTH_TRAIN = input_width
    ref_cfg.INPUT.HEIGHT_TEST = input_height
    ref_cfg.INPUT.WIDTH_TEST = input_width
    ref_cfg.freeze()

    from model.detector import KeypointDetector

    torch.manual_seed(0)
    model = KeypointDetector(ref_cfg)
    model.eval()
    return ref_cfg, model


def randomize_reference_model(model, seed: int = 0):
    """Perturb the random init so the golden actually discriminates.

    - offset/mask convs are zero-initialised by design; give them small
      weights so the deformable sampling is exercised (|offset| << R so the
      bounded TPU kernels and the exact gather agree with the reference).
    - BN running stats are (0, 1) at init; randomise so a swapped
      mean/var or scale/bias mapping cannot cancel out.
    """
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, mod in model.named_modules():
            if name.endswith("conv_offset_mask"):
                mod.weight.normal_(0, 0.01, generator=g)
                mod.bias.normal_(0, 0.05, generator=g)
            if isinstance(mod, torch.nn.modules.batchnorm._BatchNorm):
                mod.running_mean.normal_(0, 0.05, generator=g)
                mod.running_var.uniform_(0.8, 1.3, generator=g)
    return model


def make_edge_targets(edge_indices: np.ndarray, edge_len: np.ndarray):
    """Minimal target objects exposing the two fields the predictor reads."""

    class _T:
        def __init__(self, idx, n):
            self._f = {"edge_indices": torch.as_tensor(idx, dtype=torch.long),
                       "edge_len": torch.as_tensor(n, dtype=torch.long)}

        def get_field(self, k):
            return self._f[k]

    return [_T(edge_indices[b], edge_len[b])
            for b in range(edge_indices.shape[0])]
