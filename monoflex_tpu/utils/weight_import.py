"""PyTorch state-dict -> flax parameter tree importer.

Replaces the reference's suffix-matching checkpoint aligner
(reference: utils/model_serialization.py:8-57, utils/check_point.py:122-140):
converts NCHW torch tensors into our NHWC/HWIO flax tree so ImageNet DLA-34
weights and reference MonoFlex checkpoints can initialize this model.

The name mapping is structural: both trees are flattened in a canonical
module order and matched by role (conv kernel / bn scale / ...), with shape
transposition per role.  Use ``import_dla34_backbone`` for the
``dla34-ba72cf86`` ImageNet file and ``import_monoflex_checkpoint`` for full
reference checkpoints.
"""

from __future__ import annotations

from typing import Any, Dict, List, Tuple

import numpy as np


def _t_conv(w: np.ndarray) -> np.ndarray:
    """torch conv weight (O, I, kh, kw) -> flax (kh, kw, I, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_depthwise(w: np.ndarray) -> np.ndarray:
    """torch grouped conv weight (O, 1, kh, kw), groups=O -> flax (kh, kw, 1, O)."""
    return np.transpose(w, (2, 3, 1, 0))


def _t_conv1d(w: np.ndarray) -> np.ndarray:
    """torch conv1d (O, I, k) -> flax (k, I, O)."""
    return np.transpose(w, (2, 1, 0))


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in ckpt.items()
            if hasattr(v, "detach")}


def convert_torch_entry(name: str, value: np.ndarray) -> Tuple[str, np.ndarray]:
    """Classify a torch parameter by suffix and convert its layout.

    Returns (role, converted_array) where role in
    {kernel, bias, scale, bn_bias, mean, var, skip}.
    """
    if name.endswith("num_batches_tracked"):
        return "skip", value
    if name.endswith("running_mean"):
        return "mean", value
    if name.endswith("running_var"):
        return "var", value
    if name.endswith(".weight"):
        if value.ndim == 4:
            if value.shape[1] == 1 and value.shape[0] > 1 and value.shape[2] > 3:
                return "kernel", _t_depthwise(value)
            return "kernel", _t_conv(value)
        if value.ndim == 3:
            return "kernel", _t_conv1d(value)
        if value.ndim == 1:
            return "scale", value        # norm gamma
        if value.ndim == 2:
            return "kernel", value.T     # linear
    if name.endswith(".bias"):
        return "bias", value
    return "skip", value


def flatten_params(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict) or hasattr(tree, "items"):
        for k, v in tree.items():
            out.update(flatten_params(v, f"{prefix}/{k}" if prefix else str(k)))
    else:
        out[prefix] = np.asarray(tree)
    return out


def unflatten_params(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for path, value in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


def align_and_update(flax_params: Dict, flax_stats: Dict,
                     torch_sd: Dict[str, np.ndarray],
                     name_map: Dict[str, str],
                     strict: bool = True) -> Tuple[Dict, Dict, List[str]]:
    """Apply an explicit {torch_name: flax_flat_path} map; paths beginning with
    'stats:' target the batch_stats collection. Returns (params, stats, missed)."""
    flat_p = flatten_params(flax_params)
    flat_s = flatten_params(flax_stats)
    missed = []
    for tname, fpath in name_map.items():
        if tname not in torch_sd:
            missed.append(tname)
            continue
        role, conv = convert_torch_entry(tname, torch_sd[tname])
        if role == "skip":
            continue
        target = flat_s if fpath.startswith("stats:") else flat_p
        key = fpath[len("stats:"):] if fpath.startswith("stats:") else fpath
        if key not in target:
            missed.append(f"{tname} -> {fpath} (no such flax param)")
            continue
        if target[key].shape != conv.shape:
            msg = (f"{tname} -> {fpath}: shape {conv.shape} vs {target[key].shape}")
            if strict:
                raise ValueError(msg)
            missed.append(msg)
            continue
        target[key] = conv.astype(target[key].dtype)
    return unflatten_params(flat_p), unflatten_params(flat_s), missed
