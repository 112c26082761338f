"""Import PyTorch ``.pth`` checkpoints into framework param/state trees.

Re-creates the tolerant loader contract of ``load_state_safely`` (reference
app.py:257-274): tries the ``generator`` / ``state_dict`` / ``G`` keys, strips
``module.`` (DDP) prefixes, loads non-strictly with warn-and-continue, then
performs the layout translation torch → TPU-native:

    Conv2d.weight          (O, I, kH, kW) → kernel (kH, kW, I, O)
    ConvTranspose2d.weight (I, O, kH, kW) → kernel (kH, kW, O, I)
    Linear.weight          (O, I)         → kernel (I, O)
    BatchNorm2d weight/bias/running_mean/running_var
                           → params {scale, bias} + state {mean, var}
    PReLU.weight           → alpha;  Embedding.weight → table

torch itself is an optional host-side dependency used only to deserialize
the pickle; the conversion is pure numpy.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

from celebrity_image_denoiser_tpu import nn
from celebrity_image_denoiser_tpu.nn.module import Module
from celebrity_image_denoiser_tpu.utils import tree as treelib
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.ckpt.torch")


def _leaf_layers(module: Module, prefix: str = ""):
    """Yield (dotted_path, leaf_layer) over the module tree, paths matching
    torch state_dict naming (Sequential children are numeric indices)."""
    if module.children:
        for name, child in module.children.items():
            path = f"{prefix}.{name}" if prefix else name
            yield from _leaf_layers(child, path)
    else:
        yield prefix, module


def _convert_leaf(layer: Module, path: str, sd: Dict[str, np.ndarray]):
    """Returns (params_flat, state_flat) contributions for one leaf layer."""
    p: Dict[str, np.ndarray] = {}
    s: Dict[str, np.ndarray] = {}

    def get(suffix: str):
        return sd.get(f"{path}.{suffix}" if path else suffix)

    if isinstance(layer, nn.Conv2d):
        w = get("weight")
        if w is not None:
            p[f"{path}.kernel"] = np.transpose(w, (2, 3, 1, 0))
        b = get("bias")
        if b is not None:
            p[f"{path}.bias"] = b
    elif isinstance(layer, nn.ConvTranspose2d):
        w = get("weight")
        if w is not None:
            p[f"{path}.kernel"] = np.transpose(w, (2, 3, 1, 0))
        b = get("bias")
        if b is not None:
            p[f"{path}.bias"] = b
    elif isinstance(layer, nn.Linear):
        w = get("weight")
        if w is not None:
            p[f"{path}.kernel"] = np.transpose(w, (1, 0))
        b = get("bias")
        if b is not None:
            p[f"{path}.bias"] = b
    elif isinstance(layer, nn.BatchNorm2d):
        for src, dst, tgt in [
            ("weight", "scale", p),
            ("bias", "bias", p),
            ("running_mean", "mean", s),
            ("running_var", "var", s),
        ]:
            v = get(src)
            if v is not None:
                tgt[f"{path}.{dst}"] = v
    elif isinstance(layer, nn.PReLU):
        w = get("weight")
        if w is not None:
            p[f"{path}.alpha"] = w
    elif isinstance(layer, nn.Embedding):
        w = get("weight")
        if w is not None:
            p[f"{path}.table"] = w
    return p, s


def import_torch_state_dict(
    module: Module,
    state_dict: Dict[str, Any],
    params: Dict[str, Any],
    state: Dict[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Overlay a torch state_dict onto existing (params, state) trees.

    Non-strict like the reference loader: keys present in the state_dict but
    absent from the module (or vice versa) are logged and skipped.
    """
    sd = {
        (k[len("module."):] if isinstance(k, str) and k.startswith("module.") else k):
        np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)
        for k, v in state_dict.items()
    }
    flat_p = treelib.flatten(params)
    flat_s = treelib.flatten(state)
    consumed = set()
    for path, layer in _leaf_layers(module):
        pc, sc = _convert_leaf(layer, path, sd)
        for k, v in pc.items():
            if k in flat_p:
                if flat_p[k].shape != v.shape:
                    msg = f"shape mismatch for {k}: ours {flat_p[k].shape} vs torch {v.shape}"
                    if strict:
                        raise ValueError(msg)
                    logger.warning(msg)
                    continue
                flat_p[k] = v.astype(np.float32)
                consumed.add(k)
            elif strict:
                raise KeyError(f"unexpected param {k}")
        for k, v in sc.items():
            if k in flat_s:
                flat_s[k] = v.astype(np.float32)
                consumed.add(k)
    missing = set(flat_p) - consumed
    if missing:
        logger.info("params kept at init (not in state_dict): %s",
                    sorted(missing)[:8])
    return treelib.unflatten(flat_p), treelib.unflatten(flat_s)


def load_pth_safely(
    module: Module,
    checkpoint_path: str,
    params: Dict[str, Any],
    state: Dict[str, Any],
    key_candidates=("generator", "state_dict", "G"),
    key_map=None,
):
    """Tolerant .pth loader mirroring app.py:257-274.  Requires torch on the
    host to unpickle; raises ImportError with a clear message otherwise.
    ``key_map(name) -> name`` optionally renames state-dict keys before
    import (e.g. torchvision's ``features.<i>.*`` → our ``slice.<i>.*``)."""
    try:
        import torch
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            ".pth import needs host-side torch to deserialize the pickle"
        ) from e
    ckpt = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for k in key_candidates:
            if k in ckpt and isinstance(ckpt[k], dict):
                sd = ckpt[k]
                break
        else:
            sd = ckpt
    else:
        sd = ckpt
    if key_map is not None and isinstance(sd, dict):
        sd = {key_map(k) if isinstance(k, str) else k: v
              for k, v in sd.items()}
    out = import_torch_state_dict(module, sd, params, state, strict=False)
    logger.info("Loaded PyTorch weights from %s", checkpoint_path)
    return out
