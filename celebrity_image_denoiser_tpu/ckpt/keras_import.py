"""Import Keras ``.keras`` checkpoints (Keras-3 zip format) without TF.

The reference serves the shipped ``weights/cgan_epoch_500.keras``
(app.py:339-345) via a full TensorFlow runtime; here the zip is parsed
directly (config.json + model.weights.h5 via h5py) and weights land in the
matching functional model's param/state trees.

Verified against the shipped checkpoint's layout:
    Conv2D kernel (kH, kW, I, O)            == our Conv2d layout, verbatim
    Conv2DTranspose kernel (kH, kW, O, I)   == our ConvTranspose2d, verbatim
    Dense kernel (I, O)                      == our Linear, verbatim
    BatchNormalization vars [gamma, beta, moving_mean, moving_var]
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict, List, Tuple

import numpy as np

from celebrity_image_denoiser_tpu import nn
from celebrity_image_denoiser_tpu.nn.module import Module
from celebrity_image_denoiser_tpu.utils import tree as treelib
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.ckpt.keras")

# keras class name -> our layer class expected at the matching position
_PARAM_CLASSES = {
    "Conv2D": nn.Conv2d,
    "Conv2DTranspose": nn.ConvTranspose2d,
    "Dense": nn.Linear,
    "BatchNormalization": nn.BatchNorm2d,
}


def read_keras_file(path: str) -> Tuple[List[dict], Dict[str, List[np.ndarray]]]:
    """Returns (layer_configs, weights_by_layer_name) for a Sequential model."""
    import h5py

    with zipfile.ZipFile(path) as z:
        cfg = json.loads(z.read("config.json"))
        h5bytes = z.read("model.weights.h5")
    layers = cfg["config"]["layers"]
    weights: Dict[str, List[np.ndarray]] = {}
    with h5py.File(io.BytesIO(h5bytes), "r") as h:
        grp = h["layers"] if "layers" in h else h
        for lname in grp:
            vars_grp = grp[lname].get("vars")
            if vars_grp is None or not len(vars_grp):
                continue
            weights[lname] = [
                np.asarray(vars_grp[str(i)]) for i in range(len(vars_grp))
            ]
    return layers, weights


def _our_param_leaves(module: Module):
    """(path, layer) for leaves that carry parameters, in definition order."""
    out = []

    def walk(m: Module, prefix: str):
        if m.children:
            for name, child in m.children.items():
                walk(child, f"{prefix}.{name}" if prefix else name)
        elif isinstance(m, tuple(_PARAM_CLASSES.values())):
            out.append((prefix, m))

    walk(module, "")
    return out


def load_keras_model(
    module: Module,
    keras_path: str,
    params: Dict[str, Any],
    state: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Overlay .keras weights onto (params, state) by positional layer match
    (Sequential order), checking class and shape at every step."""
    layer_cfgs, weights = read_keras_file(keras_path)
    keras_param_layers = [
        (l["config"]["name"], l["class_name"])
        for l in layer_cfgs
        if l["class_name"] in _PARAM_CLASSES and l["config"]["name"] in weights
    ]
    ours = _our_param_leaves(module)
    if len(keras_param_layers) != len(ours):
        raise ValueError(
            f"layer-count mismatch: keras has {len(keras_param_layers)} "
            f"parameterized layers, model has {len(ours)}"
        )
    flat_p = treelib.flatten(params)
    flat_s = treelib.flatten(state)
    for (kname, kcls), (path, layer) in zip(keras_param_layers, ours):
        if not isinstance(layer, _PARAM_CLASSES[kcls]):
            raise ValueError(
                f"layer class mismatch at {path}: keras {kcls} vs {type(layer).__name__}"
            )
        w = weights[kname]
        if kcls == "BatchNormalization":
            gamma, beta, mean, var = w
            flat_p[f"{path}.scale"] = gamma
            flat_p[f"{path}.bias"] = beta
            flat_s[f"{path}.mean"] = mean
            flat_s[f"{path}.var"] = var
        else:
            kernel = w[0]
            expect = flat_p[f"{path}.kernel"].shape
            if tuple(kernel.shape) != tuple(expect):
                raise ValueError(
                    f"kernel shape mismatch at {path}: keras {kernel.shape} vs {expect}"
                )
            flat_p[f"{path}.kernel"] = kernel
            if len(w) > 1:
                flat_p[f"{path}.bias"] = w[1]
    logger.info("Loaded Keras weights from %s (%d layers)", keras_path, len(ours))
    return treelib.unflatten(flat_p), treelib.unflatten(flat_s)
