"""Export framework weights back to the reference's checkpoint formats.

Completes the interop story: a reference user can import their ``.pth`` /
``.keras`` weights (torch_import / keras_import) AND take models trained
here back out —

* ``export_torch_state_dict`` — inverse of the importer's layout mapping
  (kernel HWIO → OIHW etc.), written with ``torch.save`` under the
  ``{"generator": ...}`` key layout the reference's loaders expect
  (app.py:257-274, denoisegan_eval.py:68-69).
* ``export_keras`` — writes a Keras-3 ``.keras`` zip (config.json +
  model.weights.h5) for the cGAN generator, loadable by
  ``tf.keras.models.load_model`` and by our own keras_import (roundtrip
  tested without TF).
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Dict

import numpy as np

from celebrity_image_denoiser_tpu import nn
from celebrity_image_denoiser_tpu.ckpt.torch_import import _leaf_layers
from celebrity_image_denoiser_tpu.nn.module import Module
from celebrity_image_denoiser_tpu.utils import tree as treelib


def export_torch_state_dict(
    module: Module, params: Dict[str, Any], state: Dict[str, Any]
) -> Dict[str, np.ndarray]:
    """Flat torch-layout state dict (numpy values; pass to torch.save via
    save_pth for a loadable .pth)."""
    flat_p = treelib.flatten(params)
    flat_s = treelib.flatten(state)
    sd: Dict[str, np.ndarray] = {}
    for path, layer in _leaf_layers(module):
        def getp(suffix, src=flat_p):
            return src.get(f"{path}.{suffix}" if path else suffix)

        if isinstance(layer, (nn.Conv2d, nn.ConvTranspose2d)):
            k = getp("kernel")
            if k is not None:
                # HWIO → OIHW (conv); (kH,kW,O,I) → (I,O,kH,kW) (transpose
                # conv) — both are the same permutation inverse (3,2,0,1)
                sd[f"{path}.weight"] = np.transpose(np.asarray(k), (3, 2, 0, 1))
            b = getp("bias")
            if b is not None:
                sd[f"{path}.bias"] = np.asarray(b)
        elif isinstance(layer, nn.Linear):
            k = getp("kernel")
            if k is not None:
                sd[f"{path}.weight"] = np.transpose(np.asarray(k), (1, 0))
            b = getp("bias")
            if b is not None:
                sd[f"{path}.bias"] = np.asarray(b)
        elif isinstance(layer, nn.BatchNorm2d):
            for suffix, name in (("scale", "weight"), ("bias", "bias")):
                v = getp(suffix)
                if v is not None:
                    sd[f"{path}.{name}"] = np.asarray(v)
            for suffix, name in (("mean", "running_mean"), ("var", "running_var")):
                v = getp(suffix, flat_s)
                if v is not None:
                    sd[f"{path}.{name}"] = np.asarray(v)
            sd[f"{path}.num_batches_tracked"] = np.asarray(0, np.int64)
        elif isinstance(layer, nn.PReLU):
            v = getp("alpha")
            if v is not None:
                sd[f"{path}.weight"] = np.asarray(v)
        elif isinstance(layer, nn.Embedding):
            v = getp("table")
            if v is not None:
                sd[f"{path}.weight"] = np.asarray(v)
    return sd


def save_pth(module: Module, params, state, path: str,
             key: str = "generator") -> None:
    """Write a torch-loadable .pth with the reference's dict layout."""
    import torch

    # copy=True: jax.device_get arrays can be non-writable views, which
    # torch.from_numpy warns about (undefined behavior if written)
    sd = {k: torch.from_numpy(np.array(v, copy=True))
          for k, v in export_torch_state_dict(module, params, state).items()}
    torch.save({key: sd}, path)


# ---- Keras-3 .keras export (cGAN generator architecture) -------------------

_KERAS_GEN_LAYERS = [
    ("input_layer", "InputLayer", {"batch_shape": [None, 256, 256, 3]}),
    ("conv2d", "Conv2D", {"filters": 64, "kernel_size": [4, 4],
                          "strides": [2, 2], "padding": "same",
                          "activation": "linear"}),
    ("leaky_re_lu", "LeakyReLU", {"negative_slope": 0.2}),
    ("conv2d_1", "Conv2D", {"filters": 128, "kernel_size": [4, 4],
                            "strides": [2, 2], "padding": "same",
                            "activation": "linear"}),
    ("batch_normalization", "BatchNormalization",
     {"axis": -1, "momentum": 0.99, "epsilon": 0.001}),
    ("leaky_re_lu_1", "LeakyReLU", {"negative_slope": 0.2}),
    ("conv2d_transpose", "Conv2DTranspose",
     {"filters": 128, "kernel_size": [4, 4], "strides": [2, 2],
      "padding": "same", "activation": "linear"}),
    ("batch_normalization_1", "BatchNormalization",
     {"axis": -1, "momentum": 0.99, "epsilon": 0.001}),
    ("leaky_re_lu_2", "LeakyReLU", {"negative_slope": 0.2}),
    ("conv2d_transpose_1", "Conv2DTranspose",
     {"filters": 64, "kernel_size": [4, 4], "strides": [2, 2],
      "padding": "same", "activation": "linear"}),
    ("batch_normalization_2", "BatchNormalization",
     {"axis": -1, "momentum": 0.99, "epsilon": 0.001}),
    ("leaky_re_lu_3", "LeakyReLU", {"negative_slope": 0.2}),
    ("conv2d_2", "Conv2D", {"filters": 3, "kernel_size": [3, 3],
                            "strides": [1, 1], "padding": "same",
                            "activation": "tanh"}),
]


def export_keras_cgan(params: Dict[str, Any], state: Dict[str, Any],
                      path: str) -> None:
    """Write a Keras-3 .keras zip for CGANKerasGenerator weights."""
    import h5py

    seq = params["model"]
    seq_state = state.get("model", {})
    # our Sequential child index → keras layer name, parameterized only
    order = [("0", "conv2d"), ("2", "conv2d_1"), ("3", "batch_normalization"),
             ("5", "conv2d_transpose"), ("6", "batch_normalization_1"),
             ("8", "conv2d_transpose_1"), ("9", "batch_normalization_2"),
             ("11", "conv2d_2")]

    h5buf = io.BytesIO()
    with h5py.File(h5buf, "w") as h:
        layers = h.create_group("layers")
        for idx, kname in order:
            g = layers.create_group(kname).create_group("vars")
            p = seq[idx]
            if "kernel" in p:
                g.create_dataset("0", data=np.asarray(p["kernel"], np.float32))
                g.create_dataset("1", data=np.asarray(p["bias"], np.float32))
            else:  # batch norm: gamma, beta, moving_mean, moving_var
                s = seq_state[idx]
                g.create_dataset("0", data=np.asarray(p["scale"], np.float32))
                g.create_dataset("1", data=np.asarray(p["bias"], np.float32))
                g.create_dataset("2", data=np.asarray(s["mean"], np.float32))
                g.create_dataset("3", data=np.asarray(s["var"], np.float32))

    # the module/registered_name/build_config fields are what Keras 3's
    # loader uses to resolve classes — without them load_model raises
    # "Could not locate class 'Sequential'" (caught by the real-keras load
    # golden, tests/test_tf_golden.py::test_keras_export_loads_in_real_keras)
    config = {
        "module": "keras",
        "class_name": "Sequential",
        "config": {
            "name": "sequential",
            "layers": [
                {"module": "keras.layers", "class_name": cls,
                 "config": {"name": name, **cfg}, "registered_name": None}
                for name, cls, cfg in _KERAS_GEN_LAYERS
            ],
        },
        "registered_name": None,
        "build_config": {"input_shape": [None, 256, 256, 3]},
        "compile_config": {},
    }
    metadata = {"keras_version": "3.0.0", "date_saved": "", "exported_by":
                "celebrity_image_denoiser_tpu"}
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("metadata.json", json.dumps(metadata))
        z.writestr("config.json", json.dumps(config))
        z.writestr("model.weights.h5", h5buf.getvalue())
