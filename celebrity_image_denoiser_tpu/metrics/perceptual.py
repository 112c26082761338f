"""LPIPS-style perceptual distance on device.

The reference uses ``lpips.LPIPS(net='alex'|'vgg')`` (training.py:282,
esrgan_train.py:65), which needs downloaded pretrained weights.  This
implementation follows the LPIPS recipe — per-layer unit-normalized feature
differences, spatially averaged, summed over layers — on the framework's
VGGFeatures tower.  With imported torchvision VGG16 weights it reproduces
lpips-vgg's architecture (uniform layer weights).  The repo ships a trained
tower (weights/perceptual — a denoising-autoencoder encoder trained in-repo,
scripts/train_serving_weights.py) that ``default()`` picks up; with neither,
random init is still a deterministic perceptual-distance metric
(random-feature distances are a known useful proxy), labeled
``pretrained=False``.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.models.vgg import VGGFeatures

# torchvision ImageNet normalization (inputs arrive in [0,1])
_MEAN = jnp.asarray([0.485, 0.456, 0.406])
_STD = jnp.asarray([0.229, 0.224, 0.225])

# slice indices (exclusive ends) inside features[:16] marking relu1_2,
# relu2_2, relu3_3 — the lpips-vgg tap points available in our tower
_TAPS = ("3", "8", "15")


class PerceptualDistance:
    """d(a, b) per image; a, b NHWC in [0,1]."""

    def __init__(self, params=None, state=None, seed: int = 0,
                 input_domain: str = "imagenet"):
        """``input_domain``: what preprocessing the tower was trained with —
        "imagenet" (torchvision weights / random init: [0,1] inputs get
        ImageNet mean/std) or "unit" (the in-repo DAE tower, trained on raw
        [0,1]: no shift — feeding it ImageNet-normalized values would run
        the features far outside their training range)."""
        if input_domain not in ("imagenet", "unit"):
            raise ValueError(f"unknown input_domain {input_domain!r}")
        self.net = VGGFeatures()
        if params is None:
            params, state = self.net.init(prng.key(seed))
            self.pretrained = False
        else:
            self.pretrained = True
        self.input_domain = input_domain
        self.params, self.state = params, state
        self._fn = jax.jit(self._distance)

    def _taps(self, x):
        """Run the tower, collecting activations after the tap relus."""
        seq = self.net.children["slice"]
        p = self.params.get("slice", {})
        s = self.state.get("slice", {})
        outs = []
        h = x
        for name in seq.children:
            h, _ = seq.children[name].apply(p.get(name, {}), s.get(name, {}), h)
            if name in _TAPS:
                outs.append(h)
        return outs

    def _distance(self, a, b):
        if self.input_domain == "imagenet":
            a = (a - _MEAN) / _STD
            b = (b - _MEAN) / _STD
        fa, fb = self._taps(a), self._taps(b)
        total = 0.0
        for xa, xb in zip(fa, fb):
            na = xa * jax.lax.rsqrt(jnp.sum(xa * xa, -1, keepdims=True) + 1e-10)
            nb = xb * jax.lax.rsqrt(jnp.sum(xb * xb, -1, keepdims=True) + 1e-10)
            d = jnp.mean((na - nb) ** 2, axis=(1, 2))  # spatial average
            total = total + jnp.mean(d, axis=-1)  # uniform layer weights
        return total

    def __call__(self, a: jax.Array, b: jax.Array) -> jax.Array:
        return self._fn(a, b)

    @classmethod
    def from_torchvision_pth(cls, path: str):
        """Build with imported torchvision vgg16 weights (.pth).

        torchvision names the conv stack ``features`` (state_dict keys
        ``features.<i>.weight``); our module names it ``slice`` — the prefix
        is remapped via ``load_pth_safely(key_map=)``.  Raises if nothing
        loads, so a wrong file can't silently masquerade as pretrained."""
        import numpy as np

        from celebrity_image_denoiser_tpu.ckpt import load_pth_safely

        net = VGGFeatures()
        params, state = net.init(prng.key(0))
        new_params, new_state = load_pth_safely(
            net, path, params, state,
            key_candidates=("state_dict", "features"),
            key_map=lambda k: ("slice." + k[len("features."):]
                               if k.startswith("features.") else k))
        k0 = "slice", "0", "kernel"
        if np.allclose(np.asarray(new_params[k0[0]][k0[1]][k0[2]]),
                       np.asarray(params[k0[0]][k0[1]][k0[2]])):
            raise ValueError(
                f"{path} contributed no VGG feature weights (expected "
                "torchvision vgg16 'features.<i>.weight' keys)")
        return cls(new_params, new_state)

    @classmethod
    def from_npz(cls, path: str):
        """Build from a native checkpoint dir with 'vgg'/'vgg_state' sections
        (the in-repo trained tower, scripts/train_serving_weights.py)."""
        from celebrity_image_denoiser_tpu.ckpt import checkpoint as ckpt_lib

        net = VGGFeatures()
        params, state = net.init(prng.key(0))
        sections, _ = ckpt_lib.load_checkpoint(path)
        if "vgg" not in sections:
            raise ValueError(f"{path} has no 'vgg' section")
        return cls(sections["vgg"], sections.get("vgg_state", state) or state,
                   input_domain="unit")

    @classmethod
    def default(cls, seed: int = 0):
        """Trained tower when one is shipped, random features otherwise.

        Discovery order: $CID_VGG_PTH (torchvision .pth) → the committed
        weights/perceptual npz (synthetic-DAE tower) → random init (labeled
        pretrained=False)."""
        import os

        pth = os.environ.get("CID_VGG_PTH")
        if pth and os.path.exists(pth):
            return cls.from_torchvision_pth(pth)
        from celebrity_image_denoiser_tpu.core.config import (
            default_weights_dir,
        )

        npz = os.path.join(default_weights_dir(), "perceptual")
        if os.path.isdir(npz):
            return cls.from_npz(npz)
        return cls(seed=seed)
