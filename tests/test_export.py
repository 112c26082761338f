"""Exporter roundtrips: our params → .pth/.keras → back (and through torch)."""

import numpy as np
import pytest

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import models
from celebrity_image_denoiser_tpu.ckpt import (
    export_keras_cgan,
    load_keras_model,
    load_pth_safely,
    save_pth,
)
from celebrity_image_denoiser_tpu.core import prng


def test_pth_roundtrip_through_torch(tmp_path, rng_np):
    torch = pytest.importorskip("torch")
    model = models.DenoiseGenerator()
    params, state = model.init(prng.key(0))
    path = str(tmp_path / "denoise_epoch_0.pth")
    save_pth(model, params, state, path, key="generator")

    # a) torch can load the dict and sees the reference key layout
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    assert "generator" in ckpt
    assert ckpt["generator"]["down1.0.weight"].shape == (64, 3, 3, 3)  # OIHW

    # b) importing it back reproduces the exact forward
    p2, s2 = model.init(prng.key(1))  # different init, will be overwritten
    p2, s2 = load_pth_safely(model, path, p2, s2)
    x = jnp.asarray(rng_np.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32))
    y1, _ = model.apply(params, state, x)
    y2, _ = model.apply(p2, s2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


@pytest.mark.parametrize("name,builder", [
    ("srgan", lambda: models.SRGANGenerator(4)),        # PReLU + BN + PixelShuffle
    ("esrgan", lambda: models.ESRGANGenerator(2)),      # residual blocks
    ("denoise_d", models.DenoiseDiscriminator),         # BN + sigmoid ladder
    ("esrgan_d", lambda: models.ESRGANDiscriminator(input_hw=(32, 32))),  # Linear
    ("cgan_torch", models.CGANTorchGenerator),          # Embedding + Linear + BN
])
def test_pth_roundtrip_all_families(tmp_path, rng_np, name, builder):
    """Exporter/importer inverse property across every layer type."""
    pytest.importorskip("torch")
    import jax

    model = builder()
    params, state = model.init(prng.key(0))
    path = str(tmp_path / f"{name}.pth")
    save_pth(model, params, state, path, key="state_dict")
    p2, s2 = model.init(prng.key(1))
    p2, s2 = load_pth_safely(model, path, p2, s2)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(s2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_keras_export_roundtrip(tmp_path, rng_np):
    pytest.importorskip("h5py")
    model = models.CGANKerasGenerator()
    params, state = model.init(prng.key(0))
    path = str(tmp_path / "cgan_exported.keras")
    export_keras_cgan(params, state, path)

    p2, s2 = model.init(prng.key(1))
    p2, s2 = load_keras_model(model, path, p2, s2)
    x = jnp.asarray(rng_np.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    y1, _ = model.apply(params, state, x)
    y2, _ = model.apply(p2, s2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)


def test_keras_export_matches_shipped_layout(tmp_path):
    """The exported zip must have the same member set and h5 dataset tree as
    the shipped reference checkpoint."""
    import io
    import json
    import os
    import zipfile

    import h5py

    ref_path = "/root/reference/backend/weights/cgan_epoch_500.keras"
    if not os.path.exists(ref_path):
        pytest.skip("shipped .keras not available")
    model = models.CGANKerasGenerator()
    params, state = model.init(prng.key(0))
    out = str(tmp_path / "exported.keras")
    export_keras_cgan(params, state, out)

    def structure(path):
        with zipfile.ZipFile(path) as z:
            names = sorted(z.namelist())
            cfg = json.loads(z.read("config.json"))
            classes = [l["class_name"] for l in cfg["config"]["layers"]]
            with h5py.File(io.BytesIO(z.read("model.weights.h5"))) as h:
                datasets = []
                h.visit(lambda k: datasets.append(k))
        return names, classes, sorted(d for d in datasets if "/vars/" in d)

    ref = structure(ref_path)
    got = structure(out)
    assert got[0] == ref[0]  # same zip members
    assert got[1] == ref[1]  # same layer class sequence
    assert got[2] == ref[2]  # same weight tree
