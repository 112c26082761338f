"""End-to-end model parity vs torch-CPU.

For each model family: build a torch mirror of the reference architecture
(cited file:line in models/*.py docstrings), transfer its weights into our
functional model via ckpt.torch_import, and compare full forwards in eval
mode.  This is the ≤0.05 dB parity harness at the strongest level — raw
activation agreement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as tn  # noqa: E402

from celebrity_image_denoiser_tpu import models  # noqa: E402
from celebrity_image_denoiser_tpu.ckpt import import_torch_state_dict  # noqa: E402
from celebrity_image_denoiser_tpu.core import prng  # noqa: E402


def _nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


def _run_ours(model, params, state, x_nhwc, train=False):
    y, _ = model.apply(params, state, jnp.asarray(x_nhwc), train=train)
    return np.asarray(y)


# ---- torch mirrors of the reference architectures (test-only) ------------

def t_denoise_generator():
    class G(tn.Module):
        def __init__(self):
            super().__init__()
            def block(cin, cmid, cout):
                return tn.Sequential(tn.Conv2d(cin, cmid, 3, padding=1), tn.ReLU(),
                                     tn.Conv2d(cmid, cout, 3, padding=1), tn.ReLU())
            self.down1 = block(3, 64, 64)
            self.pool1 = tn.MaxPool2d(2, 2)
            self.down2 = block(64, 128, 128)
            self.pool2 = tn.MaxPool2d(2, 2)
            self.bottleneck = block(128, 256, 256)
            self.up2 = tn.ConvTranspose2d(256, 128, 2, stride=2)
            self.upconv2 = block(256, 128, 128)
            self.up1 = tn.ConvTranspose2d(128, 64, 2, stride=2)
            self.upconv1 = tn.Sequential(tn.Conv2d(128, 64, 3, padding=1), tn.ReLU(),
                                         tn.Conv2d(64, 3, 3, padding=1))
        def forward(self, x):
            e1 = self.down1(x); p1 = self.pool1(e1)
            e2 = self.down2(p1); p2 = self.pool2(e2)
            b = self.bottleneck(p2)
            d2 = self.up2(b)
            d2 = self.upconv2(torch.cat([d2, e2[:, :, :d2.shape[2], :d2.shape[3]]], 1))
            d1 = self.up1(d2)
            d1 = self.upconv1(torch.cat([d1, e1[:, :, :d1.shape[2], :d1.shape[3]]], 1))
            return torch.tanh(d1)
    return G()


def t_denoise_discriminator():
    class D(tn.Module):
        def __init__(self):
            super().__init__()
            self.model = tn.Sequential(
                tn.Conv2d(3, 64, 3, padding=1), tn.LeakyReLU(0.2),
                tn.Conv2d(64, 64, 3, stride=2, padding=1), tn.BatchNorm2d(64), tn.LeakyReLU(0.2),
                tn.Conv2d(64, 128, 3, padding=1), tn.BatchNorm2d(128), tn.LeakyReLU(0.2),
                tn.Conv2d(128, 128, 3, stride=2, padding=1), tn.BatchNorm2d(128), tn.LeakyReLU(0.2),
                tn.AdaptiveAvgPool2d(1), tn.Conv2d(128, 1, 1), tn.Sigmoid())
        def forward(self, x):
            return self.model(x).view(-1)
    return D()


def t_srgan_generator():
    class G(tn.Module):
        def __init__(self):
            super().__init__()
            self.initial = tn.Sequential(tn.Conv2d(3, 64, 9, padding=4), tn.PReLU())
            self.res_blocks = tn.Sequential(*[
                tn.Sequential(tn.Conv2d(64, 64, 3, padding=1), tn.BatchNorm2d(64), tn.PReLU(),
                              tn.Conv2d(64, 64, 3, padding=1), tn.BatchNorm2d(64))
                for _ in range(5)])
            self.mid = tn.Conv2d(64, 64, 3, padding=1)
            ups = []
            for _ in range(2):
                ups += [tn.Conv2d(64, 256, 3, padding=1), tn.PixelShuffle(2), tn.PReLU()]
            self.upscale = tn.Sequential(*ups)
            self.final = tn.Conv2d(64, 3, 9, padding=4)
        def forward(self, x):
            x0 = self.initial(x)
            x = self.mid(self.res_blocks(x0)) + x0
            return torch.tanh(self.final(self.upscale(x)))
    return G()


def t_srgan_discriminator():
    class D(tn.Module):
        def __init__(self):
            super().__init__()
            self.model = tn.Sequential(
                tn.Conv2d(3, 64, 3, padding=1), tn.LeakyReLU(0.2),
                tn.Conv2d(64, 64, 3, stride=2, padding=1), tn.BatchNorm2d(64), tn.LeakyReLU(0.2),
                tn.Conv2d(64, 128, 3, padding=1), tn.BatchNorm2d(128), tn.LeakyReLU(0.2),
                tn.Conv2d(128, 128, 3, stride=2, padding=1), tn.BatchNorm2d(128), tn.LeakyReLU(0.2),
                tn.Conv2d(128, 256, 3, padding=1), tn.BatchNorm2d(256), tn.LeakyReLU(0.2),
                tn.AdaptiveAvgPool2d(1), tn.Conv2d(256, 512, 1), tn.LeakyReLU(0.2),
                tn.Conv2d(512, 1, 1), tn.Sigmoid())
        def forward(self, x):
            return self.model(x).view(-1)
    return D()


def t_vgg_tower():
    """torchvision vgg16.features[:16] layer layout with RANDOM weights,
    named ``slice`` like the reference's VGGPerceptualLoss
    (sr_ganTrainGNew.py:83-93) so state_dict keys ('slice.<i>.weight')
    import straight into our models.vgg.VGGFeatures tree."""
    class T(tn.Module):
        def __init__(self):
            super().__init__()
            self.slice = tn.Sequential(
                tn.Conv2d(3, 64, 3, padding=1), tn.ReLU(),
                tn.Conv2d(64, 64, 3, padding=1), tn.ReLU(),
                tn.MaxPool2d(2, 2),
                tn.Conv2d(64, 128, 3, padding=1), tn.ReLU(),
                tn.Conv2d(128, 128, 3, padding=1), tn.ReLU(),
                tn.MaxPool2d(2, 2),
                tn.Conv2d(128, 256, 3, padding=1), tn.ReLU(),
                tn.Conv2d(256, 256, 3, padding=1), tn.ReLU(),
                tn.Conv2d(256, 256, 3, padding=1), tn.ReLU())
        def forward(self, x):
            return self.slice(x)
    return T()


def t_esrgan_generator():
    class RB(tn.Module):
        def __init__(self, c):
            super().__init__()
            self.block = tn.Sequential(tn.Conv2d(c, c, 3, 1, 1), tn.BatchNorm2d(c), tn.PReLU(),
                                       tn.Conv2d(c, c, 3, 1, 1), tn.BatchNorm2d(c))
        def forward(self, x):
            return x + self.block(x)
    class G(tn.Module):
        def __init__(self):
            super().__init__()
            self.initial = tn.Sequential(tn.Conv2d(3, 64, 9, 1, 4), tn.PReLU())
            self.residuals = tn.Sequential(*[RB(64) for _ in range(8)])
            self.final = tn.Conv2d(64, 3, 9, 1, 4)
        def forward(self, x):
            x1 = self.initial(x)
            return self.final(x1 + self.residuals(x1))
    return G()


def t_esrgan_discriminator(hw=(64, 64)):
    class D(tn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = tn.Conv2d(3, 64, 3, 2, 1)
            self.conv2 = tn.Conv2d(64, 128, 3, 2, 1)
            self.conv3 = tn.Conv2d(128, 256, 3, 2, 1)
            self.conv4 = tn.Conv2d(256, 512, 3, 2, 1)
            self.act = tn.LeakyReLU(0.2)
            with torch.no_grad():
                n = self._feat(torch.zeros(1, 3, *hw)).reshape(1, -1).shape[1]
            self.fc = tn.Linear(n, 1)
        def _feat(self, x):
            for c in (self.conv1, self.conv2, self.conv3, self.conv4):
                x = self.act(c(x))
            return x
        def forward(self, x):
            return self.fc(self._feat(x).reshape(x.shape[0], -1))
    return D()


def t_cgan_torch_generator():
    class G(tn.Module):
        def __init__(self):
            super().__init__()
            self.label_emb = tn.Embedding(10, 100)
            self.l1 = tn.Linear(200, 128 * 64)
            self.model = tn.Sequential(
                tn.BatchNorm2d(128), tn.ReLU(True),
                tn.ConvTranspose2d(128, 128, 4, 2, 1), tn.BatchNorm2d(128), tn.ReLU(True),
                tn.ConvTranspose2d(128, 64, 4, 2, 1), tn.BatchNorm2d(64), tn.ReLU(True),
                tn.ConvTranspose2d(64, 32, 4, 2, 1), tn.BatchNorm2d(32), tn.ReLU(True),
                tn.Conv2d(32, 3, 3, 1, 1))
        def forward(self, z, labels):
            emb = self.label_emb(labels)
            h = self.l1(torch.cat([z.view(z.shape[0], -1), emb], 1))
            return torch.tanh(self.model(h.view(-1, 128, 8, 8)))
    return G()


# ---- tests ----------------------------------------------------------------

def _transfer(our_model, torch_model):
    params, state = our_model.init(prng.key(0))
    return import_torch_state_dict(our_model, torch_model.state_dict(), params, state)


@pytest.mark.parametrize("hw", [(32, 32), (36, 28)])
def test_denoise_generator_parity(rng_np, hw):
    tm = t_denoise_generator().eval()
    om = models.DenoiseGenerator()
    params, state = _transfer(om, tm)
    x = rng_np.uniform(-1, 1, (2, *hw, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = _run_ours(om, params, state, x)
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_denoise_discriminator_parity(rng_np):
    tm = t_denoise_discriminator().eval()
    om = models.DenoiseDiscriminator()
    params, state = _transfer(om, tm)
    x = rng_np.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = _run_ours(om, params, state, x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_srgan_generator_parity(rng_np):
    tm = t_srgan_generator().eval()
    om = models.SRGANGenerator(scale_factor=4)
    params, state = _transfer(om, tm)
    x = rng_np.uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = _run_ours(om, params, state, x)
    assert got.shape == (1, 64, 64, 3)  # ×4 upscale
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_srgan_discriminator_parity(rng_np):
    tm = t_srgan_discriminator().eval()
    om = models.SRGANDiscriminator()
    params, state = _transfer(om, tm)
    x = rng_np.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = _run_ours(om, params, state, x)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_esrgan_generator_parity(rng_np):
    tm = t_esrgan_generator().eval()
    om = models.ESRGANGenerator(num_residuals=8)
    params, state = _transfer(om, tm)
    x = rng_np.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))
    got = _run_ours(om, params, state, x)
    np.testing.assert_allclose(got, _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_esrgan_discriminator_parity(rng_np):
    tm = t_esrgan_discriminator((64, 64)).eval()
    om = models.ESRGANDiscriminator(input_hw=(64, 64))
    params, state = _transfer(om, tm)
    x = rng_np.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy().reshape(-1)
    got = _run_ours(om, params, state, x)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=1e-3)


def test_cgan_torch_generator_parity(rng_np):
    tm = t_cgan_torch_generator().eval()
    om = models.CGANTorchGenerator()
    params, state = _transfer(om, tm)
    z = rng_np.standard_normal((2, 100)).astype(np.float32)
    labels = np.asarray([3, 7])
    with torch.no_grad():
        ref = tm(torch.from_numpy(z), torch.from_numpy(labels))
    got, _ = om.apply(params, state, jnp.asarray(z), jnp.asarray(labels))
    assert got.shape == (2, 64, 64, 3)
    np.testing.assert_allclose(np.asarray(got), _nhwc(ref), rtol=1e-4, atol=1e-4)


def test_dncnn_forward_shapes():
    om = models.DnCNN(depth=5)
    params, state = om.init(prng.key(0))
    x = jnp.ones((1, 32, 32, 3), jnp.float32) * 0.5
    y, _ = om.apply(params, state, x)
    assert y.shape == x.shape


def test_keras_cgan_import_from_shipped_checkpoint():
    """Load the actual shipped cgan_epoch_500.keras (the only weights the
    reference ships) and run a forward — output must be tanh-bounded and
    deterministic, and all BN stats must be non-default."""
    import os
    path = "/root/reference/backend/weights/cgan_epoch_500.keras"
    if not os.path.exists(path):
        pytest.skip("shipped .keras not available")
    from celebrity_image_denoiser_tpu.ckpt import load_keras_model

    om = models.CGANKerasGenerator()
    params, state = om.init(prng.key(0))
    params, state = load_keras_model(om, path, params, state)
    # BN running stats must have been overwritten (not zeros/ones)
    bn_state = state["model"]["3"]
    assert float(jnp.abs(bn_state["mean"]).sum()) > 0
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)
    y, _ = om.apply(params, state, x, train=False)
    assert y.shape == (1, 256, 256, 3)
    arr = np.asarray(y)
    assert arr.min() >= -1.0 and arr.max() <= 1.0
    y2, _ = om.apply(params, state, x, train=False)
    np.testing.assert_array_equal(arr, np.asarray(y2))


def test_registry():
    assert set(models.GENERATORS) == {
        "denoise", "srgan", "esrgan", "cgan", "cgan_torch", "dncnn"}
    with pytest.raises(ValueError, match="Unknown model"):
        models.build_generator("nope")
