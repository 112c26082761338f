"""Golden tests against the reference's REAL TensorFlow/Keras stack.

This container ships tensorflow 2.21 + Keras 3 (discovered in round 4 — the
framework itself never imports TF; serving and training stay TF-free).
These tests pin the from-spec TF-convention implementations to the actual
runtime the reference trained and served with:

* ``metrics.ssim_tf`` / ``metrics.psnr`` vs ``tf.image.ssim/psnr`` at
  max_val=2.0 — the cGAN metric convention (training5Pbar.py:108-109).
* ``ops.batch_norm(keras_momentum=True)`` vs a real
  ``keras.layers.BatchNormalization`` train step (output + moving stats;
  Keras feeds the moving variance the BIASED batch variance, unlike torch).
* ``ops.resize_lanczos3`` vs ``tf.image.resize(method='lanczos3')`` in both
  antialias flavors — the reference's TF cleanup-path resize
  (sr_ganpreprocess.py:26-27 leaves antialias at TF's default False).
* The TF-free ``.keras`` importer (ckpt/keras_import.py) vs
  ``keras.saving.load_model(...).predict`` on the SHIPPED reference
  checkpoint — the reference's real serving backend (app.py:469,
  ``KERAS_CGAN.predict`` at app.py:438-467).
* ``data.caching.TFDataCacheDataset`` round-trips a genuine
  ``tf.data.Dataset.save`` cache built the DataP2 way (DataP2.py:92-108).

Every test importorskips tensorflow, so TF-less environments still run the
rest of the suite unchanged.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
keras = pytest.importorskip("keras")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebrity_image_denoiser_tpu import metrics, models, ops  # noqa: E402
from celebrity_image_denoiser_tpu.core import prng  # noqa: E402

SHIPPED_KERAS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "weights", "cgan_epoch_500.keras")


def test_ssim_tf_and_psnr_match_tf_image(rng_np):
    """training5Pbar.py:108-109 convention: tf.image.psnr/ssim max_val=2.0
    on [-1,1] tensors."""
    a = rng_np.uniform(-1, 1, (3, 64, 64, 3)).astype(np.float32)
    b = np.clip(a + rng_np.normal(0, 0.2, a.shape), -1, 1).astype(np.float32)
    ref_ssim = tf.image.ssim(tf.constant(a), tf.constant(b), max_val=2.0).numpy()
    got_ssim = np.asarray(metrics.ssim_tf(a, b, max_val=2.0))
    np.testing.assert_allclose(got_ssim, ref_ssim, atol=1e-5)
    ref_psnr = tf.image.psnr(tf.constant(a), tf.constant(b), max_val=2.0).numpy()
    got_psnr = np.asarray(metrics.psnr(a, b, data_range=2.0))
    np.testing.assert_allclose(got_psnr, ref_psnr, atol=1e-4)


def test_keras_bn_train_step_matches_real_keras(rng_np):
    """One training=True step of keras.layers.BatchNormalization(momentum=
    0.99, epsilon=1e-3) — output AND both moving statistics.  Keras updates
    moving_variance with the biased batch variance (no Bessel correction);
    torch's convention (unbiased) is golden-tested separately against torch
    in test_ops_parity.py."""
    c = 5
    x = rng_np.standard_normal((4, 8, 8, c)).astype(np.float32)
    bn = keras.layers.BatchNormalization(momentum=0.99, epsilon=1e-3)
    bn.build((None, 8, 8, c))
    y_ref = bn(tf.constant(x), training=True).numpy()
    got_y, new_state = ops.batch_norm(
        jnp.asarray(x),
        {"scale": jnp.ones(c), "bias": jnp.zeros(c)},
        {"mean": jnp.zeros(c), "var": jnp.ones(c)},
        train=True, eps=1e-3, momentum=0.99, keras_momentum=True)
    np.testing.assert_allclose(np.asarray(got_y), y_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(new_state["mean"]),
                               bn.moving_mean.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(new_state["var"]),
                               bn.moving_variance.numpy(), atol=1e-6)


@pytest.mark.parametrize("size,antialias", [
    ((48, 48), False),   # the reference's exact call: TF default antialias
    ((48, 48), True),    # the PIL-equivalent flavor (framework default)
    ((192, 192), False),  # upscale: antialias is a no-op, both must agree
])
def test_lanczos3_resize_matches_tf(rng_np, size, antialias):
    """sr_ganpreprocess.py:26-27: tf.image.resize(..., method='lanczos3')."""
    img = rng_np.uniform(0, 255, (96, 96, 3)).astype(np.float32)
    ref = tf.image.resize(tf.constant(img), size, method="lanczos3",
                          antialias=antialias).numpy()
    got = np.asarray(ops.resize_lanczos3(jnp.asarray(img), size,
                                         antialias=antialias))
    np.testing.assert_allclose(got, ref, atol=2e-3)  # [0,255] scale


def test_keras_cgan_import_matches_real_keras_predict(rng_np):
    """The TF-free importer's forward must match keras.predict on the
    SHIPPED reference checkpoint — the reference's actual serving backend
    (app.py:469 serves KERAS_CGAN.predict by default)."""
    if not os.path.exists(SHIPPED_KERAS):
        pytest.skip("shipped .keras not available")
    from celebrity_image_denoiser_tpu.ckpt import load_keras_model

    om = models.CGANKerasGenerator()
    params, state = om.init(prng.key(0))
    params, state = load_keras_model(om, SHIPPED_KERAS, params, state)
    km = keras.saving.load_model(SHIPPED_KERAS, compile=False)
    x = rng_np.uniform(-1, 1, (2, 256, 256, 3)).astype(np.float32)
    ref = km.predict(x, verbose=0)
    got, _ = om.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-4)


def test_keras_export_loads_in_real_keras(rng_np, tmp_path):
    """The exporter's output must be loadable by REAL keras.saving.load_model
    and predict identically to our forward — the round-trip the exporter
    exists for (hand a retrained generator back to a reference deployment)."""
    pytest.importorskip("h5py")
    from celebrity_image_denoiser_tpu.ckpt.export import export_keras_cgan
    from celebrity_image_denoiser_tpu.core import prng as cid_prng

    om = models.CGANKerasGenerator()
    params, state = om.init(cid_prng.key(5))
    path = str(tmp_path / "exported.keras")
    export_keras_cgan(params, state, path)

    km = keras.saving.load_model(path, compile=False)
    x = rng_np.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    ref = km.predict(x, verbose=0)
    got, _ = om.apply(params, state, jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-5)


def test_adam_keras_matches_real_keras(rng_np):
    """optim.adam_keras vs keras.optimizers.Adam(1e-3), 5 steps on a
    quadratic — keras puts eps on the UNCORRECTED sqrt(v) with default 1e-7
    (different from torch's corrected-v̂ + 1e-8, golden-tested separately
    in test_train.py::test_adam_matches_torch)."""
    from celebrity_image_denoiser_tpu.train import optim

    w0 = rng_np.standard_normal(16).astype(np.float32)
    var = tf.Variable(w0.copy())
    opt = keras.optimizers.Adam(learning_rate=1e-3)
    for _ in range(5):
        with tf.GradientTape() as tape:
            loss = tf.reduce_sum(tf.sin(var) + 0.5 * var * var)
        g = tape.gradient(loss, [var])
        opt.apply_gradients(zip(g, [var]))

    init, update = optim.adam_keras()
    params = {"w": jnp.asarray(w0)}
    state = init(params)
    grad_fn = jax.grad(lambda p: jnp.sum(jnp.sin(p["w"]) + 0.5 * p["w"] ** 2))
    for _ in range(5):
        params, state = update(grad_fn(params), state, params, 1e-3)
    np.testing.assert_allclose(np.asarray(params["w"]), var.numpy(), atol=1e-6)


def _build_keras_cgan_pair(hw):
    """The reference's build_generator/build_discriminator
    (training5Pbar.py:16-54) at a reduced input size."""
    from keras import layers

    g = keras.Sequential()
    g.add(layers.Input(shape=(hw, hw, 3)))
    g.add(layers.Conv2D(64, 4, strides=2, padding="same"))
    g.add(layers.LeakyReLU(negative_slope=0.2))
    g.add(layers.Conv2D(128, 4, strides=2, padding="same"))
    g.add(layers.BatchNormalization())
    g.add(layers.LeakyReLU(negative_slope=0.2))
    g.add(layers.Conv2DTranspose(128, 4, strides=2, padding="same"))
    g.add(layers.BatchNormalization())
    g.add(layers.LeakyReLU(negative_slope=0.2))
    g.add(layers.Conv2DTranspose(64, 4, strides=2, padding="same"))
    g.add(layers.BatchNormalization())
    g.add(layers.LeakyReLU(negative_slope=0.2))
    g.add(layers.Conv2D(3, 3, padding="same", activation="tanh"))

    d = keras.Sequential()
    d.add(layers.Input(shape=(hw, hw, 3)))
    d.add(layers.Conv2D(64, 4, strides=2, padding="same"))
    d.add(layers.LeakyReLU(negative_slope=0.2))
    d.add(layers.Conv2D(128, 4, strides=2, padding="same"))
    d.add(layers.BatchNormalization())
    d.add(layers.LeakyReLU(negative_slope=0.2))
    d.add(layers.Conv2D(256, 4, strides=2, padding="same"))
    d.add(layers.BatchNormalization())
    d.add(layers.LeakyReLU(negative_slope=0.2))
    d.add(layers.Flatten())
    d.add(layers.Dense(1, activation="sigmoid"))
    return g, d


def _copy_cgan_weights(kg, kd, g_params, g_state, d_params, d_state):
    a = np.asarray
    seq, st = g_params["model"], g_state["model"]
    for i in ("0", "2", "5", "8", "11"):
        kg.layers[int(i)].set_weights([a(seq[i]["kernel"]), a(seq[i]["bias"])])
    for i in ("3", "6", "9"):
        kg.layers[int(i)].set_weights([a(seq[i]["scale"]), a(seq[i]["bias"]),
                                       a(st[i]["mean"]), a(st[i]["var"])])
    f, fs = d_params["features"], d_state["features"]
    for i in ("0", "2", "5"):
        kd.layers[int(i)].set_weights([a(f[i]["kernel"]), a(f[i]["bias"])])
    for i in ("3", "6"):
        kd.layers[int(i)].set_weights([a(f[i]["scale"]), a(f[i]["bias"]),
                                       a(fs[i]["mean"]), a(fs[i]["var"])])
    kd.layers[9].set_weights([a(d_params["dense"]["kernel"]),
                              a(d_params["dense"]["bias"])])


def test_cgan_train_step_matches_real_tf(rng_np):
    """ONE full cGAN train step vs a real-TF replication of the reference's
    train_step (training5Pbar.py:77-97: joint tapes, BCE + 100·MAE, Keras
    Adam 1e-4): g_loss, d_loss, every updated weight, and every BN moving
    statistic must agree.  The BN-stat tolerance is strict (1e-6) — it is
    what catches a wrong state-threading (the reference forwards D exactly
    twice per step) or a Bessel-corrected moving variance."""
    from celebrity_image_denoiser_tpu.core import prng as cid_prng
    from celebrity_image_denoiser_tpu.train.gan_trainer import make_train_step

    hw = 32
    g = models.CGANKerasGenerator()
    d = models.CGANKerasDiscriminator(input_hw=(hw, hw))
    init_fn, step_fn = make_train_step(g, d, family="cgan", donate=False)
    carry = init_fn(cid_prng.key(0))
    g_params, g_state, d_params, d_state = carry[0], carry[1], carry[2], carry[3]

    kg, kd = _build_keras_cgan_pair(hw)
    _copy_cgan_weights(kg, kd, g_params, g_state, d_params, d_state)

    clean = rng_np.uniform(-1, 1, (4, hw, hw, 3)).astype(np.float32)
    noisy = np.clip(clean + rng_np.normal(0, 0.15, clean.shape),
                    -1, 1).astype(np.float32)

    # the reference step, in real TF (training5Pbar.py:77-97)
    bce = keras.losses.BinaryCrossentropy(from_logits=False)
    mae = keras.losses.MeanAbsoluteError()
    g_opt = keras.optimizers.Adam(1e-4)
    d_opt = keras.optimizers.Adam(1e-4)
    with tf.GradientTape() as gt, tf.GradientTape() as dt:
        fake = kg(tf.constant(noisy), training=True)
        real_out = kd(tf.constant(clean), training=True)
        fake_out = kd(fake, training=True)
        g_loss_tf = bce(tf.ones_like(fake_out), fake_out) + 100.0 * mae(fake, clean)
        d_loss_tf = (bce(tf.ones_like(real_out), real_out)
                     + bce(tf.zeros_like(fake_out), fake_out))
    g_opt.apply_gradients(zip(gt.gradient(g_loss_tf, kg.trainable_variables),
                              kg.trainable_variables))
    d_opt.apply_gradients(zip(dt.gradient(d_loss_tf, kd.trainable_variables),
                              kd.trainable_variables))

    carry2, out = step_fn(carry, jnp.asarray(noisy), jnp.asarray(clean),
                          cid_prng.key(1), 1e-4, 1e-4)
    np.testing.assert_allclose(float(out["g_loss"]), float(g_loss_tf), rtol=1e-5)
    np.testing.assert_allclose(float(out["d_loss"]), float(d_loss_tf), rtol=1e-4)

    g2, gs2, d2, ds2 = carry2[0], carry2[1], carry2[2], carry2[3]
    a = np.asarray
    for i in ("0", "2", "5", "8", "11"):
        w = kg.layers[int(i)].get_weights()
        np.testing.assert_allclose(a(g2["model"][i]["kernel"]), w[0], atol=1.5e-4)
        np.testing.assert_allclose(a(g2["model"][i]["bias"]), w[1], atol=1.5e-4)
    for i in ("3", "6", "9"):
        w = kg.layers[int(i)].get_weights()
        np.testing.assert_allclose(a(g2["model"][i]["scale"]), w[0], atol=1.5e-4)
        np.testing.assert_allclose(a(gs2["model"][i]["mean"]), w[2], atol=1e-6)
        np.testing.assert_allclose(a(gs2["model"][i]["var"]), w[3], atol=1e-6)
    for i in ("0", "2", "5"):
        w = kd.layers[int(i)].get_weights()
        np.testing.assert_allclose(a(d2["features"][i]["kernel"]), w[0], atol=1.5e-4)
    for i in ("3", "6"):
        w = kd.layers[int(i)].get_weights()
        np.testing.assert_allclose(a(ds2["features"][i]["mean"]), w[2], atol=1e-6)
        np.testing.assert_allclose(a(ds2["features"][i]["var"]), w[3], atol=1e-6)
    w = kd.layers[9].get_weights()
    np.testing.assert_allclose(a(d2["dense"]["kernel"]), w[0], atol=1.5e-4)


def test_tf_data_cache_reader_roundtrip(rng_np, tmp_path):
    """Build a cache exactly the DataP2 way (from_generator → save) and read
    it back through data.caching — layout detection included."""
    from celebrity_image_denoiser_tpu.data.caching import (
        TFDataCacheDataset, open_tensor_cache)

    pairs = [
        (rng_np.uniform(-1, 1, (16, 16, 3)).astype(np.float32),
         rng_np.uniform(-1, 1, (16, 16, 3)).astype(np.float32))
        for _ in range(5)
    ]

    def gen():
        yield from pairs

    ds = tf.data.Dataset.from_generator(gen, output_signature=(
        tf.TensorSpec(shape=(16, 16, 3), dtype=tf.float32),
        tf.TensorSpec(shape=(16, 16, 3), dtype=tf.float32)))
    cache_dir = str(tmp_path / "tfcache")
    tf.data.Dataset.save(ds, cache_dir)

    assert TFDataCacheDataset.is_tf_data_cache(cache_dir)
    opened = open_tensor_cache(cache_dir)
    assert isinstance(opened, TFDataCacheDataset)
    assert opened.normalized is True and opened.domain_recorded is True
    assert len(opened) == len(pairs)
    # tf.data.Dataset.save preserves element order for a deterministic
    # source, so the round-trip is exact and ordered
    for i, (n_ref, c_ref) in enumerate(pairs):
        n_got, c_got = opened[i]
        np.testing.assert_array_equal(n_got, n_ref)
        np.testing.assert_array_equal(c_got, c_ref)


def test_tf_data_cache_trains_via_cli(rng_np, tmp_path):
    """The reference cGAN workflow end-to-end: a DataP2-style tf.data cache
    feeds `cli.train --tensor-cache` directly (the reference reloads the
    same cache at training5Pbar.py:230-235)."""
    import subprocess
    import sys

    def gen():
        for _ in range(8):
            c = rng_np.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
            n = np.clip(c + rng_np.normal(0, 0.1, c.shape), -1, 1)
            yield n.astype(np.float32), c

    ds = tf.data.Dataset.from_generator(gen, output_signature=(
        tf.TensorSpec(shape=(32, 32, 3), dtype=tf.float32),
        tf.TensorSpec(shape=(32, 32, 3), dtype=tf.float32)))
    cache_dir = str(tmp_path / "tfcache")
    tf.data.Dataset.save(ds, cache_dir)

    ckpt_dir = str(tmp_path / "ckpts")
    graph_dir = str(tmp_path / "graphs")
    proc = subprocess.run(
        [sys.executable, "-m", "celebrity_image_denoiser_tpu.cli.train",
         "--model", "denoise", "--tensor-cache", cache_dir,
         "--num-epochs", "1", "--batch-size", "4",
         "--image-size", "32", "32",
         "--checkpoint-dir", ckpt_dir, "--graph-dir", graph_dir],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert os.listdir(ckpt_dir), "no checkpoint written"
