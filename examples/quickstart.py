"""End-to-end quickstart: synthetic faces → render noise → train → evaluate
→ single-image denoise → (optionally) serve.

Runs anywhere (CPU or TPU); sizes are tiny so it finishes in ~2 minutes.

    python examples/quickstart.py --workdir /tmp/cid_quickstart
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

# allow running straight from a source checkout without pip install
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/cid_quickstart")
    ap.add_argument("--epochs", type=int, default=2)
    args = ap.parse_args()
    wd = args.workdir

    from celebrity_image_denoiser_tpu import models
    from celebrity_image_denoiser_tpu.core.config import TrainConfig
    from celebrity_image_denoiser_tpu.data import imageio
    from celebrity_image_denoiser_tpu.data.datasets import CleanImageDataset
    from celebrity_image_denoiser_tpu.data.pipeline import DataPipeline
    from celebrity_image_denoiser_tpu.train.gan_trainer import GANTrainer
    from celebrity_image_denoiser_tpu.viz.training_plots import plot_metrics

    # 1. synthetic "celebrity" dataset: smooth random blobs (stand-in faces)
    clean_dir = os.path.join(wd, "Clean_dataset", "person0")
    os.makedirs(clean_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(16):
        low = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
        img = np.asarray(
            np.kron(low, np.ones((8, 8, 1))), dtype=np.uint8)  # 64×64 smooth
        imageio.imwrite(os.path.join(clean_dir, f"face{i}.png"), img)
    print(f"[1/5] wrote 16 synthetic faces under {clean_dir}")

    # 2. train the flagship denoise GAN with on-device noise injection
    # (normalize=True -> [-1,1]; DataPipeline batches through the native C++
    # stage when it builds)
    ds = CleanImageDataset(os.path.join(wd, "Clean_dataset"),
                           image_size=(64, 64), normalize=True)

    cfg = TrainConfig(model="denoise", num_epochs=args.epochs, batch_size=4,
                      image_size=(64, 64), on_the_fly_noise=True,
                      checkpoint_dir=os.path.join(wd, "checkpoint"),
                      graph_dir=os.path.join(wd, "graphs"),
                      test_image_dir=os.path.join(wd, "testImage"))
    trainer = GANTrainer(models.DenoiseGenerator(), models.DenoiseDiscriminator(),
                         DataPipeline(ds, cfg.batch_size), cfg)
    history = trainer.train()
    plot_metrics(history, cfg.graph_dir)
    print(f"[2/5] trained {args.epochs} epochs; PSNR history: "
          f"{[round(p, 2) for p in history['psnr']]}")

    # 3. held-out evaluation with on-the-fly noise pairs — the ACTUAL
    # held-out split (ds[i] serves train images; test_paths is the 20%)
    import jax

    from celebrity_image_denoiser_tpu.data import noise as noise_lib

    test = np.stack([
        imageio.to_float01(imageio.imread_rgb(p, (64, 64)))
        for p in ds.test_paths[:4]
    ])
    noisy01 = np.asarray(noise_lib.random_noise_batch(
        jax.random.PRNGKey(1), test, variant=1))
    from celebrity_image_denoiser_tpu import metrics
    import jax.numpy as jnp

    fake = trainer.generate(noisy01 * 2 - 1)
    f01 = np.clip(fake * 0.5 + 0.5, 0, 1)
    psnr = float(np.mean(np.asarray(metrics.psnr(jnp.asarray(f01),
                                                 jnp.asarray(test), data_range=1.0))))
    print(f"[3/5] held-out denoised PSNR: {psnr:.2f} dB")

    # 4. single-image denoise to disk
    out_path = os.path.join(wd, "denoised_example.png")
    imageio.imwrite(out_path, (f01[0] * 255).astype(np.uint8))
    print(f"[4/5] wrote {out_path}")

    # 5. export serving weights in the layout ServeState loads
    # (weights/denoise_epoch_499.pth, the reference filename)
    from celebrity_image_denoiser_tpu.ckpt import save_pth

    weights_dir = os.path.join(wd, "weights")
    os.makedirs(weights_dir, exist_ok=True)
    try:
        save_pth(trainer.generator, trainer.carry[0], trainer.carry[1],
                 os.path.join(weights_dir, "denoise_epoch_499.pth"),
                 key="generator")
        print(f"[5/5] serve it: python -m celebrity_image_denoiser_tpu.cli.serve "
              f"--weights-dir {weights_dir} --port 8000   # then open /ui")
    except ImportError:
        print("[5/5] (torch not installed — skipping .pth export; serving "
              "would use random init)")


if __name__ == "__main__":
    main()
