"""celebrity_image_denoiser_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image
restoration framework with the full capability surface of the reference
flawyer/Celebrity-Image-Denoiser project, re-designed TPU-first.

Conventions
-----------
* Activations are **NHWC** (TPU-native layout); conv kernels are **HWIO**.
* Everything compute-side is functional: models are `(params, state, x) -> (y,
  state)`; training steps are pure functions under `jax.jit`.
* Multi-chip execution goes through `parallel/` — `jax.sharding.Mesh` + pjit
  shardings with explicit XLA collectives (psum / all_gather / ppermute), not
  host-side communication.

Subpackages
-----------
core      dtypes, PRNG handling, global configuration
ops       conv / pool / norm / resize primitives (XLA) + Pallas TPU kernels
nn        minimal functional module system (init/apply) used by all models
models    denoise U-Net, SRGAN, ESRGAN, cGAN (Keras-arch + torch-arch), DnCNN
data      noise synthesis (3 reference variants), datasets, host pipeline
parallel  mesh setup, data-parallel training, halo-exchange tiled inference
train     first-party Adam/StepLR, GAN losses, jit-compiled GAN trainers
metrics   PSNR / SSIM / MS-SSIM (reference data_range quirks preserved)
ckpt      native checkpoint save/restore + .pth / .keras importers
serve     HTTP serving with the reference's exact /enhance response contract
viz       per-request analysis graphs + training-history plots
cli       train / eval / noise-gen / serve / bench entry points
"""

__version__ = "0.1.0"

from celebrity_image_denoiser_tpu.core import config  # noqa: F401
