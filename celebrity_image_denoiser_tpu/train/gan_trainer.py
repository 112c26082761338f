"""GAN trainers — one jit-compiled step per model family.

Reproduces the four reference training loops as pure jitted functions:

* **denoise** (training.py:394-472): alternating D/G Adam steps.  D sees
  BCE(real→1)+BCE(fake→0) with the fake detached; G then optimizes
  MSE + 0.001·BCE(fake→1) **through the already-updated D** (torch updates D
  first, then computes the G loss with the stepped discriminator,
  training.py:409-426).
* **srgan** (sr_ganTrainGNew.py:377-455): same skeleton, content loss =
  VGG-perceptual MSE (sr_ganTrainGNew.py:403-409).
* **esrgan** (esrgan_train.py:89-176): D loss 0.5·(BCEWithLogits real+fake);
  G = MSE + 1e-3·BCEWithLogits(fake→1).
* **cgan** (training5Pbar.py:77-97): *joint* update — G and D gradients both
  taken against the pre-update parameters (two GradientTapes over one
  forward), G = BCE(fake→1) + 100·MAE.

TPU-native deltas from the reference (all defaults, reference behavior
available as options):
* metrics (PSNR/SSIM) are computed **on device inside the jitted step** and
  returned as scalars — the reference round-trips every batch to CPU numpy
  (training.py:378-392), its biggest throughput sin per SURVEY.md §3.2;
* noise can be injected on device per batch (on_the_fly) instead of reading
  pre-rendered noisy files;
* with a mesh, the step is jitted with NamedShardings: batch sharded over
  the ``data`` axis, params replicated — XLA inserts the psum gradient
  all-reduce over ICI.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from celebrity_image_denoiser_tpu import metrics as M
from celebrity_image_denoiser_tpu.ckpt import checkpoint as ckpt_lib
from celebrity_image_denoiser_tpu.core.config import TrainConfig
from celebrity_image_denoiser_tpu.core import prng
from celebrity_image_denoiser_tpu.data import noise as noise_lib
from celebrity_image_denoiser_tpu.train import losses as L
from celebrity_image_denoiser_tpu.train import optim
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.train")

FAMILIES = ("denoise", "srgan", "esrgan", "cgan", "dncnn")


def family_eval_metrics(family: str, fake, clean):
    """On-device PSNR/SSIM in the family's reference convention — the single
    source of the data_range quirks (2.0 on [-1,1] tanh families; 1.0 on
    clamped [0,1] for esrgan/dncnn; tf.image flavor for cgan).  Used by both
    the jitted train step and evaluate_dataset."""
    if family in ("esrgan", "dncnn"):
        f = jnp.clip(fake, 0.0, 1.0)
        c = jnp.clip(clean, 0.0, 1.0)
        return (jnp.mean(M.psnr(f, c, data_range=1.0)),
                jnp.mean(M.ssim(f, c, data_range=1.0)))
    if family == "cgan":  # tf.image convention, max_val=2.0
        return (jnp.mean(M.psnr(fake, clean, data_range=2.0)),
                jnp.mean(M.ssim_tf(fake, clean, max_val=2.0)))
    return (jnp.mean(M.psnr(fake, clean, data_range=2.0)),
            jnp.mean(M.ssim(fake, clean, data_range=2.0)))


def make_train_step(
    generator,
    discriminator,
    *,
    family: str = "denoise",
    adv_weight: float = 0.001,
    cgan_mae_weight: float = 100.0,
    perceptual: Optional[Callable] = None,
    adam_b1: float = 0.9,
    adam_b2: float = 0.999,
    on_the_fly_noise: bool = False,
    noise_variant: int = 1,
    mesh: Optional[jax.sharding.Mesh] = None,
    data_axis: str = "data",
    donate: bool = True,
    remat: bool = False,
    sr_scale: int = 1,
    dncnn_blind: bool = True,
    extras_fn: Optional[Callable] = None,
    compute_dtype: Optional[str] = None,
):
    """Build (init_fn, step_fn).

    step_fn(carry, noisy, clean, key, lr_g, lr_d) -> (carry, metrics)
    where carry = (g_params, g_state, d_params, d_state, g_opt, d_opt).
    With ``on_the_fly_noise`` the ``noisy`` argument is ignored and noise is
    drawn on device from ``key`` over the clean batch.

    ``extras_fn(fake, clean) -> dict`` (optional): extra per-batch metrics
    computed inside the jitted step in the family's native domain — the
    reference computes LPIPS/MS-SSIM on every batch (training.py:432,
    378-392); this hook does the same without its per-batch CPU round-trip.
    """
    if family not in FAMILIES:
        raise ValueError(f"unknown family {family!r}; choose from {FAMILIES}")
    if family == "srgan" and perceptual is None:
        raise ValueError("srgan family needs a perceptual loss (make_vgg_perceptual)")

    # the reference trains the torch families with torch Adam and the cGAN
    # with tf.keras Adam (training5Pbar.py:166-167) — the two conventions
    # differ in where eps lands (corrected vs uncorrected sqrt(v)) and its
    # default (1e-8 vs 1e-7); both are golden-tested (test_train.py /
    # test_tf_golden.py)
    _adam = optim.adam_keras if family == "cgan" else optim.adam
    _, adam_update = _adam(adam_b1, adam_b2)
    adam_init, _ = _adam(adam_b1, adam_b2)

    # mixed precision (compute_dtype="bfloat16"): model fwd/bwd run in bf16
    # with f32 MXU accumulation (nn layers cast kernels to the input dtype);
    # params, optimizer state, losses and metrics stay f32 — outputs are
    # cast back at the model boundary so everything numeric downstream is
    # unchanged in dtype.
    cdt = None if compute_dtype in (None, "float32") else compute_dtype

    def _wrap(apply):
        if cdt is None:
            return apply

        from celebrity_image_denoiser_tpu.core import dtypes
        from celebrity_image_denoiser_tpu.ops.conv import (
            ad_safe_low_precision,
        )

        def f(p, s, x, train=True):
            # trace-time: convs inside must stay AD-transposable (bf16-out)
            with ad_safe_low_precision():
                y, ns = apply(p, s, dtypes.cast_to(x, cdt), train=train)
            return y.astype(jnp.float32), ns

        return f

    d_apply = _wrap(discriminator.apply) if discriminator is not None else None

    if cdt is not None and perceptual is not None:
        # the frozen VGG content tower must follow the compute dtype too:
        # left f32 it dominates the srgan step's HBM traffic (per-op
        # receipt, kernel_notes.md r5 — the f32 256² ReLU pairs and
        # maxpool select-and-scatter are the tower, not D).  Inputs cast
        # down at the loss boundary (nn layers cast kernels to the input
        # dtype); the scalar loss returns f32 like every other loss here.
        from celebrity_image_denoiser_tpu.core import dtypes
        from celebrity_image_denoiser_tpu.ops.conv import (
            ad_safe_low_precision,
        )

        _base_perceptual = perceptual

        def perceptual(a, b, _p=_base_perceptual):
            with ad_safe_low_precision():
                v = _p(dtypes.cast_to(a, cdt), dtypes.cast_to(b, cdt))
            return v.astype(jnp.float32)

    # generator forward used inside the step (always train mode there); with
    # remat the activations are rematerialized in the backward pass — trades
    # FLOPs for HBM, raising the trainable batch size (jax.checkpoint)
    def _g_fwd(p, s, x):
        return _wrap(generator.apply)(p, s, x, train=True)

    g_fwd = jax.checkpoint(_g_fwd) if remat else _g_fwd

    use_logits = family == "esrgan"
    d_crit = L.bce_with_logits if use_logits else L.bce

    def content_loss(fake, clean):
        if family == "srgan":
            return perceptual(fake, clean)
        if family == "cgan":
            return L.mae(fake, clean)
        return L.mse(fake, clean)

    def eval_metrics(fake, clean):
        return family_eval_metrics(family, fake, clean)

    def step(carry, noisy, clean, key, lr_g, lr_d):
        g_params, g_state, d_params, d_state, g_opt, d_opt = carry

        if on_the_fly_noise:
            # clean arrives in [-1,1]; inject noise in [0,1] domain then
            # renormalize — same convention as the disk pipeline.
            clean01 = clean * 0.5 + 0.5
            if family == "dncnn" and dncnn_blind:
                # blind-σ Gaussian, σ∈[5,50] — the DnCNN training setup
                # (BASELINE config 3); an explicit noise_variant opts back
                # into the 5-type mixture
                noisy01 = noise_lib.blind_gaussian_batch(key, clean01)
            else:
                noisy01 = noise_lib.random_noise_batch(
                    key, clean01, variant=noise_variant)
            if sr_scale > 1:
                # super-resolution families train LR→HR: downscale the noisy
                # side on device (the offline pipeline's LR rendering,
                # sr_ganNoise.py:45-104, done per batch instead)
                n, h, w, c = noisy01.shape
                noisy01 = jax.image.resize(
                    noisy01, (n, h // sr_scale, w // sr_scale, c), "bicubic")
            noisy = noisy01 * 2.0 - 1.0
            if family in ("esrgan", "dncnn"):  # [0,1]-domain families
                noisy, clean = noisy01, clean01

        if family == "dncnn":
            # plain supervised MSE on the residual denoiser (no D)
            def loss_fn(gp):
                fake, gs = g_fwd(gp, g_state, noisy)
                return L.mse(fake, clean), (gs, fake)

            (g_loss, (g_state_new, fake)), g_grads = jax.value_and_grad(
                loss_fn, has_aux=True)(g_params)
            g_params_new, g_opt_new = adam_update(g_grads, g_opt, g_params, lr_g)
            psnr_v, ssim_v = eval_metrics(fake, clean)
            carry = (g_params_new, g_state_new, d_params, d_state, g_opt_new, d_opt)
            out = {"g_loss": g_loss, "d_loss": jnp.zeros(()),
                   "psnr": psnr_v, "ssim": ssim_v}
            if extras_fn is not None:
                out.update(extras_fn(fake, clean))
            return carry, out

        # ---- discriminator loss/grads (fake detached) ----------------------
        fake0, g_state_fake = g_fwd(g_params, g_state, noisy)
        fake_detached = jax.lax.stop_gradient(fake0)

        def d_loss_fn(dp):
            real_pred, ds1 = d_apply(dp, d_state, clean, train=True)
            fake_pred, ds2 = d_apply(dp, ds1, fake_detached, train=True)
            dl = d_crit(real_pred, 1.0) + d_crit(fake_pred, 0.0)
            if family == "esrgan":
                dl = 0.5 * dl  # esrgan_train.py:110
            return dl, ds2

        (d_loss, d_state_after_d), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True)(d_params)

        if family == "cgan":
            # joint update: G grads against the PRE-update discriminator
            def g_loss_fn(gp):
                fake, gs = g_fwd(gp, g_state, noisy)
                fake_pred, _ = d_apply(d_params, d_state_after_d,
                                       fake, train=True)
                gl = d_crit(fake_pred, 1.0) + cgan_mae_weight * content_loss(fake, clean)
                return gl, (gs, fake)

            (g_loss, (g_state_new, fake)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params)
            # the reference's single tape set forwards D exactly twice (real,
            # fake — training5Pbar.py:82-85), so its BN moving stats see two
            # updates per step; the extra D forward above exists only for
            # G's gradient and its state is discarded (one-step golden vs
            # real TF: test_tf_golden.py::test_cgan_train_step_matches_real_tf)
            d_state_new = d_state_after_d
            d_params_new, d_opt_new = adam_update(d_grads, d_opt, d_params, lr_d)
            g_params_new, g_opt_new = adam_update(g_grads, g_opt, g_params, lr_g)
        else:
            # alternating: D steps first, G optimizes through the updated D
            d_params_new, d_opt_new = adam_update(d_grads, d_opt, d_params, lr_d)

            def g_loss_fn(gp):
                fake, gs = g_fwd(gp, g_state, noisy)
                fake_pred, ds = d_apply(d_params_new, d_state_after_d,
                                        fake, train=True)
                gl = content_loss(fake, clean) + adv_weight * d_crit(fake_pred, 1.0)
                return gl, (gs, ds, fake)

            (g_loss, (g_state_new, d_state_new, fake)), g_grads = jax.value_and_grad(
                g_loss_fn, has_aux=True)(g_params)
            g_params_new, g_opt_new = adam_update(g_grads, g_opt, g_params, lr_g)

        psnr_v, ssim_v = eval_metrics(fake, clean)
        carry = (g_params_new, g_state_new, d_params_new, d_state_new,
                 g_opt_new, d_opt_new)
        out = {"g_loss": g_loss, "d_loss": d_loss,
               "psnr": psnr_v, "ssim": ssim_v}
        if extras_fn is not None:
            out.update(extras_fn(fake, clean))
        return carry, out

    # ---- jit with optional DP shardings ------------------------------------
    if mesh is not None:
        repl = NamedSharding(mesh, P())
        batch_sh = NamedSharding(mesh, P(data_axis))
        carry_sh = (repl, repl, repl, repl, repl, repl)
        step = jax.jit(
            step,
            in_shardings=(carry_sh, batch_sh, batch_sh, repl, repl, repl),
            out_shardings=(carry_sh, repl),
            donate_argnums=(0,) if donate else (),
        )
    else:
        step = jax.jit(step, donate_argnums=(0,) if donate else ())

    def init_fn(rng: jax.Array):
        kg, kd = jax.random.split(rng)
        g_params, g_state = generator.init(kg)
        if discriminator is not None:
            d_params, d_state = discriminator.init(kd)
        else:
            d_params, d_state = {}, {}
        g_opt = adam_init(g_params)
        d_opt = adam_init(d_params)
        return (g_params, g_state, d_params, d_state, g_opt, d_opt)

    return init_fn, step


class GANTrainer:
    """Host-side training loop: epochs over a DataPipeline, per-epoch StepLR,
    checkpoint cadence + best-PSNR tracking + metric history + optional
    per-epoch test-image render — the DenoiseGANTrainer contract
    (training.py:230-472) with resume support added."""

    def __init__(
        self,
        generator,
        discriminator,
        pipeline,
        cfg: TrainConfig = TrainConfig(),
        *,
        family: Optional[str] = None,
        perceptual: Optional[Callable] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        test_pair: Optional[Tuple[np.ndarray, np.ndarray]] = None,
        val_pipeline=None,
        extra_metrics=False,
    ):
        self.cfg = cfg
        self.family = family or cfg.model
        self.generator = generator
        self.discriminator = discriminator
        self.pipeline = pipeline
        self.mesh = mesh
        self.test_pair = test_pair
        self.val_pipeline = val_pipeline  # per-epoch validation metrics
        # extra_metrics: False | True/"epoch" (sampled once per epoch on the
        # test pair) | "batch" (computed on EVERY batch inside the jitted
        # step, like the reference's per-batch LPIPS/MS-SSIM history,
        # training.py:432 — but on device, no per-batch CPU round-trip)
        self.extra_metrics = extra_metrics

        from celebrity_image_denoiser_tpu.core.config import FAMILY_NOISE_VARIANT

        extras_fn = None
        if extra_metrics == "batch":
            self._pd = M.PerceptualDistance.default(seed=0)
            fam_b = self.family
            pd_dist = self._pd._distance  # un-jitted body; inlines into the step

            def extras_fn(fake, clean):
                if fam_b in ("esrgan", "dncnn"):
                    f01 = jnp.clip(fake, 0.0, 1.0)
                    c01 = jnp.clip(clean, 0.0, 1.0)
                else:
                    f01 = jnp.clip(fake * 0.5 + 0.5, 0.0, 1.0)
                    c01 = jnp.clip(clean * 0.5 + 0.5, 0.0, 1.0)
                out = {"lpips": jnp.mean(pd_dist(f01, c01))}
                # ms-ssim needs >=176px for its 5 scales (shape is static
                # at trace time); plain SSIM fills the slot below that
                if f01.shape[1] >= 176 and f01.shape[2] >= 176:
                    out["msssim"] = jnp.mean(M.ms_ssim(f01, c01, data_range=1.0))
                else:
                    out["msssim"] = jnp.mean(M.ssim(f01, c01, data_range=1.0))
                return out

        self.init_fn, self.step_fn = make_train_step(
            generator,
            discriminator,
            family=self.family,
            adv_weight=cfg.adv_weight,
            cgan_mae_weight=cfg.cgan_mae_weight,
            perceptual=perceptual,
            adam_b1=cfg.betas[0],
            adam_b2=cfg.betas[1],
            on_the_fly_noise=cfg.on_the_fly_noise,
            noise_variant=cfg.noise_variant
            or FAMILY_NOISE_VARIANT.get(self.family, 1),
            mesh=mesh,
            data_axis=cfg.mesh_axis,
            remat=cfg.remat,
            sr_scale=getattr(generator, "scale_factor", 1)
            if self.family == "srgan" else 1,
            dncnn_blind=cfg.noise_variant is None,
            extras_fn=extras_fn,
            compute_dtype=cfg.compute_dtype,
        )
        # eval fn jitted once (params/state as arguments — a per-call
        # closure would embed them as constants and recompile every epoch)
        fam = self.family

        def _eval_fn(g_params, g_state, noisy, clean):
            fake, _ = generator.apply(g_params, g_state, noisy, train=False)
            return family_eval_metrics(fam, fake, clean)

        self._eval_jit = jax.jit(_eval_fn)
        self.carry = self.init_fn(prng.key(cfg.seed))
        self.schedule_g = optim.step_lr(cfg.lr, cfg.step_lr_step_size, cfg.step_lr_gamma)
        self.schedule_d = optim.step_lr(cfg.lr, cfg.step_lr_step_size, cfg.step_lr_gamma)
        self.start_epoch = 0
        self.best_psnr = 0.0
        self.metric_history: Dict[str, list] = {
            k: [] for k in ("g_loss", "d_loss", "psnr", "ssim", "lpips", "msssim")
        }
        self._key_stream = prng.key_stream(cfg.seed + 1)
        if self.extra_metrics and self.extra_metrics != "batch":
            # shipped trained tower when present, random features otherwise
            self._pd = M.PerceptualDistance.default(seed=0)

    # ---- checkpointing ------------------------------------------------------
    def save_checkpoint(self, epoch: int, is_best: bool = False):
        g_params, g_state, d_params, d_state, g_opt, d_opt = self.carry
        sections = {
            "generator": g_params, "generator_state": g_state,
            "discriminator": d_params, "discriminator_state": d_state,
            "g_optimizer": g_opt._asdict(), "d_optimizer": d_opt._asdict(),
        }
        meta = {
            "epoch": epoch,
            "best_psnr": self.best_psnr,
            "metric_history": self.metric_history,
            "family": self.family,
        }
        # cadence mirrors training.py:372 (first | last | even epochs);
        # serialization runs off-thread so the next epoch starts immediately
        if epoch == 0 or epoch == self.cfg.num_epochs - 1 or epoch % 2 == 0:
            path = os.path.join(self.cfg.checkpoint_dir, f"{self.family}_epoch_{epoch}")
            ckpt_lib.save_checkpoint(path, sections, meta, async_write=True)
        if is_best:
            path = os.path.join(self.cfg.checkpoint_dir, "best",
                                f"{self.family}_epoch_{epoch}")
            ckpt_lib.save_checkpoint(path, sections, meta, async_write=True)

    def resume(self, path: Optional[str] = None) -> int:
        """Restore trainer state; returns the next epoch to run.  This is
        the capability the reference lacks (SURVEY.md §5: save-only)."""
        if path is None:
            path = ckpt_lib.latest_checkpoint(self.cfg.checkpoint_dir,
                                              prefix=f"{self.family}_")
        if path is None:
            return 0
        sections, meta = ckpt_lib.load_checkpoint(path)
        g_params, g_state, d_params, d_state, g_opt, d_opt = self.carry

        def overlay(new, old):
            return new if new is not None else old

        g_params = sections.get("generator", g_params)
        g_state = sections.get("generator_state", g_state) or g_state
        d_params = sections.get("discriminator", d_params)
        d_state = sections.get("discriminator_state", d_state) or d_state
        for name, tgt in (("g_optimizer", g_opt), ("d_optimizer", d_opt)):
            sec = sections.get(name)
            if sec:
                st = optim.AdamState(step=jnp.asarray(sec["step"]),
                                     mu=sec.get("mu", tgt.mu),
                                     nu=sec.get("nu", tgt.nu))
                if name == "g_optimizer":
                    g_opt = st
                else:
                    d_opt = st
        self.carry = (g_params, g_state, d_params, d_state, g_opt, d_opt)
        self.best_psnr = float(meta.get("best_psnr", 0.0))
        hist = meta.get("metric_history")
        if hist:
            self.metric_history = {k: list(v) for k, v in hist.items()}
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        logger.info("resumed from %s at epoch %d", path, self.start_epoch)
        return self.start_epoch

    # ---- evaluation helpers -------------------------------------------------
    def generate(self, noisy: np.ndarray) -> np.ndarray:
        g_params, g_state = self.carry[0], self.carry[1]
        y, _ = self.generator.apply(g_params, g_state, jnp.asarray(noisy), train=False)
        return np.asarray(y)

    def evaluate_dataset(self, pipeline) -> Dict[str, float]:
        """Full held-out evaluation pass: mean PSNR/SSIM over a pipeline of
        (noisy, clean) batches, on device with the family's data_range
        convention.  (The reference only ever evaluates on train batches
        inside the loop, training.py:432; this is the proper eval the
        framework adds.)"""
        g_params, g_state = self.carry[0], self.carry[1]
        vals = []
        for batch in pipeline:
            if not isinstance(batch, tuple):
                raise ValueError(
                    "evaluate_dataset needs (noisy, clean) pair batches; a "
                    "clean-only pipeline would measure identity "
                    "reconstruction, not denoising — build val pairs with "
                    "data.noise or a PairedImageDataset")
            noisy, clean = batch
            vals.append(self._eval_jit(g_params, g_state, noisy, clean))
        if not vals:
            return {"psnr": 0.0, "ssim": 0.0, "batches": 0}
        arr = np.asarray(jax.device_get(vals), np.float64)
        return {"psnr": float(arr[:, 0].mean()),
                "ssim": float(arr[:, 1].mean()),
                "batches": len(vals)}

    def test_random_images(self, epoch: int):
        """Per-epoch visual spot-check on the held-out test pair.  Denoise/
        SRGAN families render the labeled noisy/denoised side-by-side JPEG
        (``test_random_images``, training.py:322-357); ESRGAN/cGAN families
        render the noisy/generated/clean triptych their reference trainers
        save (esrgan_train.py:71-81, training5Pbar.py:112-128)."""
        if self.test_pair is None:
            logger.info("No test image selected for testing.")
            return None
        from celebrity_image_denoiser_tpu.viz.side_by_side import (
            combine_test_images,
            triptych,
        )

        noisy, clean = self.test_pair
        noisy_b = noisy[None] if noisy.ndim == 3 else noisy
        clean0 = clean if clean.ndim == 3 else clean[0]
        fake = self.generate(noisy_b)[0]
        if self.family in ("esrgan", "dncnn"):  # [0,1]-domain families
            denoised01, noisy01, clean01 = fake, noisy_b[0], clean0
        else:  # tanh families train in [-1,1]
            denoised01 = fake * 0.5 + 0.5
            noisy01 = noisy_b[0] * 0.5 + 0.5
            clean01 = clean0 * 0.5 + 0.5
        os.makedirs(self.cfg.test_image_dir, exist_ok=True)
        if self.family in ("esrgan", "cgan"):
            out_path = os.path.join(self.cfg.test_image_dir,
                                    f"testimg_epoch{epoch}.png")
            triptych(noisy01, denoised01, clean01, out_path)
        else:
            denoised_u8 = np.clip(denoised01 * 255, 0, 255).astype(np.uint8)
            noisy_u8 = np.clip(noisy01 * 255, 0, 255).astype(np.uint8)
            combined = combine_test_images(noisy_u8, denoised_u8)
            out_path = os.path.join(self.cfg.test_image_dir,
                                    f"testimg_epoch{epoch}.jpg")
            combined.save(out_path)
        logger.info("Saved test image: %s", out_path)
        return out_path

    def _epoch_extras(self) -> Tuple[float, float]:
        """Per-epoch LPIPS-style + MS-SSIM on the held-out test pair
        (reference computes them per batch; we sample per epoch)."""
        if not self.extra_metrics or self.test_pair is None:
            return 0.0, 0.0
        noisy, clean = self.test_pair
        fake = self.generate(noisy[None] if noisy.ndim == 3 else noisy)
        cb = clean[None] if clean.ndim == 3 else clean
        if self.family in ("esrgan", "dncnn"):  # already [0,1]
            f01 = np.clip(fake, 0, 1)
            c01 = np.clip(cb, 0, 1)
        else:
            f01 = np.clip(fake * 0.5 + 0.5, 0, 1)
            c01 = np.clip(cb * 0.5 + 0.5, 0, 1)
        lp = float(np.mean(np.asarray(self._pd(jnp.asarray(f01), jnp.asarray(c01)))))
        ms = 0.0
        if f01.shape[1] >= 176 and f01.shape[2] >= 176:
            ms = float(np.mean(np.asarray(M.ms_ssim(jnp.asarray(f01), jnp.asarray(c01),
                                                    data_range=1.0))))
        return lp, ms

    # ---- the loop -------------------------------------------------------------
    def train(self, epoch_callback: Optional[Callable] = None):
        try:
            return self._train_loop(epoch_callback)
        finally:
            # flush async checkpoint writers even on exception/Ctrl-C so an
            # in-flight save can't be killed mid-write (writes are atomic,
            # but a lost save means losing that resume point)
            ckpt_lib.wait_for_saves()

    def _train_loop(self, epoch_callback: Optional[Callable] = None):
        cfg = self.cfg
        for epoch in range(self.start_epoch, cfg.num_epochs):
            lr_g = jnp.asarray(self.schedule_g(epoch), jnp.float32)
            lr_d = jnp.asarray(self.schedule_d(epoch), jnp.float32)
            # metrics stay on device during the epoch — no per-step host sync
            # (float() would block the async dispatch pipeline each batch)
            step_metrics = []
            n_batches = 0
            t0 = time.perf_counter()
            for batch in self.pipeline:
                if isinstance(batch, tuple):
                    noisy, clean = batch
                else:
                    clean = batch
                    noisy = clean  # on-the-fly path ignores it
                key = next(self._key_stream)
                self.carry, m = self.step_fn(self.carry, noisy, clean, key, lr_g, lr_d)
                step_metrics.append(m)
                n_batches += 1
            if n_batches:
                stacked = jax.device_get(
                    jax.tree.map(lambda *xs: jnp.stack(xs), *step_metrics))
                sums = {k: float(np.sum(v)) for k, v in stacked.items()}
            dt = time.perf_counter() - t0
            if n_batches == 0:
                logger.warning("Epoch [%d/%d] No valid batches processed.",
                               epoch + 1, cfg.num_epochs)
                continue
            avgs = {k: v / n_batches for k, v in sums.items()}
            if not all(np.isfinite(v) for v in avgs.values()):
                # failure detection: a NaN/Inf epoch means diverged training;
                # stop before the bad params overwrite good checkpoints (the
                # last saved checkpoint remains the resume point).  Isolate
                # the faulting op with utils.profiling.debug_nans.
                logger.error(
                    "Epoch [%d/%d] produced non-finite metrics %s — stopping "
                    "(resume from the last checkpoint).",
                    epoch + 1, cfg.num_epochs, avgs)
                break
            if self.extra_metrics == "batch":
                # per-batch values were computed inside the jitted step;
                # the epoch entry is their mean (curves are populated, not 0)
                lp, ms = avgs.get("lpips", 0.0), avgs.get("msssim", 0.0)
            else:
                lp, ms = self._epoch_extras()
            self.metric_history["g_loss"].append(avgs["g_loss"])
            self.metric_history["d_loss"].append(avgs["d_loss"])
            self.metric_history["psnr"].append(avgs["psnr"])
            self.metric_history["ssim"].append(avgs["ssim"])
            self.metric_history["lpips"].append(lp)
            self.metric_history["msssim"].append(ms)
            logger.info(
                "Epoch [%d/%d] G %.4f D %.4f | PSNR %.3f SSIM %.4f | %.1f img/s",
                epoch + 1, cfg.num_epochs, avgs["g_loss"], avgs["d_loss"],
                avgs["psnr"], avgs["ssim"],
                n_batches * cfg.batch_size / max(dt, 1e-9),
            )
            if self.val_pipeline is not None:
                # per-epoch validation like the cGAN trainer's test_model
                # (training5Pbar.py:196), but over the full val split
                val = self.evaluate_dataset(self.val_pipeline)
                logger.info("Epoch [%d/%d] val PSNR %.3f SSIM %.4f (%d batches)",
                            epoch + 1, cfg.num_epochs, val["psnr"],
                            val["ssim"], val["batches"])
            if self.test_pair is not None:
                self.test_random_images(epoch)
            is_best = avgs["psnr"] > self.best_psnr
            if is_best:
                self.best_psnr = avgs["psnr"]
            self.save_checkpoint(epoch, is_best)
            if epoch_callback is not None:
                epoch_callback(self, epoch, avgs)
        return self.metric_history
