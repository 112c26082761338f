"""Train the shipped serving checkpoints (weights/) on the TPU.

The reference ships pretrained weights and loads them at server import
(backend/app.py:221-225,319-345).  This container has no image corpus and no
egress, so the committed checkpoints are trained here on images synthesized
*on device* (data/synthetic.py) with the reference noise models injected on
device too — the host never ships a single training image over the ~25 MB/s
axon tunnel.

Each family trains with the framework's own jitted GAN step
(train/gan_trainer.py::make_train_step), wrapped in a lax.scan so one device
call runs ``--chunk`` optimizer steps back-to-back (the per-call tunnel
round-trip would otherwise dominate).

    python scripts/train_serving_weights.py --family dncnn --steps 2000
    python scripts/train_serving_weights.py --family perceptual --steps 1500
    python scripts/train_serving_weights.py --family srgan \
        --perceptual weights/perceptual

``--family perceptual`` trains the VGG16-features[:16] tower (models/vgg.py)
as the encoder of a denoising autoencoder over the same synthetic corpus:
features must retain clean content while discarding distortions — the
property SRGAN's content loss (sr_ganTrainGNew.py:83-93) and the LPIPS-style
metric need.  It is committed as ``weights/perceptual`` and clearly labeled
synthetic-DAE, not ImageNet VGG.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if os.path.isdir(os.path.join(_REPO, "celebrity_image_denoiser_tpu")):
    sys.path.insert(0, _REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from celebrity_image_denoiser_tpu import metrics as MX  # noqa: E402
from celebrity_image_denoiser_tpu import models as M  # noqa: E402
from celebrity_image_denoiser_tpu import nn  # noqa: E402
from celebrity_image_denoiser_tpu.ckpt import checkpoint as ckpt_lib  # noqa: E402
from celebrity_image_denoiser_tpu.core import prng  # noqa: E402
from celebrity_image_denoiser_tpu.core.config import FAMILY_NOISE_VARIANT  # noqa: E402
from celebrity_image_denoiser_tpu.core import compile_cache  # noqa: E402
from celebrity_image_denoiser_tpu.data import noise as noise_lib  # noqa: E402
from celebrity_image_denoiser_tpu.data.synthetic import synth_clean_batch  # noqa: E402
from celebrity_image_denoiser_tpu.train import optim  # noqa: E402
from celebrity_image_denoiser_tpu.train.gan_trainer import make_train_step  # noqa: E402

compile_cache.enable()  # retrain reruns skip the ~10-min remote compiles


def build_models(family: str, size: int):
    if family == "denoise":
        return M.DenoiseGenerator(), M.DenoiseDiscriminator()
    if family == "dncnn":
        return M.DnCNN(), None
    if family == "srgan":
        return M.SRGANGenerator(scale_factor=4), M.SRGANDiscriminator()
    if family == "esrgan":
        return (M.ESRGANGenerator(num_residuals=8),
                M.ESRGANDiscriminator(input_hw=(size, size)))
    if family == "cgan":
        raise ValueError(
            "the served cGAN is the shipped Keras checkpoint "
            "(weights/cgan_epoch_500.keras), copied not trained; the torch "
            "arch is a label->image fallback that cannot train as a denoiser "
            "(models/cgan_torch.py image-cond path reproduces the "
            "reference's channel-mismatch crash)")
    raise ValueError(family)


def load_perceptual(path: str):
    from celebrity_image_denoiser_tpu.train.losses import make_vgg_perceptual

    vgg = M.VGGFeatures()
    vp, vs = vgg.init(prng.key(99))
    trained = False
    if not path:
        cand = os.path.join(_REPO, "weights", "perceptual")
        path = cand if os.path.isdir(cand) else None
    if path:
        sections, _ = ckpt_lib.load_checkpoint(path)
        trained = "vgg" in sections  # only a real tower flips the domain
        vp = sections.get("vgg", vp)
        vs = sections.get("vgg_state", vs) or vs
        if trained:
            print(f"perceptual: loaded trained tower from {path}")
    if not trained:
        print("perceptual: WARNING random-init VGG features")
    # the DAE tower was trained on raw [0,1] inputs -> map the trainer's
    # [-1,1] tensors back to its domain
    return make_vgg_perceptual(vgg, vp, vs, to_unit=trained)


def srgan_pretrain(gen, args):
    """Stage 1 of the real SRGAN recipe: pixel-MSE pretrain of G alone (the
    SRResNet stage).  The reference trains perceptual+adversarial from
    scratch (sr_ganTrainGNew.py:403-409), which lands below the bicubic PSNR
    baseline; the published SRGAN recipe initializes G from an MSE pretrain
    so the adversarial fine-tune starts above bicubic and stays there.
    Returns (g_params, g_state).

    ``--pretrain-ckpt DIR``: cache — load stage-1 weights from DIR when
    present, else train and save there.  The r4 fine-tune frontier sweep
    (VERDICT r3 next #5) reuses ONE 120k-step pretrain across every
    stage-2 configuration."""
    if args.pretrain_ckpt and os.path.isdir(args.pretrain_ckpt):
        sections, meta = ckpt_lib.load_checkpoint(args.pretrain_ckpt)
        if "generator" in sections:
            print(f"[srgan-pretrain] loaded cached stage-1 from "
                  f"{args.pretrain_ckpt} ({meta.get('steps', '?')} steps)")
            return sections["generator"], sections.get("generator_state")
    size, batch = args.size, args.batch
    adam_init, adam_update = optim.adam()
    gp, gs = gen.init(prng.key(args.seed))
    opt = adam_init(gp)

    def loss_fn(gp, gs, key):
        kd, kn = jax.random.split(key)
        clean01 = synth_clean_batch(kd, batch, size)
        noisy01 = noise_lib.random_noise_batch(
            kn, clean01, variant=FAMILY_NOISE_VARIANT.get("srgan", 2))
        n, h, w, c = noisy01.shape
        lr01 = jax.image.resize(noisy01, (n, h // 4, w // 4, c), "bicubic")
        fake, gs2 = gen.apply(gp, gs, lr01 * 2.0 - 1.0, train=True)
        return jnp.mean((fake - (clean01 * 2.0 - 1.0)) ** 2), gs2

    def chunk(carry, key, lr):
        def body(c, k):
            gp, gs, opt = c
            (mse, gs2), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gp, gs, k)
            gp2, opt2 = adam_update(grads, opt, gp, lr)
            return (gp2, gs2, opt2), mse

        return jax.lax.scan(body, carry, jax.random.split(key, args.chunk))

    chunk = jax.jit(chunk, donate_argnums=(0,))
    carry = (gp, gs, opt)
    n_chunks = max(1, args.pretrain_steps // args.chunk)
    for i in range(n_chunks):
        frac = i / n_chunks
        lr = args.lr * (1.0 if frac < 0.6 else 0.5 if frac < 0.85 else 0.25)
        t0 = time.perf_counter()
        carry, mses = chunk(carry, prng.key(500 + i), jnp.float32(lr))
        last = float(np.asarray(jax.device_get(mses[-1])))  # fences
        dt = time.perf_counter() - t0
        print(f"[srgan-pretrain] chunk {i + 1}/{n_chunks} "
              f"steps {(i + 1) * args.chunk}  mse {last:.5f}  "
              f"{args.chunk * batch / dt:.0f} img/s", flush=True)
    if args.pretrain_ckpt:
        ckpt_lib.save_checkpoint(
            args.pretrain_ckpt,
            {"generator": carry[0], "generator_state": carry[1]},
            meta={"family": "srgan-stage1", "steps": n_chunks * args.chunk,
                  "batch": batch, "size": size, "lr": args.lr})
        print(f"[srgan-pretrain] cached stage-1 at {args.pretrain_ckpt}")
    return carry[0], carry[1]


def train_family(args) -> None:
    family = args.family
    size, batch = args.size, args.batch
    gen, disc = build_models(family, size)
    perceptual = (load_perceptual(args.perceptual)
                  if family == "srgan" else None)
    pretrained_g = None
    if family == "srgan" and args.pretrain_steps > 0:
        pretrained_g = srgan_pretrain(gen, args)
        report = evaluate(family, gen, *pretrained_g, size)
        print(f"[srgan-pretrain] held-out after stage 1: {report}")
        if args.pixel_anchor > 0:
            # the reference balances perceptual vs 0.001·adv with huge
            # unnormalized ImageNet-VGG magnitudes (sr_ganTrainGNew.py:
            # 403-409); our trained tower's distances are ~1e-3-scale, so
            # the adv term would dominate and erase the stage-1 PSNR win.
            # A pixel-MSE anchor in the content loss restores the balance
            # (ESRGAN-style L1+perceptual+adv content); the framework's
            # parity train step is untouched — this composes through the
            # `perceptual` callable hook.
            base_perc, w = perceptual, args.pixel_anchor

            def perceptual(f, c):  # noqa: F811
                return base_perc(f, c) + w * jnp.mean((f - c) ** 2)
    init_fn, step_fn = make_train_step(
        gen, disc, family=family,
        perceptual=perceptual,
        on_the_fly_noise=True,
        noise_variant=FAMILY_NOISE_VARIANT.get(family, 1),
        donate=False,
        sr_scale=4 if family == "srgan" else 1,
    )

    # EMA of G during the adversarial fine-tune (VERDICT r3 next #5): the
    # short stage-2 walk is noisy — averaging the trajectory keeps most of
    # the stage-1 PSNR while the raw weights chase the perceptual/adv
    # gradient.  Both endpoints are evaluated; the better-PSNR one ships.
    ema_decay = (args.ema if (family == "srgan" and pretrained_g is not None)
                 else 0.0)

    def chunk(carry, key, lr):
        def body(c, k):
            kd, kn = jax.random.split(k)
            clean = synth_clean_batch(kd, batch, size) * 2.0 - 1.0
            c, m = step_fn(c, clean, clean, kn, lr, lr)
            return c, m

        return jax.lax.scan(body, carry, jax.random.split(key, args.chunk))

    def chunk_ema(carry_ema, key, lr):
        def body(ce, k):
            c, e = ce
            kd, kn = jax.random.split(k)
            clean = synth_clean_batch(kd, batch, size) * 2.0 - 1.0
            c, m = step_fn(c, clean, clean, kn, lr, lr)
            e = jax.tree.map(
                lambda a, b: a * ema_decay + b * (1.0 - ema_decay), e, c[0])
            return (c, e), m

        return jax.lax.scan(body, carry_ema, jax.random.split(key, args.chunk))

    carry = init_fn(prng.key(args.seed))
    if pretrained_g is not None:
        # stage 2 (adversarial fine-tune) starts from the stage-1 G; the
        # G optimizer restarts fresh (standard SRGAN fine-tune practice)
        carry = (pretrained_g[0], pretrained_g[1]) + carry[2:]
    base_lr = args.lr
    if pretrained_g is not None:  # adversarial fine-tune: gentler steps
        base_lr = args.finetune_lr or args.lr / 4
    ema_params = None
    if ema_decay > 0:
        # real copies: donated buffers must not alias the live carry
        ema_params = jax.tree.map(jnp.copy, carry[0])
        step = jax.jit(chunk_ema, donate_argnums=(0,))
    else:
        step = jax.jit(chunk, donate_argnums=(0,))
    n_chunks = max(1, args.steps // args.chunk)
    t_start = time.perf_counter()
    for i in range(n_chunks):
        # simple decay: full lr for 60%, /2 to 85%, /4 after
        frac = i / n_chunks
        lr = base_lr * (1.0 if frac < 0.6 else 0.5 if frac < 0.85 else 0.25)
        t0 = time.perf_counter()
        if ema_decay > 0:
            (carry, ema_params), m = step((carry, ema_params),
                                          prng.key(1000 + i), jnp.float32(lr))
        else:
            carry, m = step(carry, prng.key(1000 + i), jnp.float32(lr))
        psnr = float(np.asarray(jax.device_get(m["psnr"][-1])))  # fences
        dt = time.perf_counter() - t0
        print(f"[{family}] chunk {i + 1}/{n_chunks} "
              f"steps {(i + 1) * args.chunk}  psnr {psnr:.2f}  "
              f"g {float(np.asarray(m['g_loss'][-1])):.4f}  "
              f"{args.chunk * batch / dt:.0f} img/s", flush=True)
    ema_selected = False
    if ema_decay > 0:
        raw_rep = evaluate(family, gen, carry[0], carry[1], size)
        ema_rep = evaluate(family, gen, ema_params, carry[1], size)
        print(f"[{family}] stage-2 raw: {raw_rep}")
        print(f"[{family}] stage-2 EMA({ema_decay}): {ema_rep}")
        if ema_rep["gain_db"] > raw_rep["gain_db"]:
            carry = (ema_params,) + carry[1:]
            ema_selected = True

    # ---- held-out check: does the generator beat its input? ----------------
    report = evaluate(family, gen, carry[0], carry[1], size)
    print(f"[{family}] held-out: {report}")
    out = os.path.join(args.out, family)
    ckpt_lib.save_checkpoint(
        out,
        {"generator": carry[0], "generator_state": carry[1]},
        meta={"family": family, "steps": n_chunks * args.chunk,
              "pretrain_steps": args.pretrain_steps,
              "batch": batch, "size": size, "lr": args.lr,
              # the lr the recorded `steps` actually ran at — for srgan
              # stage 2 this is the gentle fine-tune lr, NOT `lr` (which is
              # the stage-1/pretrain lr); reproducing from `lr` alone gives
              # the PSNR collapse the gentle rate exists to avoid
              "stage_lr": float(base_lr),
              "data": "synthetic-v1 (data/synthetic.py), on-device",
              **({"ema": ema_decay, "ema_selected": ema_selected}
                 if ema_decay > 0 else {}),
              **report},
    )
    ckpt_lib.wait_for_saves()
    print(f"[{family}] saved {out}  "
          f"({time.perf_counter() - t_start:.0f}s total)")

    # ---- record the acceptance margin: fixture gain through the FULL
    # serving path (serve/quality.py).  The test gates assert >=70% of this
    # value, so every retrain refreshes its own gate floor (VERDICT r3 #3).
    try:
        import json

        from celebrity_image_denoiser_tpu.serve import quality
        from celebrity_image_denoiser_tpu.serve.handlers import ServeState

        st = ServeState(weights_dir=args.out)
        fg = quality.fixture_gain_db(st, family)
        meta_path = os.path.join(out, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["fixture_gain_db"] = round(fg, 3)
        if family == "srgan":
            # srgan additionally records the bicubic-relative BATTERY margin
            # (the held-out eval corpus through serving): the single fixture
            # under-measures it, leaving the gate floor too loose to catch a
            # ~60% quality loss (VERDICT r4 weak #6)
            bg = quality.srgan_battery_gain_db(st)
            meta["battery_gain_db"] = round(bg, 3)
            print(f"[srgan] serving battery gain over bicubic {bg:+.2f} dB "
                  f"recorded (gate floor {quality.GATE_FRACTION * bg:+.2f})")
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        floor = quality.GATE_FRACTION * fg
        print(f"[{family}] serving-fixture gain {fg:+.2f} dB recorded "
              f"(gate floor becomes {floor:+.2f} dB)")
    except Exception as e:
        print(f"[{family}] WARNING: fixture-gain recording failed ({e}); "
              "the margin gate will fall back to the previous recording")


def qat_finetune(args) -> None:
    """Quantization-aware fine-tune of an EXISTING checkpoint (``--qat-steps``).

    Starts from ``weights/<family>`` (or ``--init-from``) and fine-tunes the
    generator with the int8 serving arithmetic simulated in the loss
    (ops/quant.py::fake_quant — STE rounding, per-channel folded scales):

        L = MSE(float, clean) + MSE(fakequant, clean)
            + qat_agree · MSE(fakequant, float)

    The agreement term directly optimizes what the serving runtime gate
    measures (int8-vs-float agreement, serve/handlers.py ``agreement_db``).
    BatchNorm runs frozen (eval mode) on both branches — standard QAT
    practice, and it keeps the two branches' normalization identical so the
    agreement term sees only quantization error.

    Exists for the r4 ESRGAN trunk regression (kernel_notes.md): the
    28k-step checkpoint's residual trunk outgrew 8 bits, failing the
    all-int8 program's 40 dB gate; a short QAT fine-tune restores it."""
    family = args.family
    if family not in ("denoise", "dncnn", "esrgan"):
        # the QAT loss assumes a same-resolution image->image generator with
        # an apply(params, state, x) signature; srgan (x4 LR->HR) and cgan
        # (latent/cond inputs) would crash deep inside tracing instead
        raise SystemExit(
            "--qat-steps supports denoise/dncnn/esrgan (same-resolution "
            f"image-to-image generators), not {family!r}")
    size, batch = args.size, args.batch
    gen, _ = build_models(family, size)
    src = args.init_from or os.path.join(args.out, family)
    sections, src_meta = ckpt_lib.load_checkpoint(src)
    if "generator" not in sections:
        raise SystemExit(f"--qat-steps needs an existing checkpoint at {src}")
    gp = sections["generator"]
    gs = sections.get("generator_state")
    if gs is None:
        # state-less checkpoints (denoise/dncnn: no BN) save no state
        # section; apply() still needs the (empty) state tree
        _, gs = gen.init(prng.key(0))
    print(f"[{family}-qat] fine-tuning from {src} "
          f"({src_meta.get('steps', '?')} steps, "
          f"gain {src_meta.get('gain_db', '?')} dB)")
    from celebrity_image_denoiser_tpu.ops import quant

    adam_init, adam_update = optim.adam()
    opt = adam_init(gp)
    tanh = family in ("denoise", "srgan")
    variant = FAMILY_NOISE_VARIANT.get(family, 1)

    def loss_fn(gp, key):
        kd, kn = jax.random.split(key)
        clean01 = synth_clean_batch(kd, batch, size)
        if family == "dncnn":
            noisy01 = noise_lib.blind_gaussian_batch(kn, clean01)
        else:
            noisy01 = noise_lib.random_noise_batch(kn, clean01,
                                                   variant=variant)
        if tanh:
            xin, target = noisy01 * 2.0 - 1.0, clean01 * 2.0 - 1.0
        else:
            xin, target = noisy01, clean01
        yf, _ = gen.apply(gp, gs, xin, train=False)
        with quant.fake_quant():
            yq, _ = gen.apply(gp, gs, xin, train=False)
        mse_f = jnp.mean((yf - target) ** 2)
        mse_q = jnp.mean((yq - target) ** 2)
        agree = jnp.mean((yq - yf) ** 2)
        return mse_f + mse_q + args.qat_agree * agree, (mse_f, mse_q, agree)

    def chunk(carry, key, lr):
        def body(c, k):
            gp, opt = c
            (_, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(gp, k)
            gp2, opt2 = adam_update(grads, opt, gp, lr)
            return (gp2, opt2), aux

        return jax.lax.scan(body, carry, jax.random.split(key, args.chunk))

    chunk = jax.jit(chunk, donate_argnums=(0,))
    carry = (gp, opt)
    n_chunks = max(1, args.qat_steps // args.chunk)
    lr0 = args.qat_lr
    t_start = time.perf_counter()
    for i in range(n_chunks):
        frac = i / n_chunks
        lr = lr0 * (1.0 if frac < 0.6 else 0.5 if frac < 0.85 else 0.25)
        t0 = time.perf_counter()
        carry, aux = chunk(carry, prng.key(3000 + i), jnp.float32(lr))
        mf, mq, ag = (float(np.asarray(jax.device_get(a[-1]))) for a in aux)
        agree_db = 10.0 * np.log10(
            ((2.0 if tanh else 1.0) ** 2) / max(ag, 1e-12))
        dt = time.perf_counter() - t0
        print(f"[{family}-qat] chunk {i + 1}/{n_chunks} "
              f"steps {(i + 1) * args.chunk}  mse_f {mf:.5f}  mse_q {mq:.5f}  "
              f"agree {agree_db:.1f} dB  "
              f"{args.chunk * batch / dt:.0f} img/s", flush=True)
    gp = carry[0]

    # held-out at the SOURCE checkpoint's recorded size: the ship-guard
    # below compares against src_meta's gain, which was measured there
    eval_size = int(src_meta.get("size", size) or size)
    report = evaluate(family, gen, gp, gs, eval_size)
    print(f"[{family}-qat] held-out (at {eval_size}²): {report}")
    prev_gain = float(src_meta.get("gain_db", 0.0) or 0.0)
    if report["gain_db"] < 0.85 * prev_gain:
        raise SystemExit(
            f"[{family}-qat] REFUSING to ship: held-out gain "
            f"{report['gain_db']:.2f} dB lost >15% of the source "
            f"checkpoint's {prev_gain:.2f} dB — raise --qat-agree less or "
            "shorten the fine-tune")
    out = os.path.join(args.out, family)
    meta = {k: src_meta[k] for k in ("family", "steps", "pretrain_steps",
                                     "batch", "size", "lr", "stage_lr",
                                     "data") if k in src_meta}
    meta.update({"family": family, "qat_steps": n_chunks * args.chunk,
                 "qat_lr": lr0, "qat_agree": args.qat_agree, **report})
    ckpt_lib.save_checkpoint(
        out, {"generator": gp, "generator_state": gs}, meta=meta)
    ckpt_lib.wait_for_saves()
    print(f"[{family}-qat] saved {out}  "
          f"({time.perf_counter() - t_start:.0f}s total)")

    try:
        import json

        from celebrity_image_denoiser_tpu.serve import quality
        from celebrity_image_denoiser_tpu.serve.handlers import ServeState

        st = ServeState(weights_dir=args.out)
        fg = quality.fixture_gain_db(st, family)
        meta_path = os.path.join(out, "meta.json")
        with open(meta_path) as f:
            meta = json.load(f)
        meta["fixture_gain_db"] = round(fg, 3)
        with open(meta_path, "w") as f:
            json.dump(meta, f, indent=1)
        print(f"[{family}-qat] serving-fixture gain {fg:+.2f} dB recorded")
    except Exception as e:
        print(f"[{family}-qat] WARNING: fixture-gain recording failed ({e})")


def evaluate(family, gen, g_params, g_state, size, n=16, seed=77):
    """PSNR of generator output vs its noisy input, on fresh synthetic data."""
    k1, k2 = jax.random.split(prng.key(seed))
    clean01 = synth_clean_batch(k1, n, size)
    if family == "dncnn":
        noisy01 = noise_lib.blind_gaussian_batch(k2, clean01)
    else:
        noisy01 = noise_lib.random_noise_batch(
            k2, clean01, variant=FAMILY_NOISE_VARIANT.get(family, 1))

    @jax.jit
    def fwd(p, s, x):
        y, _ = gen.apply(p, s, x, train=False)
        return y

    if family in ("esrgan", "dncnn"):
        out01 = jnp.clip(fwd(g_params, g_state, noisy01), 0, 1)
        base01 = noisy01
    elif family == "srgan":
        nb, h, w, c = noisy01.shape
        lr01 = jax.image.resize(noisy01, (nb, h // 4, w // 4, c), "bicubic")
        out01 = jnp.clip(fwd(g_params, g_state, lr01 * 2 - 1) * 0.5 + 0.5, 0, 1)
        base01 = jnp.clip(jax.image.resize(lr01, noisy01.shape, "bicubic"), 0, 1)
    else:
        out01 = jnp.clip(fwd(g_params, g_state, noisy01 * 2 - 1) * 0.5 + 0.5, 0, 1)
        base01 = noisy01
    p_out = float(jnp.mean(MX.psnr(out01, clean01, data_range=1.0)))
    p_in = float(jnp.mean(MX.psnr(base01, clean01, data_range=1.0)))
    report = {"psnr_out": round(p_out, 3), "psnr_in": round(p_in, 3),
              "gain_db": round(p_out - p_in, 3)}
    if family == "srgan":
        # the SRGAN promise is perceptual quality: record the perceptual
        # distance to clean for the generator vs the bicubic baseline so the
        # "beats bicubic perceptually" claim is a number, not a story
        pd = MX.PerceptualDistance.default(seed=0)
        report["lpips_out"] = round(float(jnp.mean(pd(out01, clean01))), 5)
        report["lpips_bicubic"] = round(
            float(jnp.mean(pd(base01, clean01))), 5)
    return report


# ---- perceptual tower: denoising autoencoder over the VGG features ---------
class _Decoder(nn.Module):
    """256-ch /4 features -> RGB; resize-conv upsampling (no checkerboard)."""

    def __init__(self):
        super().__init__()
        self.add("c1", nn.Conv2d(256, 128, 3, padding=1))
        self.add("c2", nn.Conv2d(128, 64, 3, padding=1))
        self.add("c3", nn.Conv2d(64, 3, 3, padding=1))
        self.add("act", nn.ReLU())

    def forward(self, params, state, x, *, train: bool = False):
        ns = {}
        n, h, w, _ = x.shape
        x = self.call("act", params, state, ns,
                      self.call("c1", params, state, ns, x, train=train))
        x = jax.image.resize(x, (n, h * 2, w * 2, x.shape[-1]), "nearest")
        x = self.call("act", params, state, ns,
                      self.call("c2", params, state, ns, x, train=train))
        x = jax.image.resize(x, (n, h * 4, w * 4, x.shape[-1]), "nearest")
        return self.call("c3", params, state, ns, x, train=train), ns


def train_perceptual(args) -> None:
    size, batch = args.size, args.batch
    vgg, dec = M.VGGFeatures(), _Decoder()
    vp, vs = vgg.init(prng.key(args.seed))
    dp, ds = dec.init(prng.key(args.seed + 1))
    adam_init, adam_update = optim.adam()
    opt = adam_init({"vgg": vp, "dec": dp})

    def loss_fn(params, key, variant):
        kd, kn = jax.random.split(key)
        clean01 = synth_clean_batch(kd, batch, size)
        noisy01 = noise_lib.random_noise_batch(kn, clean01, variant=variant)
        feats, _ = vgg.apply(params["vgg"], vs, noisy01)
        recon, _ = dec.apply(params["dec"], ds, feats)
        return jnp.mean((recon - clean01) ** 2)

    def chunk(params, opt, key, lr, variant):
        def body(c, k):
            params, opt = c
            loss, grads = jax.value_and_grad(loss_fn)(params, k, variant)
            params, opt = adam_update(grads, opt, params, lr)
            return (params, opt), loss

        (params, opt), losses = jax.lax.scan(
            body, (params, opt), jax.random.split(key, args.chunk))
        return params, opt, losses

    # noise variant branches at the Python level (the per-type noise fns are
    # dict-dispatched) -> static arg, one compile per variant, cycled per chunk
    chunk = jax.jit(chunk, donate_argnums=(0, 1), static_argnums=(4,))
    params = {"vgg": vp, "dec": dp}
    n_chunks = max(1, args.steps // args.chunk)
    for i in range(n_chunks):
        lr = args.lr * (1.0 if i / n_chunks < 0.7 else 0.3)
        t0 = time.perf_counter()
        params, opt, losses = chunk(params, opt, prng.key(2000 + i),
                                    jnp.float32(lr), 1 + i % 3)
        last = float(np.asarray(jax.device_get(losses[-1])))
        print(f"[perceptual] chunk {i + 1}/{n_chunks}  mse {last:.5f}  "
              f"{args.chunk * batch / (time.perf_counter() - t0):.0f} img/s",
              flush=True)

    # sanity: trained features should separate noisy-vs-clean far more than
    # a same-image control, and the DAE should reconstruct
    out = os.path.join(args.out, "perceptual")
    ckpt_lib.save_checkpoint(
        out, {"vgg": params["vgg"], "vgg_state": vs},
        meta={"kind": "synthetic-DAE VGG16-features[:16] tower",
              "steps": n_chunks * args.chunk, "final_mse": last,
              "data": "synthetic-v1, distortions v1-v3"},
    )
    ckpt_lib.wait_for_saves()
    print(f"[perceptual] saved {out}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["denoise", "dncnn", "srgan", "esrgan",
                             "perceptual"])
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--pretrain-steps", type=int, default=None,
                    help="srgan only: pixel-MSE SRResNet pretrain steps "
                         "before the perceptual+adversarial stage (the real "
                         "SRGAN recipe); default 3x --steps for srgan, 0 "
                         "otherwise")
    ap.add_argument("--pixel-anchor", type=float, default=1.0,
                    help="srgan stage-2 only: weight of the pixel-MSE term "
                         "added to the perceptual content loss (0 = the "
                         "reference's pure perceptual+adv loss)")
    ap.add_argument("--finetune-lr", type=float, default=None,
                    help="srgan stage-2 learning rate (default --lr / 4)")
    ap.add_argument("--pretrain-ckpt", default=None,
                    help="srgan only: cache dir for the stage-1 (SRResNet) "
                         "weights — loaded when present, else trained and "
                         "saved there (lets a stage-2 sweep reuse one "
                         "pretrain)")
    ap.add_argument("--ema", type=float, default=0.0,
                    help="srgan stage-2 only: EMA decay for an averaged copy "
                         "of G (e.g. 0.995); raw and EMA weights are both "
                         "evaluated and the better-PSNR one ships. 0 = off")
    ap.add_argument("--qat-steps", type=int, default=0,
                    help="quantization-aware fine-tune of the EXISTING "
                         "checkpoint (ops/quant.py::fake_quant): trains "
                         "float+fakequant branches to agree so the all-int8 "
                         "serving program passes its 40 dB runtime gate. "
                         "Runs INSTEAD of normal training")
    ap.add_argument("--qat-lr", type=float, default=2e-5,
                    help="QAT fine-tune learning rate (gentle: the goal is "
                         "re-conditioning, not re-learning)")
    ap.add_argument("--qat-agree", type=float, default=2.0,
                    help="weight of the fakequant-vs-float agreement term")
    ap.add_argument("--init-from", default=None,
                    help="checkpoint dir the QAT fine-tune starts from "
                         "(default: <out>/<family>)")
    ap.add_argument("--chunk", type=int, default=50,
                    help="optimizer steps per device call (lax.scan length)")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=128)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=os.path.join(_REPO, "weights"))
    ap.add_argument("--perceptual", default=None,
                    help="trained perceptual tower checkpoint dir (srgan)")
    args = ap.parse_args(argv)
    if args.pretrain_steps is None:
        args.pretrain_steps = 3 * args.steps if args.family == "srgan" else 0
    if args.family == "perceptual":
        train_perceptual(args)
    elif args.qat_steps > 0:
        qat_finetune(args)
    else:
        train_family(args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
