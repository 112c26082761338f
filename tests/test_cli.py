"""CLI smoke tests: train end-to-end on a tiny synthetic tree, eval batch +
iterative modes, parser defaults replacing the reference's input() prompts."""

import os

import numpy as np
import pytest

from celebrity_image_denoiser_tpu.data import imageio


@pytest.fixture()
def clean_tree(tmp_path, rng_np):
    root = tmp_path / "Clean_dataset"
    for person in ("a", "b"):
        d = root / person
        d.mkdir(parents=True)
        for i in range(4):
            imageio.imwrite(str(d / f"img{i}.png"),
                            rng_np.integers(0, 256, (20, 20, 3), dtype=np.uint8))
    return str(root)


def test_train_cli_end_to_end(clean_tree, tmp_path, monkeypatch):
    from celebrity_image_denoiser_tpu.cli.train import main

    monkeypatch.chdir(tmp_path)
    rc = main([
        "--model", "dncnn", "--clean-dir", clean_tree,
        "--num-epochs", "2", "--batch-size", "4", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ck"),
        "--graph-dir", str(tmp_path / "graphs"),
        "--no-data-parallel",
    ])
    assert rc == 0
    # checkpoints at epoch cadence + training plots written
    assert os.path.isdir(tmp_path / "ck" / "dncnn_epoch_1")
    assert os.path.exists(tmp_path / "graphs" / "training_results.png")


def test_train_cli_resume(clean_tree, tmp_path):
    from celebrity_image_denoiser_tpu.cli.train import main

    args = [
        "--model", "dncnn", "--clean-dir", clean_tree,
        "--num-epochs", "2", "--batch-size", "4", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ck2"),
        "--graph-dir", str(tmp_path / "g2"),
        "--no-data-parallel",
    ]
    assert main(args) == 0
    # resume: start_epoch == num_epochs → trains zero additional epochs
    assert main(args + ["--resume"]) == 0


def test_eval_cli_batch_and_iterative(clean_tree, tmp_path):
    from celebrity_image_denoiser_tpu.cli.eval import main

    out = str(tmp_path / "out")
    rc = main(["--model", "dncnn", "--input-dir", clean_tree,
               "--output-dir", out, "--image-size", "16", "16"])
    assert rc == 0
    assert len(imageio.list_images(out)) == 8

    out2 = str(tmp_path / "out_iter")
    rc = main(["--model", "dncnn", "--input-dir", clean_tree,
               "--output-dir", out2, "--image-size", "16", "16",
               "--iterations", "2"])
    assert rc == 0
    files = imageio.list_images(out2)
    assert len(files) == 16  # each input saved at every iteration
    assert any("_iter1" in f for f in files) and any("_iter2" in f for f in files)

    # chaining: iteration 2 consumed iteration 1's output — re-running the
    # same model on the saved iter1 image must land near the saved iter2
    # (equality only up to the u8 quantization of the intermediate on disk)
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.cli.eval import load_model

    it1 = sorted(f for f in files if "_iter1" in f)[0]
    it2 = it1.replace("_iter1", "_iter2")
    model, params, state = load_model("dncnn", None)
    x1 = imageio.to_float01(imageio.imread_rgb(it1, (16, 16)))
    y, _ = model.apply(params, state, jnp.asarray(x1[None]), train=False)
    recomputed = np.clip(np.asarray(y)[0], 0, 1)
    saved2 = imageio.to_float01(imageio.imread_rgb(it2, (16, 16)))
    assert np.max(np.abs(recomputed - saved2)) < 0.05
    # and iter2 is genuinely a different image than iter1 (the model ran)
    assert np.any(np.abs(saved2 - x1) > 1.0 / 255)


def test_train_cli_srgan_end_to_end(clean_tree, tmp_path):
    """SRGAN via the CLI: on-the-fly noise downscales to LR on device."""
    from celebrity_image_denoiser_tpu.cli.train import main

    rc = main([
        "--model", "srgan", "--clean-dir", clean_tree,
        "--num-epochs", "1", "--batch-size", "4", "--image-size", "32", "32",
        "--sr-scale", "4",
        "--checkpoint-dir", str(tmp_path / "cks"),
        "--graph-dir", str(tmp_path / "gs"),
        "--no-data-parallel",
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "cks" / "srgan_epoch_0")


def test_train_cli_cgan_end_to_end(clean_tree, tmp_path):
    """cGAN (keras-arch) via the CLI: joint-update family, sized disc."""
    from celebrity_image_denoiser_tpu.cli.train import main

    rc = main([
        "--model", "cgan", "--clean-dir", clean_tree,
        "--num-epochs", "1", "--batch-size", "4", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ckc"),
        "--graph-dir", str(tmp_path / "gc"),
        "--no-data-parallel",
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "ckc" / "cgan_epoch_0")


def test_train_cli_esrgan_small_image_size(clean_tree, tmp_path):
    """Non-default image sizes must size the discriminator's Linear."""
    from celebrity_image_denoiser_tpu.cli.train import main

    rc = main([
        "--model", "esrgan", "--clean-dir", clean_tree,
        "--num-epochs", "1", "--batch-size", "4", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "cke"),
        "--graph-dir", str(tmp_path / "ge"),
        "--no-data-parallel",
    ])
    assert rc == 0


def test_parsers_have_no_interactive_prompts():
    """The reference asks for epoch counts via input() (training.py:503);
    every CLI here must be fully flag-driven with defaults."""
    from celebrity_image_denoiser_tpu.cli import eval as eval_cli
    from celebrity_image_denoiser_tpu.cli import noise_gen, serve, train

    for mod in (train, noise_gen, serve):
        p = mod.build_parser()
        assert p.parse_args([]) is not None
    p = eval_cli.build_parser()
    args = p.parse_args(["--input-dir", "x", "--output-dir", "y"])
    assert args.iterations == 1


def test_train_cli_data_parallel_mesh(tmp_path, rng_np):
    """The default DP path: cli.train without --no-data-parallel builds a
    mesh over the 8 virtual devices and runs the NamedSharding-jitted step
    (batch must divide the device count)."""
    import jax

    from celebrity_image_denoiser_tpu.cli.train import main

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    # enough images that the 80% train split still fills a batch of 8
    root = tmp_path / "Clean_dp"
    d = root / "p"
    d.mkdir(parents=True)
    for i in range(14):
        imageio.imwrite(str(d / f"img{i}.png"),
                        rng_np.integers(0, 256, (20, 20, 3), dtype=np.uint8))
    rc = main([
        "--model", "dncnn", "--clean-dir", str(root),
        "--num-epochs", "1", "--batch-size", "8", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ckdp"),
        "--graph-dir", str(tmp_path / "gdp"),
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "ckdp" / "dncnn_epoch_0")


def test_reference_offline_workflow_end_to_end(clean_tree, tmp_path):
    """The reference's full 3-stage offline flow (SURVEY §3.4) through the
    CLIs: render a noisy dataset to disk (stage 1), train from the disk
    pairs with --no-on-the-fly (stage 3, the reference-parity pipeline),
    then batch-eval with the produced checkpoint."""
    from celebrity_image_denoiser_tpu.cli.eval import main as eval_main
    from celebrity_image_denoiser_tpu.cli.noise_gen import main as noise_main
    from celebrity_image_denoiser_tpu.cli.train import main as train_main

    noisy_dir = str(tmp_path / "Dataset_Noise")
    assert noise_main(["--clean-dir", clean_tree, "--out-dir", noisy_dir,
                       "--image-size", "16", "16", "--types", "gaussian",
                       "--batch", "8"]) == 0
    ck = str(tmp_path / "ckw")
    assert train_main([
        "--model", "denoise", "--clean-dir", clean_tree,
        "--noisy-dir", noisy_dir, "--no-on-the-fly",
        "--noise-variant", "1",
        "--num-epochs", "1", "--batch-size", "2", "--image-size", "16", "16",
        "--checkpoint-dir", ck, "--graph-dir", str(tmp_path / "gw"),
        "--no-data-parallel",
    ]) == 0
    ckpt = os.path.join(ck, "denoise_epoch_0")
    assert os.path.isdir(ckpt)
    out = str(tmp_path / "outw")
    assert eval_main(["--model", "denoise", "--checkpoint", ckpt,
                      "--input-dir", os.path.join(noisy_dir, "gaussian"),
                      "--output-dir", out, "--image-size", "16", "16",
                      "--clean-dir", clean_tree]) == 0
    assert len(imageio.list_images(out)) > 0


def test_train_cli_from_tensor_cache(clean_tree, tmp_path):
    """The reference ESRGAN pipeline trains from its tensorized pair cache
    (esrgan_train.py:18-36); --tensor-cache reproduces that path."""
    from celebrity_image_denoiser_tpu.cli.noise_gen import main as noise_main
    from celebrity_image_denoiser_tpu.cli.train import main as train_main
    from celebrity_image_denoiser_tpu.data.caching import build_tensor_cache

    noisy_dir = str(tmp_path / "Noisy")
    assert noise_main(["--clean-dir", clean_tree, "--out-dir", noisy_dir,
                       "--image-size", "16", "16", "--types", "gaussian",
                       "--batch", "8", "--variant", "3"]) == 0
    cache = str(tmp_path / "Pre_dataset")
    n = build_tensor_cache(os.path.join(noisy_dir, "gaussian"), clean_tree,
                           cache, image_size=(16, 16))
    assert n == 8
    rc = train_main([
        "--model", "esrgan", "--tensor-cache", cache,
        "--num-epochs", "1", "--batch-size", "2", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "cktc"),
        "--graph-dir", str(tmp_path / "gtc"),
        "--no-data-parallel",
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "cktc" / "esrgan_epoch_0")


def test_tensor_cache_domain_remap(clean_tree, tmp_path):
    """A default-built ([0,1]) cache must be remapped to [-1,1] for tanh
    families — the cache records its domain in meta.json (review r2 #2)."""
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.cli.noise_gen import main as noise_main
    from celebrity_image_denoiser_tpu.data.caching import (
        TensorPairDataset,
        build_tensor_cache,
    )

    noisy_dir = str(tmp_path / "N")
    noise_main(["--clean-dir", clean_tree, "--out-dir", noisy_dir,
                "--image-size", "16", "16", "--types", "gaussian",
                "--batch", "8"])
    cache = str(tmp_path / "cache01")
    build_tensor_cache(os.path.join(noisy_dir, "gaussian"), clean_tree,
                       cache, image_size=(16, 16))
    ds = TensorPairDataset(cache)
    assert ds.normalized is False  # meta.json records the domain
    # the denoise (tanh) family trains from the [0,1] cache via the remap
    from celebrity_image_denoiser_tpu.cli.train import main as train_main

    rc = train_main([
        "--model", "denoise", "--tensor-cache", cache,
        "--num-epochs", "1", "--batch-size", "2", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ckr"),
        "--graph-dir", str(tmp_path / "gr"), "--no-data-parallel",
    ])
    assert rc == 0


def test_tensor_cache_without_meta_probes_or_declares_domain(
        clean_tree, tmp_path, caplog):
    """A pre-meta cache must not be silently assumed [0,1]: the CLI probes
    sample pairs (negative values => tanh) or takes an explicit
    --tensor-cache-domain (ADVICE r2: cli/train.py)."""
    import logging

    from celebrity_image_denoiser_tpu.cli.noise_gen import main as noise_main
    from celebrity_image_denoiser_tpu.cli.train import main as train_main
    from celebrity_image_denoiser_tpu.data.caching import build_tensor_cache

    noisy_dir = str(tmp_path / "N")
    noise_main(["--clean-dir", clean_tree, "--out-dir", noisy_dir,
                "--image-size", "16", "16", "--types", "gaussian",
                "--batch", "8"])
    # a NORMALIZED ([-1,1]) cache whose meta.json is then lost
    cache = str(tmp_path / "cache_tanh")
    build_tensor_cache(os.path.join(noisy_dir, "gaussian"), clean_tree,
                       cache, image_size=(16, 16), normalize=True)
    os.remove(os.path.join(cache, "meta.json"))

    common = ["--num-epochs", "1", "--batch-size", "2",
              "--image-size", "16", "16", "--no-data-parallel"]
    with caplog.at_level(logging.INFO, logger="cid_tpu.cli.train"):
        rc = train_main(["--model", "denoise", "--tensor-cache", cache,
                         "--checkpoint-dir", str(tmp_path / "ck1"),
                         "--graph-dir", str(tmp_path / "g1")] + common)
    assert rc == 0
    probed = [r for r in caplog.records if "INFERRING domain" in r.message]
    assert probed, "pre-meta cache must be probed, not assumed"
    assert "[-1,1]" in probed[0].getMessage()
    # probe must NOT fire remap for a tanh cache feeding a tanh family
    assert not any("remapping cached pairs" in r.getMessage()
                   for r in caplog.records)

    # explicit declaration wins over probing
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="cid_tpu.cli.train"):
        rc = train_main(["--model", "denoise", "--tensor-cache", cache,
                         "--tensor-cache-domain", "unit",
                         "--checkpoint-dir", str(tmp_path / "ck2"),
                         "--graph-dir", str(tmp_path / "g2")] + common)
    assert rc == 0
    assert any("declared" in r.getMessage() for r in caplog.records)
    assert any("remapping cached pairs" in r.getMessage()
               for r in caplog.records)


def test_tensor_cache_domain_contradicting_meta_is_an_error(
        clean_tree, tmp_path):
    """meta.json-recorded domains are authoritative: a contradicting
    --tensor-cache-domain must fail loudly, not silently flip recorded
    metadata (advisor r3 finding #2)."""
    import pytest

    from celebrity_image_denoiser_tpu.cli.noise_gen import main as noise_main
    from celebrity_image_denoiser_tpu.cli.train import main as train_main
    from celebrity_image_denoiser_tpu.data.caching import build_tensor_cache

    noisy_dir = str(tmp_path / "N")
    noise_main(["--clean-dir", clean_tree, "--out-dir", noisy_dir,
                "--image-size", "16", "16", "--types", "gaussian",
                "--batch", "8"])
    cache = str(tmp_path / "cache_meta")  # meta.json records [0,1]
    build_tensor_cache(os.path.join(noisy_dir, "gaussian"), clean_tree,
                       cache, image_size=(16, 16))
    common = ["--num-epochs", "1", "--batch-size", "2",
              "--image-size", "16", "16", "--no-data-parallel"]
    with pytest.raises(ValueError, match="contradicts the domain recorded"):
        train_main(["--model", "denoise", "--tensor-cache", cache,
                    "--tensor-cache-domain", "tanh",
                    "--checkpoint-dir", str(tmp_path / "ckx"),
                    "--graph-dir", str(tmp_path / "gx")] + common)
    # an AGREEING declaration is fine (and a no-op)
    rc = train_main(["--model", "denoise", "--tensor-cache", cache,
                     "--tensor-cache-domain", "unit",
                     "--checkpoint-dir", str(tmp_path / "cky"),
                     "--graph-dir", str(tmp_path / "gy")] + common)
    assert rc == 0


def test_default_weights_dir_ignores_unrelated_cwd_weights(tmp_path,
                                                           monkeypatch):
    """An unrelated ./weights dir in the cwd must not shadow the packaged
    checkpoints (ADVICE r2: core/config.py default_weights_dir)."""
    from celebrity_image_denoiser_tpu.core.config import default_weights_dir

    monkeypatch.chdir(tmp_path)
    packaged = default_weights_dir()
    assert os.path.isabs(packaged) and os.path.isdir(packaged)

    # empty / unrelated ./weights: ignored
    (tmp_path / "weights").mkdir()
    (tmp_path / "weights" / "notes.txt").write_text("not a checkpoint")
    assert default_weights_dir() == packaged

    # a recognizable checkpoint makes the cwd dir win again
    (tmp_path / "weights" / "denoise_epoch_499.pth").write_bytes(b"x")
    assert default_weights_dir() == "weights"


def _write_pt_tree(root, noise_types, n_pairs, size=16, seed=0):
    """Build a reference-layout Pre_dataset tree of CHW [0,1] .pt tensors
    (esrgan_preprocessing.py:12-54)."""
    import torch

    g = torch.Generator().manual_seed(seed)
    for noise in noise_types:
        nd = root / noise / "noisy_tensor" / "person1"
        cd = root / noise / "clean_tensor" / "person1"
        nd.mkdir(parents=True)
        cd.mkdir(parents=True)
        for i in range(n_pairs):
            clean = torch.rand(3, size, size, generator=g)
            noisy = (clean + 0.1 * torch.randn(3, size, size,
                                               generator=g)).clamp(0, 1)
            torch.save(noisy, str(nd / f"img_{i}.png.pt"))
            torch.save(clean, str(cd / f"img_{i}.png.pt"))


def test_reference_pt_cache_reader(tmp_path):
    """TorchTensorPairDataset reads the reference's actual .pt pair trees:
    CHW->HWC, sorted walk, multi-noise roots, None on corrupt entries
    (VERDICT r2 missing #2; esrgan_train.py:18-36)."""
    pytest.importorskip("torch")
    from celebrity_image_denoiser_tpu.data.caching import (
        TorchTensorPairDataset,
        open_tensor_cache,
    )

    _write_pt_tree(tmp_path, ["gaussian", "speckle"], 3)
    # whole Pre_dataset root: both noise types concatenated
    ds = TorchTensorPairDataset(str(tmp_path))
    assert len(ds) == 6 and ds.normalized is False
    noisy, clean = ds[0]
    assert noisy.shape == (16, 16, 3) and clean.dtype == np.float32
    assert 0.0 <= float(noisy.min()) and float(noisy.max()) <= 1.0
    # single-noise dir works too, and layout detection picks this reader
    sub = TorchTensorPairDataset(str(tmp_path / "gaussian"))
    assert len(sub) == 3
    assert type(open_tensor_cache(str(tmp_path))) is TorchTensorPairDataset
    # corrupt entry -> None (skip-and-collate contract), not a crash
    bad = tmp_path / "gaussian" / "noisy_tensor" / "person1" / "img_0.png.pt"
    bad.write_bytes(b"not a tensor")
    assert TorchTensorPairDataset(str(tmp_path / "gaussian"))[0] is None


def test_pt_cache_domain_flag_overrides_assumption(tmp_path, caplog):
    """The .pt reader's [0,1] torchvision assumption is not metadata — an
    explicit --tensor-cache-domain must override it (code-review r3 #3:
    the flag was silently dropped because normalized was False, not None)."""
    import logging

    pytest.importorskip("torch")
    from celebrity_image_denoiser_tpu.cli.train import main as train_main

    _write_pt_tree(tmp_path / "Pre_dataset", ["gaussian"], 8)
    with caplog.at_level(logging.INFO, logger="cid_tpu.cli.train"):
        rc = train_main([
            "--model", "esrgan", "--tensor-cache",
            str(tmp_path / "Pre_dataset"), "--tensor-cache-domain", "tanh",
            "--num-epochs", "1", "--batch-size", "2",
            "--image-size", "16", "16",
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--graph-dir", str(tmp_path / "g"), "--no-data-parallel",
        ])
    assert rc == 0
    assert any("overrides the cache's assumed domain" in r.getMessage()
               for r in caplog.records)
    # tanh-declared cache feeding a [0,1] family => remap fired
    assert any("remapping cached pairs" in r.getMessage()
               for r in caplog.records)


def test_train_cli_from_reference_pt_cache(tmp_path):
    """--tensor-cache accepts a reference Pre_dataset tree directly and
    trains a step from it (VERDICT r2 missing #2 'done' criterion)."""
    pytest.importorskip("torch")
    from celebrity_image_denoiser_tpu.cli.train import main as train_main

    _write_pt_tree(tmp_path / "Pre_dataset", ["gaussian"], 8)
    rc = train_main([
        "--model", "esrgan", "--tensor-cache", str(tmp_path / "Pre_dataset"),
        "--num-epochs", "1", "--batch-size", "2", "--image-size", "16", "16",
        "--checkpoint-dir", str(tmp_path / "ckpt"),
        "--graph-dir", str(tmp_path / "g"), "--no-data-parallel",
    ])
    assert rc == 0
    assert os.path.isdir(tmp_path / "ckpt" / "esrgan_epoch_0")


def test_qat_finetune_rejects_non_image_to_image_families(tmp_path):
    """--qat-steps supports only same-resolution image->image generators;
    srgan (x4) / cgan (latent+cond signature) must be rejected loudly at
    entry instead of crashing deep inside tracing (self-review r4)."""
    import importlib.util
    import types

    spec = importlib.util.spec_from_file_location(
        "train_serving_weights",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "train_serving_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    for family in ("srgan", "cgan"):
        args = types.SimpleNamespace(family=family, size=32, batch=2,
                                     qat_steps=10, init_from=None,
                                     out=str(tmp_path))
        with pytest.raises(SystemExit, match="qat-steps supports"):
            mod.qat_finetune(args)


def test_qat_finetune_end_to_end_ship_and_refuse(tmp_path, capsys):
    """Drives scripts/train_serving_weights.py --qat-steps through its whole
    path (checkpoint load -> fake-quant lax.scan fine-tune -> held-out eval
    -> ship guard -> save): a gentle fine-tune ships with QAT provenance in
    meta.json, and a destructive one trips the REFUSING-to-ship gate instead
    of silently overwriting the checkpoint (the guard protecting shipped
    quality, kernel_notes.md r4 QAT section)."""
    import importlib.util
    import json
    import shutil

    spec = importlib.util.spec_from_file_location(
        "train_serving_weights_e2e",
        os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                     "train_serving_weights.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    # a meta-doctored copy of the shipped denoise checkpoint: held-out eval
    # runs at the recorded size, so size=32 keeps the CPU cost tiny, and a
    # modest recorded gain gives the 0.85x ship guard a real bar to clear
    src = tmp_path / "init" / "denoise"
    src.parent.mkdir()
    shutil.copytree("weights/denoise", src)
    meta = json.loads((src / "meta.json").read_text())
    meta.update(size=32, gain_db=1.0)
    (src / "meta.json").write_text(json.dumps(meta))

    out = tmp_path / "out"
    rc = mod.main([
        "--family", "denoise", "--qat-steps", "2", "--chunk", "2",
        "--batch", "2", "--size", "32", "--qat-lr", "1e-7",
        "--init-from", str(src), "--out", str(out)])
    assert rc == 0
    shipped = json.loads((out / "denoise" / "meta.json").read_text())
    assert shipped["qat_steps"] == 2 and shipped["qat_lr"] == 1e-7
    assert shipped["gain_db"] > 0.85  # cleared the guard with real margin
    assert (out / "denoise" / "arrays.npz").exists()

    # destructive fine-tune (lr=10 for 2 steps wrecks the generator): the
    # guard must refuse, and the previously shipped output must survive
    before = (out / "denoise" / "arrays.npz").read_bytes()
    with pytest.raises(SystemExit, match="REFUSING to ship"):
        mod.main([
            "--family", "denoise", "--qat-steps", "2", "--chunk", "2",
            "--batch", "2", "--size", "32", "--qat-lr", "10.0",
            "--init-from", str(src), "--out", str(out)])
    assert (out / "denoise" / "arrays.npz").read_bytes() == before


def test_export_cli_pth_roundtrip(tmp_path):
    """cli.export writes a .pth the tolerant importer (and therefore the
    reference's own loader layout, app.py:257-274) reads back bit-equal —
    the CLI surface of the ckpt/export.py round-trip."""
    pytest.importorskip("torch")
    import numpy as np

    from celebrity_image_denoiser_tpu import models as M
    from celebrity_image_denoiser_tpu.ckpt import load_pth_safely
    from celebrity_image_denoiser_tpu.cli.export import main
    from celebrity_image_denoiser_tpu.core import prng
    from celebrity_image_denoiser_tpu.utils import tree as treelib

    if not os.path.isdir("weights/denoise"):
        pytest.skip("no shipped denoise checkpoint")
    out = tmp_path / "denoise_epoch_499.pth"
    rc = main(["--model", "denoise", "--checkpoint", "weights/denoise",
               "--out", str(out)])
    assert rc == 0 and out.exists()

    from celebrity_image_denoiser_tpu.ckpt import load_checkpoint

    sections, _ = load_checkpoint("weights/denoise")
    model = M.build_generator("denoise")
    p0, s0 = model.init(prng.key(1))
    p1, s1 = load_pth_safely(model, str(out), p0, s0)
    want = treelib.flatten(sections["generator"])
    got = treelib.flatten(p1)
    assert set(got) == set(want)
    for k, v in want.items():
        np.testing.assert_array_equal(np.asarray(got[k]), np.asarray(v),
                                      err_msg=str(k))


def test_export_cli_rejects_keras_for_torch_family(tmp_path):
    from celebrity_image_denoiser_tpu.cli.export import main

    with pytest.raises(SystemExit, match="keras"):
        main(["--model", "denoise", "--checkpoint", "weights/denoise",
              "--out", str(tmp_path / "x.keras")])


def test_export_cli_rejects_pth_for_keras_cgan(tmp_path):
    """--model cgan --format pth would write a state_dict no reference torch
    loader matches (the tolerant loader would silently random-init) — the
    CLI must refuse and point at cgan_torch."""
    from celebrity_image_denoiser_tpu.cli.export import main

    with pytest.raises(SystemExit, match="cgan_torch"):
        main(["--model", "cgan", "--checkpoint", "weights/denoise",
              "--out", str(tmp_path / "x.pth")])


def test_export_cli_keras_roundtrip(tmp_path):
    """cli.export --format keras: native cgan checkpoint -> .keras zip that
    our TF-free importer loads back to an identical forward."""
    pytest.importorskip("h5py")
    import numpy as np

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu import models as M
    from celebrity_image_denoiser_tpu.ckpt import (
        load_keras_model,
        save_checkpoint,
    )
    from celebrity_image_denoiser_tpu.cli.export import main
    from celebrity_image_denoiser_tpu.core import prng

    model = M.CGANKerasGenerator()
    params, state = model.init(prng.key(3))
    src = tmp_path / "ckpt"
    save_checkpoint(str(src), {"generator": params, "generator_state": state},
                    meta={"epoch": 500})
    out = tmp_path / "cgan_epoch_500.keras"
    rc = main(["--model", "cgan", "--checkpoint", str(src),
               "--out", str(out)])  # format inferred from the extension
    assert rc == 0 and out.exists()

    p2, s2 = model.init(prng.key(4))
    p2, s2 = load_keras_model(model, str(out), p2, s2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    y1, _ = model.apply(params, state, x)
    y2, _ = model.apply(p2, s2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-6)
