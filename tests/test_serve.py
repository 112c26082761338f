"""API-level integration tests: spin the stdlib server on a loopback port
and exercise the reference response contract end-to-end (SURVEY.md §4d)."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from celebrity_image_denoiser_tpu.serve.app import make_server


def _png_bytes(w=20, h=12):
    from PIL import Image

    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _multipart(fields):
    boundary = "testboundary123"
    lines = []
    for name, (filename, ctype, data) in fields.items():
        lines.append(f"--{boundary}".encode())
        disp = f'Content-Disposition: form-data; name="{name}"'
        if filename:
            disp += f'; filename="{filename}"'
        lines.append(disp.encode())
        if ctype:
            lines.append(f"Content-Type: {ctype}".encode())
        lines.append(b"")
        lines.append(data)
    lines.append(f"--{boundary}--".encode())
    body = b"\r\n".join(lines)
    return body, f"multipart/form-data; boundary={boundary}"


_server_state = {}  # url -> ServeState, for unit-level tests on live state


@pytest.fixture(scope="module")
def server():
    srv = make_server("127.0.0.1", 0, weights_dir="/nonexistent-weights")
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    url = f"http://127.0.0.1:{port}"
    _server_state[url] = srv.state
    yield url
    srv.shutdown()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_root_contract(server):
    with urllib.request.urlopen(server + "/") as r:
        data = json.loads(r.read())
    assert data["message"] == "Unified GAN API is running"
    # the reference's four models in its order, plus the dncnn extension
    assert data["models"][:4] == ["denoise", "cgan", "srgan", "esrgan"]
    assert "dncnn" in data["models"]
    assert "default_backends" in data


def test_dncnn_extension_serves(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})
    status, data = _post(f"{server}/enhance?model=dncnn&graphs=false",
                         body, ctype)
    assert status == 200, data
    import io as _io

    from PIL import Image

    out = Image.open(_io.BytesIO(base64.b64decode(data["denoised_image_base64"])))
    assert out.size == (20, 12)


@pytest.mark.parametrize("model", ["denoise", "esrgan"])
def test_enhance_response_contract(server, model):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})
    status, data = _post(f"{server}/enhance?model={model}", body, ctype)
    assert status == 200, data
    assert set(data) == {"denoised_image_base64", "noise_graph_base64", "backend"}
    assert data["backend"] == "torch"
    # output decodes to a PNG of the original (cropped-back) size
    from PIL import Image

    out = Image.open(io.BytesIO(base64.b64decode(data["denoised_image_base64"])))
    assert out.size == (20, 12)
    graph = Image.open(io.BytesIO(base64.b64decode(data["noise_graph_base64"])))
    assert graph.size[0] > 100  # a real matplotlib figure


def test_srgan_upscales(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes(16, 8))})
    status, data = _post(f"{server}/enhance?model=srgan", body, ctype)
    assert status == 200, data
    from PIL import Image

    out = Image.open(io.BytesIO(base64.b64decode(data["denoised_image_base64"])))
    # reference quirk preserved: srgan output is NOT cropped back — the
    # padded input (16x8 → 16x16 at pad_divisor*scale=16) upscales ×4
    # (app.py:481-485 crops only the comparison input)
    assert out.size == (64, 64)


def test_cgan_label_path(server):
    body, ctype = _multipart({
        "file": ("a.png", "image/png", _png_bytes()),
        "label": (None, None, b"5"),
    })
    status, data = _post(f"{server}/enhance?model=cgan", body, ctype)
    assert status == 200, data
    assert data["backend"] == "torch"  # no keras weights in this fixture


def test_cgan_requires_condition(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})
    status, data = _post(f"{server}/enhance?model=cgan", body, ctype)
    assert status == 400
    assert "label or condition" in data["detail"]


def test_unknown_model_400(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})
    status, data = _post(f"{server}/enhance?model=nope", body, ctype)
    assert status == 400
    assert "Unknown model" in data["detail"]


def test_non_image_rejected(server):
    body, ctype = _multipart({"file": ("a.txt", "text/plain", b"hello")})
    status, data = _post(f"{server}/enhance?model=denoise", body, ctype)
    assert status == 400
    assert "must be an image" in data["detail"]


def test_corrupt_image_500(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", b"not a png")})
    status, data = _post(f"{server}/enhance?model=denoise", body, ctype)
    assert status == 500
    assert data["detail"] == "Image enhancement failed"


def test_warmup_precompiles():
    """ServeState.warmup runs all model forwards without error and the SAME
    warmed state then serves a matching-size request."""
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st = ServeState(weights_dir="/nonexistent")
    st.warmup(((32, 32),))
    result = st.enhance("denoise", _png_bytes(32, 32), "image/png",
                        include_graph=False)
    assert set(result) == {"denoised_image_base64", "noise_graph_base64",
                           "backend"}


def test_concurrent_requests(server):
    """ThreadingHTTPServer + jitted forwards must handle parallel clients
    (jax dispatch is thread-safe; the handler's jit cache race is benign)."""
    import concurrent.futures

    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})

    def one(_):
        return _post(f"{server}/enhance?model=denoise&graphs=false",
                     body, ctype)[0]

    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        codes = list(ex.map(one, range(4)))
    assert codes == [200] * 4


def test_rgba_and_grayscale_inputs(server):
    """Non-RGB uploads convert like the reference's .convert('RGB')."""
    import io as _io

    from PIL import Image

    rng = np.random.default_rng(2)
    for mode, shape in [("RGBA", (12, 20, 4)), ("L", (12, 20))]:
        arr = rng.integers(0, 255, shape, dtype=np.uint8)
        buf = _io.BytesIO()
        Image.fromarray(arr, mode=mode).save(buf, format="PNG")
        body, ctype = _multipart({"file": ("a.png", "image/png", buf.getvalue())})
        status, data = _post(f"{server}/enhance?model=denoise&graphs=false",
                             body, ctype)
        assert status == 200, (mode, data)
        out = Image.open(_io.BytesIO(base64.b64decode(data["denoised_image_base64"])))
        assert out.size == (20, 12)


def test_graphs_false_skips_figure(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes())})
    status, data = _post(f"{server}/enhance?model=denoise&graphs=false",
                         body, ctype)
    assert status == 200
    assert data["noise_graph_base64"] == ""  # contract key kept, empty
    assert data["denoised_image_base64"]


def test_cgan_keras_single_input_ignores_condition(tmp_path):
    """With keras weights loaded, a cond_file request succeeds and the
    condition is ignored (the shipped Sequential model is single-input —
    reference app.py:457-458 falls through to predict(x))."""
    import os
    import shutil

    src = "/root/reference/backend/weights/cgan_epoch_500.keras"
    if not os.path.exists(src):
        pytest.skip("shipped .keras not available")
    wdir = tmp_path / "w"
    wdir.mkdir()
    shutil.copy(src, wdir / "cgan_epoch_500.keras")
    srv = make_server("127.0.0.1", 0, weights_dir=str(wdir))
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        png = _png_bytes(16, 16)
        body, ctype = _multipart({
            "file": ("a.png", "image/png", png),
            "cond_file": ("c.png", "image/png", png),
        })
        status, data = _post(
            f"http://127.0.0.1:{port}/enhance?model=cgan&cgan_backend=keras",
            body, ctype)
        assert status == 200, data
        assert data["backend"] == "keras"
    finally:
        srv.shutdown()


def test_multipart_preserves_binary_tails():
    """Payloads ending in CR/LF bytes must survive framing intact."""
    from celebrity_image_denoiser_tpu.serve.multipart import parse_multipart

    payload = b"\x89PNGdata\x0d\x0a\x0a"  # ends with CR LF LF
    body, ctype = _multipart({"file": ("a.bin", "image/png", payload)})
    parts = parse_multipart(body, ctype)
    assert parts["file"].data == payload


def test_ui_served(server):
    with urllib.request.urlopen(server + "/ui") as r:
        html = r.read().decode()
    assert "Run Full Pipeline" in html and "/enhance" in html


def test_odd_size_pads_and_crops_back(server):
    body, ctype = _multipart({"file": ("a.png", "image/png", _png_bytes(37, 23))})
    status, data = _post(f"{server}/enhance?model=denoise", body, ctype)
    assert status == 200
    from PIL import Image

    out = Image.open(io.BytesIO(base64.b64decode(data["denoised_image_base64"])))
    assert out.size == (37, 23)


def test_run_enhance_shared_semantics(server):
    """Both server front ends route through handlers.run_enhance — check its
    semantics once at the unit level: bad label is a 400 (not a framework
    422), graphs_raw='false' drops the figure."""
    from celebrity_image_denoiser_tpu.serve.handlers import (
        EnhanceError,
        run_enhance,
    )

    # reuse the running server's loaded state rather than re-initing models
    st = _server_state[server]
    png = _png_bytes()
    with pytest.raises(EnhanceError) as ei:
        run_enhance(st, model="denoise", file_bytes=png,
                    content_type="image/png", label_raw="not-an-int")
    assert ei.value.status == 400
    out = run_enhance(st, model="denoise", file_bytes=png,
                      content_type="image/png", graphs_raw="FALSE")
    assert not out["noise_graph_base64"]
    assert out["denoised_image_base64"]


def test_graphs_false_fastapi_parity():
    """create_fastapi_app must honor graphs=false exactly like the stdlib
    server (VERDICT r1 missing #4).  Skips when fastapi isn't installed —
    the route body is the same run_enhance call either way."""
    fastapi = pytest.importorskip("fastapi")  # noqa: F841
    from fastapi.testclient import TestClient

    from celebrity_image_denoiser_tpu.serve.app import create_fastapi_app

    app = create_fastapi_app(weights_dir="/nonexistent-weights")
    client = TestClient(app)
    r = client.post("/enhance?model=denoise&graphs=false",
                    files={"file": ("a.png", _png_bytes(), "image/png")})
    assert r.status_code == 200
    data = r.json()
    assert not data["noise_graph_base64"]
    r = client.post("/enhance?model=denoise",
                    data={"label": "zzz"},
                    files={"file": ("a.png", _png_bytes(), "image/png")})
    assert r.status_code == 400


# ---- shipped-weights quality gate (VERDICT r1 missing #2) -------------------

# the gate fixture lives in the package so the retrain script records the
# SAME measurement the tests assert on (serve/quality.py)
from celebrity_image_denoiser_tpu.serve.quality import (  # noqa: E402
    psnr_u8 as _psnr_u8,
    structured_clean as _structured_clean,
)


@pytest.fixture(scope="module")
def shipped_state():
    import os

    from celebrity_image_denoiser_tpu.serve.handlers import (
        ServeState,
        default_weights_dir,
    )

    wd = default_weights_dir()
    if not os.path.isdir(os.path.join(wd)):
        pytest.skip("no shipped weights dir")
    return ServeState(weights_dir=wd)


@pytest.mark.parametrize("model", ["dncnn", "denoise", "esrgan"])
def test_shipped_weights_actually_denoise(shipped_state, model):
    """The committed checkpoints must hold ≥70% of the fixture margin
    recorded at retrain time in weights/<model>/meta.json — a margin floor,
    not a sign check, so a regression that destroys most of the quality
    fails here rather than shipping (VERDICT r3 weak #3).  Reference match:
    best-PSNR checkpoint selection as the de-facto acceptance gate
    (training.py:463-467)."""
    import os

    from celebrity_image_denoiser_tpu.serve import quality

    if not os.path.isdir(os.path.join(shipped_state.weights_dir, model)):
        pytest.skip(f"no shipped {model} checkpoint")
    gain = quality.fixture_gain_db(shipped_state, model)
    assert quality.recorded_margin(
        shipped_state.weights_dir, model) is not None, (
        f"{model}: meta.json must record fixture_gain_db")
    floor = quality.recorded_gate_floor(shipped_state.weights_dir, model,
                                        default=1.0)
    assert gain >= floor, (
        f"{model}: shipped weights gain {gain:.2f} dB is below the gate "
        f"floor {floor:.2f} dB (70% of the margin recorded at retrain)")


def test_shipped_srgan_beats_bicubic_through_serving(shipped_state):
    """The shipped SRGAN ×4 weights (two-stage recipe: MSE pretrain then
    perceptual+adversarial fine-tune) must beat the bicubic-upscale baseline
    by ≥70% of the BATTERY margin recorded at retrain (battery_gain_db in
    meta.json — the held-out corpus through serving, VERDICT r4 weak #6:
    the single-fixture margin was thin enough to tolerate a ~60% quality
    loss).  The reference's srgan serving compares against exactly this
    baseline (app.py:474-485 upscales the input for the analysis figure)."""
    import os

    from celebrity_image_denoiser_tpu.serve import quality

    if not os.path.isdir(os.path.join(shipped_state.weights_dir, "srgan")):
        pytest.skip("no shipped srgan checkpoint")
    assert quality.recorded_margin(
        shipped_state.weights_dir, "srgan", key="battery_gain_db") \
        is not None, "srgan: meta.json must record battery_gain_db"
    gain = quality.srgan_battery_gain_db(shipped_state)
    floor = quality.recorded_gate_floor(shipped_state.weights_dir, "srgan",
                                        default=0.0, key="battery_gain_db")
    assert gain >= floor, (
        f"shipped srgan battery gain over bicubic {gain:+.2f} dB is below "
        f"the gate floor {floor:.2f} dB (70% of the margin recorded at "
        f"retrain)")
    # the single-fixture margin stays recorded + positive as a secondary
    # signal (it is what the other families gate on)
    fixture = quality.fixture_gain_db(shipped_state, "srgan")
    assert fixture > 0, f"fixture gain went negative: {fixture:+.2f} dB"


def test_degraded_srgan_fails_the_battery_gate(tmp_path):
    """Negative control for the srgan battery gate: wreck the shipped srgan
    generator as the denoise control does and assert the battery margin
    falls below 70% of the recorded battery_gain_db — the old fixture gate
    (floor 0.82 dB of a 2.19 dB claim) would tolerate a much deeper loss."""
    import os

    import jax
    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.ckpt import (
        load_checkpoint,
        save_checkpoint,
    )
    from celebrity_image_denoiser_tpu.serve import quality
    from celebrity_image_denoiser_tpu.serve.handlers import (
        ServeState,
        default_weights_dir,
    )

    src = os.path.join(default_weights_dir(), "srgan")
    if not os.path.isdir(src):
        pytest.skip("no shipped srgan checkpoint")
    sections, meta = load_checkpoint(src)
    rng = np.random.default_rng(0)

    def degrade(x):
        return x + jnp.asarray(
            rng.normal(0, 0.15 * float(np.std(np.asarray(x)) + 1e-6),
                       x.shape).astype(np.asarray(x).dtype))

    sections = dict(sections)
    sections["generator"] = jax.tree.map(degrade, sections["generator"])
    out = tmp_path / "weights" / "srgan"
    # meta round-trips through save_checkpoint, so the degraded dir keeps
    # the ORIGINAL battery_gain_db (a real regression wouldn't rewrite its
    # own acceptance record)
    save_checkpoint(str(out), sections, meta=meta)
    state = ServeState(weights_dir=str(tmp_path / "weights"))
    gain = quality.srgan_battery_gain_db(state)
    floor = quality.recorded_gate_floor(str(tmp_path / "weights"), "srgan",
                                        default=0.0, key="battery_gain_db")
    assert floor > 1.0, f"battery floor unexpectedly loose: {floor:.2f}"
    assert gain < floor, (
        f"degraded srgan still passes the battery gate ({gain:.2f} dB >= "
        f"{floor:.2f} dB) — the margin floor is too loose")


def test_degraded_checkpoint_fails_the_margin_gate(tmp_path):
    """Deliberately wreck 90% of the shipped denoise quality (scale the
    generator's conv kernels) and assert the margin-floor gate catches it —
    the old sign-only gate (> 1 dB) would NOT have (VERDICT r3 next #3)."""
    import os

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.ckpt import (
        load_checkpoint,
        save_checkpoint,
    )
    from celebrity_image_denoiser_tpu.serve import quality
    from celebrity_image_denoiser_tpu.serve.handlers import (
        ServeState,
        default_weights_dir,
    )

    src = os.path.join(default_weights_dir(), "denoise")
    if not os.path.isdir(src):
        pytest.skip("no shipped denoise checkpoint")
    sections, meta = load_checkpoint(src)
    rng = np.random.default_rng(0)

    def degrade(x):
        # heavy multiplicative + additive perturbation: the model still
        # roughly smooths (output PSNR stays positive-ish) but the margin
        # collapses — exactly the failure mode sign-gates miss
        return x + jnp.asarray(
            rng.normal(0, 0.15 * float(np.std(np.asarray(x)) + 1e-6),
                       x.shape).astype(np.asarray(x).dtype))

    import jax

    sections = dict(sections)
    sections["generator"] = jax.tree.map(degrade, sections["generator"])
    out = tmp_path / "weights" / "denoise"
    save_checkpoint(str(out), sections, meta=meta)
    # the degraded dir keeps the ORIGINAL meta.json margin (a real
    # regression wouldn't rewrite its own acceptance record)
    state = ServeState(weights_dir=str(tmp_path / "weights"))
    gain = quality.fixture_gain_db(state, "denoise")
    floor = quality.recorded_gate_floor(str(tmp_path / "weights"), "denoise",
                                        default=1.0)
    assert gain < floor, (
        f"degraded checkpoint still passes the gate ({gain:.2f} dB >= "
        f"{floor:.2f} dB) — the margin floor is too loose")


def test_shipped_cgan_keras_denoises(shipped_state):
    """The reference's shipped Keras cGAN checkpoint (trained on real faces)
    still beats the noisy input on the structured fixture through serving —
    the last of the five served models gets a quality assertion (VERDICT r2
    weak #1: 'two of five served models have no quality assertion')."""
    import os

    if shipped_state.keras_cgan is None:
        pytest.skip("no shipped keras cGAN weights")
    from PIL import Image

    clean = _structured_clean(64)
    rng = np.random.default_rng(1)
    noisy = np.clip(clean.astype(np.float64) + rng.normal(0, 25, clean.shape),
                    0, 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(noisy).save(buf, format="PNG")
    result = shipped_state.enhance("cgan", buf.getvalue(), "image/png",
                                   cgan_backend="keras", label=5,
                                   include_graph=False)
    assert result["backend"] == "keras"
    out = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(result["denoised_image_base64"]))))
    gain = _psnr_u8(out, clean) - _psnr_u8(noisy, clean)
    assert gain > 1.0, f"keras cgan gain only {gain:.2f} dB"


def test_static_ui_cgan_condition_fields(server):
    """The /ui page must expose the cGAN condition controls and their form
    field names must be exactly what the API parses (label, cond_file) —
    reference page.tsx:88-92."""
    with urllib.request.urlopen(server + "/ui") as r:
        html = r.read().decode()
    assert 'id="label"' in html and 'id="cond_file"' in html
    assert "50" in html  # upload limit surfaced
    # post with those exact field names + the UI's exact query string; the
    # torch fallback with a condition image reproduces the reference's
    # channel-mismatch crash, so this needs the shipped Keras weights
    from celebrity_image_denoiser_tpu.serve.handlers import (
        ServeState,
        default_weights_dir,
    )

    st = ServeState(weights_dir=default_weights_dir())
    if st.keras_cgan is None:
        pytest.skip("no shipped keras cGAN weights")
    srv = make_server("127.0.0.1", 0, state=st)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        body, ctype = _multipart({
            "file": ("a.png", "image/png", _png_bytes()),
            "label": (None, None, b"3"),
            "cond_file": ("c.png", "image/png", _png_bytes()),
        })
        status, data = _post(
            f"{url}/enhance?model=cgan&cgan_backend=keras", body, ctype)
        assert status == 200, data
        assert data["backend"] == "keras"
        assert data["denoised_image_base64"]
    finally:
        srv.shutdown()


def test_upload_limit_400():
    """50 MB cap (reference app.py:374-375) through the shared state."""
    from celebrity_image_denoiser_tpu.serve.handlers import (
        EnhanceError,
        MAX_UPLOAD,
        ServeState,
    )

    st = _server_state[next(iter(_server_state))] if _server_state else \
        ServeState(weights_dir="/nonexistent-weights")
    with pytest.raises(EnhanceError) as ei:
        st.enhance("denoise", b"x" * (MAX_UPLOAD + 1), "image/png")
    assert ei.value.status == 400 and "too large" in ei.value.detail.lower()


def test_mesh_sharded_serving_bit_exact():
    """ServeState(mesh=...) routes tall inputs through GSPMD spatial
    sharding (multi-chip serving) — output must be BIT-identical to the
    plain single-device forward of the same weights."""
    import jax

    from celebrity_image_denoiser_tpu.parallel import make_mesh
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh()
    st_plain = ServeState(weights_dir="/nonexistent-weights", seed=3)
    st_mesh = ServeState(weights_dir="/nonexistent-weights", seed=3,
                         mesh=mesh, tile_threshold_rows=32)
    from PIL import Image

    rng = np.random.default_rng(4)
    arr = rng.integers(0, 255, (64, 32, 3), dtype=np.uint8)  # H=64 = 8*8
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    a = st_plain.enhance("denoise", png, "image/png", include_graph=False)
    b = st_mesh.enhance("denoise", png, "image/png", include_graph=False)
    assert a["denoised_image_base64"] == b["denoised_image_base64"]


def test_tall_srgan_request_routes_through_tiler_and_matches():
    """A tall SRGAN request (rows > tile_threshold_rows) must route through
    the scale=4 single-device tiler (serve/handlers.py:256-261) and produce
    the same ×4 output as the untiled forward — the one north-star quadrant
    branch that was wired but never exercised (VERDICT r3 weak #2)."""
    from PIL import Image

    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st_tiled = ServeState(weights_dir="/nonexistent-weights", seed=7,
                          tile_threshold_rows=64)
    st_full = ServeState(weights_dir="/nonexistent-weights", seed=7)
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (96, 32, 3), dtype=np.uint8)  # 96 > 64 rows
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    r_t = st_tiled.enhance("srgan", png, "image/png", include_graph=False)
    r_f = st_full.enhance("srgan", png, "image/png", include_graph=False)
    # the tiled program was actually built and used
    assert ("tiled", "srgan", True, False) in st_tiled._fns
    assert not any(k[0] == "tiled" for k in st_full._fns
                   if isinstance(k, tuple))
    out_t = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_t["denoised_image_base64"]))))
    out_f = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_f["denoised_image_base64"]))))
    assert out_t.shape == (96 * 4, 32 * 4, 3)  # ×4 upscale survives tiling
    # tiled path returns floats converted on host; untiled quantizes on
    # device — allow 1 LSB of u8 rounding between the two exact paths
    assert out_t.shape == out_f.shape
    assert np.abs(out_t.astype(int) - out_f.astype(int)).max() <= 1


def test_wide_request_routes_through_width_tiler_and_matches():
    """A very WIDE request must tile too — the pre-round-4 routing checked
    only x.shape[1], so a 1024×200000 panorama bypassed the tiler and ran
    the full forward (review finding).  Width-oversized inputs now tile
    along axis 2 and stay exact."""
    from PIL import Image

    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st_tiled = ServeState(weights_dir="/nonexistent-weights", seed=7,
                          tile_threshold_rows=64)
    st_full = ServeState(weights_dir="/nonexistent-weights", seed=7)
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 256, (32, 96, 3), dtype=np.uint8)  # 96 > 64 cols
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    r_t = st_tiled.enhance("denoise", png, "image/png", include_graph=False)
    r_f = st_full.enhance("denoise", png, "image/png", include_graph=False)
    assert ("tiled", "denoise", False, True) in st_tiled._fns
    out_t = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_t["denoised_image_base64"]))))
    out_f = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_f["denoised_image_base64"]))))
    assert out_t.shape == (32, 96, 3)
    assert np.abs(out_t.astype(int) - out_f.astype(int)).max() <= 1


def test_both_axes_oversized_request_routes_through_nested_tiler():
    """Oversized on BOTH axes: the height tiler nests a width tiler inside
    each height tile's program and the result still matches the full
    forward."""
    from PIL import Image

    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st_tiled = ServeState(weights_dir="/nonexistent-weights", seed=7,
                          tile_threshold_rows=64)
    st_full = ServeState(weights_dir="/nonexistent-weights", seed=7)
    rng = np.random.default_rng(7)
    arr = rng.integers(0, 256, (96, 96, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    r_t = st_tiled.enhance("denoise", png, "image/png", include_graph=False)
    r_f = st_full.enhance("denoise", png, "image/png", include_graph=False)
    assert ("tiled", "denoise", True, True) in st_tiled._fns
    out_t = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_t["denoised_image_base64"]))))
    out_f = np.asarray(Image.open(
        io.BytesIO(base64.b64decode(r_f["denoised_image_base64"]))))
    assert np.abs(out_t.astype(int) - out_f.astype(int)).max() <= 1


def test_microbatching_coalesces_and_matches_sequential():
    """Concurrent same-shape requests must coalesce into fewer device
    batches (serve/batching.py) and return outputs equal to the unbatched
    forward (per-sample independence of eval-mode conv/BN)."""
    import concurrent.futures

    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    st_seq = ServeState(weights_dir="/nonexistent-weights", seed=5)
    st_mb = ServeState(weights_dir="/nonexistent-weights", seed=5,
                       microbatch_window_ms=30.0, microbatch_max=8)
    from PIL import Image

    rng = np.random.default_rng(6)
    pngs = []
    for i in range(6):
        arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        pngs.append(buf.getvalue())

    def run(st, png):
        return st.enhance("dncnn", png, "image/png", include_graph=False)

    seq = [run(st_seq, p)["denoised_image_base64"] for p in pngs]
    run(st_mb, pngs[0])  # warm the jit so the timed window isn't compile-bound
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        mb = list(ex.map(lambda p: run(st_mb, p)["denoised_image_base64"],
                         pngs))
    # outputs match the sequential forward (PNG u8 may differ by <=1 from
    # batched-vs-unbatched float noise; compare decoded pixels)
    for a, b in zip(seq, mb):
        ia = np.asarray(Image.open(io.BytesIO(base64.b64decode(a))), np.int16)
        ib = np.asarray(Image.open(io.BytesIO(base64.b64decode(b))), np.int16)
        assert np.max(np.abs(ia - ib)) <= 1
    stats = st_mb.batchers.stats()
    total_batches = sum(v["batches"] for v in stats.values())
    total_requests = sum(v["requests"] for v in stats.values())
    assert total_requests == 7  # 1 warm + 6 concurrent
    assert total_batches < 7, f"no coalescing happened: {stats}"


def test_empty_label_is_400(server):
    """label='' must 400 like the stdlib server always did (review r2 #6)."""
    from celebrity_image_denoiser_tpu.serve.handlers import (
        EnhanceError,
        run_enhance,
    )

    st = _server_state[server]
    with pytest.raises(EnhanceError) as ei:
        run_enhance(st, model="cgan", file_bytes=_png_bytes(),
                    content_type="image/png", label_raw="")
    assert ei.value.status == 400


def test_microbatch_chunk_error_isolated():
    """A failure in a later chunk must not poison earlier chunks' computed
    results (review r2 #4)."""
    import concurrent.futures

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.serve.batching import MicroBatcher

    calls = []

    def fn(xs):
        calls.append(xs.shape[0])
        if len(calls) > 1:  # second chunk fails
            raise RuntimeError("boom")
        return xs * 2.0

    mb = MicroBatcher(fn, window_ms=100.0, max_batch=4)
    xs = [jnp.full((1, 2), float(i)) for i in range(6)]
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        futs = [ex.submit(mb, x) for x in xs]
        results = []
        for f in futs:
            try:
                results.append(np.asarray(f.result()))
            except RuntimeError:
                results.append(None)
    ok = [r for r in results if r is not None]
    failed = [r for r in results if r is None]
    assert len(ok) == 4 and len(failed) == 2  # chunk1 of 4 fine, chunk2 raises


def test_microbatcher_config_validation_and_early_dispatch():
    """Invalid window/max must raise at construction (a crashed leader would
    strand deadline-free waiters); a full batch dispatches before the window
    elapses (review r2 pass-2)."""
    import time as _time

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.serve.batching import MicroBatcher

    with pytest.raises(ValueError):
        MicroBatcher(lambda x: x, window_ms=-1)
    with pytest.raises(ValueError):
        MicroBatcher(lambda x: x, max_batch=0)

    import concurrent.futures

    mb = MicroBatcher(lambda xs: xs * 2.0, window_ms=5000.0, max_batch=4)
    xs = [jnp.full((1, 2), float(i)) for i in range(4)]
    t0 = _time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        out = list(ex.map(mb, xs))
    dt = _time.perf_counter() - t0
    assert dt < 4.0, f"full batch should dispatch early, took {dt:.1f}s"
    for i, y in enumerate(out):
        assert float(np.asarray(y)[0, 0]) == 2.0 * i


def test_microbatcher_backpressure_coalesces_under_saturation():
    """With the shared in-flight slot + completion fence (VERDICT r2 #7
    'fix whatever falls over'), requests arriving while the device is busy
    must pile up and ride the next leader's batch — batch size adapts to
    service time instead of staying at 1 (async dispatch defeated the
    window-only design: at a 32-way mixed load, batches == requests)."""
    import concurrent.futures
    import threading
    import time as _time

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.serve.batching import MicroBatcher

    calls = []

    def slow_fn(xs):
        calls.append(xs.shape[0])
        _time.sleep(0.05)  # service time >> window + stagger
        return xs * 2.0

    mb = MicroBatcher(slow_fn, window_ms=1.0, max_batch=16,
                      slot=threading.BoundedSemaphore(1))
    xs = [jnp.full((1, 2), float(i)) for i in range(24)]

    def one(i):
        _time.sleep(0.002 * i)  # staggered arrivals, > the 1 ms window
        return i, mb(xs[i])

    with concurrent.futures.ThreadPoolExecutor(24) as ex:
        out = dict(ex.map(one, range(24)))
    for i in range(24):
        assert float(np.asarray(out[i])[0, 0]) == 2.0 * i
    # window-only coalescing would give ~24 batches here; backpressure
    # must collapse the tail into a few large batches
    assert mb.batches_run <= 12, (mb.batches_run, calls)
    assert max(calls) >= 4, calls


def test_microbatch_base_exception_marks_waiters_failed():
    """A BaseException inside the batched fn (e.g. KeyboardInterrupt) must
    wake that chunk's followers with a real error, not a KeyError('y')
    (ADVICE r2: batching.py _run finally-path)."""
    import concurrent.futures

    import jax.numpy as jnp

    from celebrity_image_denoiser_tpu.serve.batching import MicroBatcher

    class _Abort(BaseException):
        pass

    def fn(xs):
        raise _Abort()

    mb = MicroBatcher(fn, window_ms=100.0, max_batch=4)
    xs = [jnp.full((1, 2), float(i)) for i in range(3)]
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        futs = [ex.submit(mb, x) for x in xs]
        outcomes = []
        for f in futs:
            try:
                f.result(timeout=30)
                outcomes.append("ok")
            except _Abort:
                outcomes.append("abort")  # the leader re-raises the original
            except RuntimeError:
                outcomes.append("err")  # followers get the marked error
            except KeyError:
                outcomes.append("keyerror")  # the bug this test pins down
    assert "keyerror" not in outcomes
    assert outcomes.count("abort") == 1
    assert outcomes.count("err") == 2


def test_microbatcher_dp_mesh_dispatch_bit_exact():
    """With a >1-device mesh, the micro-batcher's coalesced batches shard
    data-parallel over the mesh (the BASELINE.json north star: 'batched
    inference shards data-parallel across chips over ICI') and the outputs
    stay bit-exact vs the single-device micro-batched path (VERDICT r2 weak
    #5).  Occupancies that don't divide the device count pad and crop."""
    import concurrent.futures

    import jax

    from celebrity_image_denoiser_tpu.parallel import make_mesh
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh()
    st_one = ServeState(weights_dir="/nonexistent-weights", seed=7,
                        microbatch_window_ms=30.0, microbatch_max=8)
    st_dp = ServeState(weights_dir="/nonexistent-weights", seed=7,
                       microbatch_window_ms=30.0, microbatch_max=8,
                       mesh=mesh)
    from PIL import Image

    rng = np.random.default_rng(8)
    pngs = []
    for _ in range(6):  # 6 % 8 != 0: exercises the pad-to-device-multiple
        arr = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)
        buf = io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        pngs.append(buf.getvalue())

    def run(st, png):
        return st.enhance("dncnn", png, "image/png",
                          include_graph=False)["denoised_image_base64"]

    run(st_one, pngs[0])
    run(st_dp, pngs[0])  # warm both jits
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        one = list(ex.map(lambda p: run(st_one, p), pngs))
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        dp = list(ex.map(lambda p: run(st_dp, p), pngs))
    assert one == dp  # u8 outputs: DP sharding must be bit-exact
    stats = st_dp.batchers.stats()
    assert sum(v["batches"] for v in stats.values()) < 7, stats
    # and the DP program was actually built (not the single-device fallback)
    assert ("dp", "dncnn") in st_dp._fns


def test_warmup_with_mesh_builds_dp_batch_programs():
    """warmup() must precompile the ('dp', model) sharded program the
    micro-batcher actually dispatches under a mesh — warming the
    single-device fn the batcher never calls leaves the first loaded burst
    to pay runtime XLA compiles (code-review r3 finding #1)."""
    import jax

    from celebrity_image_denoiser_tpu.parallel import make_mesh
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    st = ServeState(weights_dir="/nonexistent-weights", seed=0,
                    mesh=make_mesh(), microbatch_window_ms=2.0,
                    microbatch_max=8)
    st.warmup(sizes=((32, 32),), models=["dncnn"])
    assert ("dp", "dncnn") in st._fns, "DP batch program not warmed"


def test_serve_stats_thread_safety():
    """ServeStats mutates under the stdlib server's thread-per-connection
    model; hammer it from 8 threads and assert nothing is lost or torn."""
    import threading

    from celebrity_image_denoiser_tpu.serve.stats import ServeStats

    stats = ServeStats(window=64)
    n_per_thread = 500

    def worker(i):
        for j in range(n_per_thread):
            stats.record(f"model{i % 2}", 0.001 * (j + 1), "int8")
            if j % 7 == 0:
                stats.record_error(f"model{i % 2}", 400)
            if j % 13 == 0:
                stats.snapshot()  # concurrent reads must not tear

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    s = stats.snapshot()
    assert s["requests"]["model0"] + s["requests"]["model1"] == 8 * n_per_thread
    assert s["compute_backends"]["int8"] == 8 * n_per_thread
    assert sum(s["errors"].values()) == 8 * ((n_per_thread + 6) // 7)
    for m in ("model0", "model1"):
        assert s["latency"][m]["window"] == 64  # bounded deque
        assert s["latency"][m]["p50_ms"] > 0


def test_healthz_and_stats_routes(server):
    """Framework-addition observability (serve/stats.py): /healthz reports
    device + loaded weights; /stats aggregates request counts, latency
    quantiles over a sliding window, per-request compute-backend routing,
    and errors — none of which the reference backend exposes at all."""
    with urllib.request.urlopen(server + "/healthz") as r:
        h = json.loads(r.read())
    assert h["status"] == "ok"
    assert "models" in h and "denoise" in h["models"]
    assert "device" in h and "weights_loaded" in h

    # drive one good request and one 400 through the live server, then the
    # stats must reflect both
    body, ctype = _multipart({"file": ("x.png", "image/png", _png_bytes(16, 16))})
    status, _ = _post(server + "/enhance?model=denoise", body, ctype)
    assert status == 200
    status, _ = _post(server + "/enhance?model=not-a-model", body, ctype)
    assert status == 400
    # routing lowercases the model before validating, so stats must key the
    # canonical name — a mixed-case request must NOT mint its own series
    status, _ = _post(server + "/enhance?model=DeNoIsE", body, ctype)
    assert status == 200
    with urllib.request.urlopen(server + "/stats") as r:
        s = json.loads(r.read())
    assert s["requests"].get("denoise", 0) >= 2
    assert not any(k.lower() != k for k in s["requests"])
    assert s["latency"]["denoise"]["p50_ms"] > 0
    assert s["latency"]["denoise"]["window"] >= 1
    assert any(k.startswith("not-a-model:400") for k in s["errors"])
    # backend routing aggregated (this server quantizes by ServeState
    # default = None -> float)
    assert sum(s["compute_backends"].values()) >= 1
    assert s["uptime_s"] >= 0

    # Prometheus exposition of the same aggregates
    with urllib.request.urlopen(server + "/metrics") as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert 'cid_requests_total{model="denoise"}' in text
    assert 'cid_errors_total{model="not-a-model",status="400"}' in text
    assert 'cid_request_latency_seconds{model="denoise",quantile="0.5"}' in text
    assert "# TYPE cid_compute_backend_total counter" in text


def test_stats_sanitizes_keys_and_caps_error_cardinality():
    """?model= is attacker-controlled and lands in counter keys and
    Prometheus label values: injection characters must be stripped, long
    strings truncated, and distinct error keys bounded (unbounded dicts on
    a long-lived server are a slow memory leak)."""
    from celebrity_image_denoiser_tpu.serve.stats import ServeStats

    stats = ServeStats(window=8)
    stats.record('evil"}\ncid_requests_total{model="x', 0.01, "int8\\")
    s = stats.snapshot()
    # quotes/newlines/braces/backslashes stripped from both label values
    (model_key,) = s["requests"].keys()
    (backend_key,) = s["compute_backends"].keys()
    for k in (model_key, backend_key):
        assert not set(k) & set('"\n{}\\= '), k
    stats.record_error("x" * 500, 400)
    long_keys = [k for k in stats.snapshot()["errors"] if k.startswith("x")]
    assert long_keys and len(long_keys[0]) <= 44  # 40-char model cap + :400

    # cardinality cap: unknown model strings overflow into other:<status>
    for i in range(ServeStats.MAX_ERROR_KEYS + 50):
        stats.record_error(f"m{i}", 400)
    errs = stats.snapshot()["errors"]
    assert len(errs) <= ServeStats.MAX_ERROR_KEYS + 1
    assert errs["other:400"] >= 50 - 1
    # known keys keep counting after the cap
    before = errs[f"m0:400"]
    stats.record_error("m0", 400)
    assert stats.snapshot()["errors"]["m0:400"] == before + 1


def test_error_stats_counted_exactly_once(server):
    """Failures raised INSIDE run_enhance (label 400) and BEFORE it (no
    file field) each increment the error counters by exactly one — the
    front ends check the _stats_recorded marker so the shared path and
    the handler never double count (serve/handlers.py:90-99)."""
    st = _server_state[server]
    png = _png_bytes(16, 16)

    def errors():
        return dict(st.stats.snapshot()["errors"])

    base = errors().get("cgan:400", 0)
    body, ctype = _multipart({"file": ("x.png", "image/png", png),
                              "label": (None, None, b"not-an-int")})
    status, _ = _post(server + "/enhance?model=cgan", body, ctype)
    assert status == 400
    assert errors().get("cgan:400", 0) == base + 1  # inside run_enhance

    base = errors().get("denoise:400", 0)
    body, ctype = _multipart({"other": (None, None, b"zzz")})  # no file
    status, _ = _post(server + "/enhance?model=denoise", body, ctype)
    assert status == 400
    assert errors().get("denoise:400", 0) == base + 1  # before run_enhance


def test_malformed_meta_json_gates_default_floor(tmp_path):
    """A truncated/garbage meta.json (retrain interrupted mid-rewrite) must
    fall back to the default gate floor, not crash gate evaluation."""
    from celebrity_image_denoiser_tpu.serve.quality import recorded_gate_floor

    d = tmp_path / "denoise"
    d.mkdir()
    for payload in ('{"fixture_gain_db": 7.', '[]', '{"fixture_gain_db": "hi"}',
                    '{"fixture_gain_db": null}'):
        (d / "meta.json").write_text(payload)
        assert recorded_gate_floor(str(tmp_path), "denoise", 1.0) == 1.0
    (d / "meta.json").write_text('{"fixture_gain_db": 10.0}')
    assert recorded_gate_floor(str(tmp_path), "denoise", 1.0) == pytest.approx(7.0)


def test_fastapi_validation_errors_counted():
    """Failures raised BEFORE run_enhance on the FastAPI stack (missing
    file → RequestValidationError) must reach the error counters too, so
    the two front ends' /metrics agree (exactly-once parity)."""
    pytest.importorskip("fastapi")
    from fastapi.testclient import TestClient

    from celebrity_image_denoiser_tpu.serve.app import create_fastapi_app

    app = create_fastapi_app(weights_dir="/nonexistent-weights")
    client = TestClient(app)
    r = client.post("/enhance?model=denoise")  # no file part
    assert r.status_code == 422
    # the app factory closes over its ServeState; read counters via /stats
    s = client.get("/stats").json()
    assert s["errors"].get("denoise:422") == 1
    # a label 400 raised INSIDE run_enhance is still counted exactly once
    r = client.post("/enhance?model=cgan", data={"label": "zzz"},
                    files={"file": ("a.png", "image/png", _png_bytes())})
    assert r.status_code == 400
    s = client.get("/stats").json()
    assert s["errors"].get("cgan:400") == 1


def test_negative_or_malformed_content_length_400(server):
    """A negative Content-Length must 400 before any body buffering —
    rfile.read(-1) would otherwise buffer an unbounded stream until the
    client closes (the exact DoS the pre-buffer guard exists to stop);
    a non-integer header must 400 too, not surface as a model 500."""
    import socket

    host, port = server.replace("http://", "").split(":")

    def raw_post(cl_value):
        with socket.create_connection((host, int(port)), timeout=10) as s:
            s.sendall((
                "POST /enhance?model=denoise HTTP/1.1\r\n"
                f"Host: {host}\r\n"
                "Content-Type: multipart/form-data; boundary=x\r\n"
                f"Content-Length: {cl_value}\r\n"
                "Connection: close\r\n\r\n").encode())
            # a little body the server must NOT wait on
            s.sendall(b"--x--\r\n")
            data = s.recv(4096)
        return data.split(b" ", 2)[1]

    assert raw_post("-1") == b"400"
    assert raw_post("abc") == b"400"


def test_stats_backend_labels_keep_plus(server):
    """Compute-backend routing labels are 'int8+tiled'-shaped: the key
    sanitizer must keep '+' so /stats and /metrics report the same name
    the per-request log line and the docs use."""
    from celebrity_image_denoiser_tpu.serve.stats import ServeStats

    st = ServeStats()
    st.record("denoise", 0.01, "int8+tiled")
    st.record("denoise", 0.01, "float+sharded")
    snap = st.snapshot()
    assert snap["compute_backends"] == {"int8+tiled": 1, "float+sharded": 1}
    assert 'backend="int8+tiled"' in st.prometheus()


def test_both_axes_oversized_mesh_without_tiling_still_shards():
    """mesh>1 + use_tiling=False + an input oversized on BOTH axes must
    still run the height-sharded GSPMD forward (bit-exact vs single
    device), not fall through to the full-image single-shot the big-input
    routing exists to protect against (review finding, round 4)."""
    import jax

    from celebrity_image_denoiser_tpu.parallel import make_mesh
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from PIL import Image

    mesh = make_mesh()
    st_plain = ServeState(weights_dir="/nonexistent-weights", seed=3)
    st_mesh = ServeState(weights_dir="/nonexistent-weights", seed=3,
                         mesh=mesh, tile_threshold_rows=16,
                         use_tiling=False)
    rng = np.random.default_rng(6)
    arr = rng.integers(0, 255, (32, 24, 3), dtype=np.uint8)  # both > 16
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    a = st_plain.enhance("denoise", png, "image/png", include_graph=False)
    b = st_mesh.enhance("denoise", png, "image/png", include_graph=False)
    assert a["denoised_image_base64"] == b["denoised_image_base64"]
    snap = st_mesh.stats.snapshot()
    assert any(k.endswith("+sharded") for k in snap["compute_backends"]), (
        snap["compute_backends"])


def test_direct_enhance_counts_stats():
    """Stats accounting lives in ServeState.enhance itself: a direct /
    library call (no HTTP front end) must increment request, latency AND
    compute-backend counters (VERDICT r4 weak #2 — previously only
    run_enhance recorded, so embedders were invisible in /stats)."""
    from celebrity_image_denoiser_tpu.serve.handlers import (
        EnhanceError,
        ServeState,
    )

    st = ServeState(weights_dir="/nonexistent-weights", seed=1)
    st.enhance("denoise", _png_bytes(16, 16), "image/png",
               include_graph=False)
    snap = st.stats.snapshot()
    assert snap["requests"].get("denoise") == 1
    assert snap["latency"]["denoise"]["window"] == 1
    assert sum(snap["compute_backends"].values()) == 1
    # errors raised by enhance are counted here too, exactly once
    with pytest.raises(EnhanceError):
        st.enhance("nosuch", b"x", "image/png")
    assert st.stats.snapshot()["errors"].get("nosuch:400") == 1


def test_both_axes_oversized_width_divisible_shards_width():
    """Both axes oversized, tiling disabled, HEIGHT not a device multiple
    but WIDTH is: the router must shard the width axis instead of falling
    through to the full-image single-shot (ADVICE r4: divisibility on
    either oversized axis suffices)."""
    import jax

    from celebrity_image_denoiser_tpu.parallel import make_mesh
    from celebrity_image_denoiser_tpu.serve.handlers import ServeState

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    from PIL import Image

    mesh = make_mesh()
    st_plain = ServeState(weights_dir="/nonexistent-weights", seed=3)
    st_mesh = ServeState(weights_dir="/nonexistent-weights", seed=3,
                         mesh=mesh, tile_threshold_rows=16,
                         use_tiling=False)
    rng = np.random.default_rng(9)
    # padded height 28 (not %8), padded width 24 (%8): width shard fires
    arr = rng.integers(0, 255, (27, 24, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    png = buf.getvalue()
    a = st_plain.enhance("denoise", png, "image/png", include_graph=False)
    b = st_mesh.enhance("denoise", png, "image/png", include_graph=False)
    assert a["denoised_image_base64"] == b["denoised_image_base64"]
    assert st_mesh.last_compute_backend().endswith("+sharded")


def test_recorded_margin_distinguishes_modest_from_missing(tmp_path):
    """recorded_margin must distinguish 'recorded but modest' (gates use
    the default floor but do NOT complain about a missing recording) from
    'nothing recorded' — a floor value alone cannot."""
    import json as _json

    from celebrity_image_denoiser_tpu.serve.quality import (
        recorded_gate_floor,
        recorded_margin,
    )

    d = tmp_path / "dncnn"
    d.mkdir()
    assert recorded_margin(str(tmp_path), "dncnn") is None  # no meta at all
    (d / "meta.json").write_text(_json.dumps({"fixture_gain_db": 1.3}))
    # modest margin: floor clamps to the default…
    assert recorded_gate_floor(str(tmp_path), "dncnn", 1.0) == 1.0
    # …but the recording is visibly present
    assert recorded_margin(str(tmp_path), "dncnn") == pytest.approx(1.3)
    (d / "meta.json").write_text('{"fixture_gain_db": true}')
    assert recorded_margin(str(tmp_path), "dncnn") is None  # bool ≠ number
