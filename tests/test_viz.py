"""Analysis-figure renderer (viz/analysis.py) — the template-reuse fast path
(VERDICT r3 next #8) must stay correct: same panels/titles/bins, reacts to
the data, and is safe from concurrent request threads."""

import base64
import concurrent.futures
import io

import numpy as np

from celebrity_image_denoiser_tpu.viz.analysis import make_graphs


def _decode(b64):
    from PIL import Image

    return Image.open(io.BytesIO(base64.b64decode(b64)))


def test_make_graphs_decodes_and_reacts_to_data():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    y1 = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    y2 = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
    g1 = make_graphs(x, y1)
    g1b = make_graphs(x, y1)
    g2 = make_graphs(x, y2)
    img = _decode(g1)
    assert img.size[0] > img.size[1]  # 3 panels side by side (15x5 inches)
    # deterministic for same data, different for different data — guards
    # against a stale template rendering the previous request's arrays
    assert g1 == g1b
    assert g1 != g2


def test_make_graphs_identical_images_degenerate_histogram():
    """All-zero noise (output == input) must not crash the bar-update path
    (degenerate histogram range / zero max count)."""
    x = np.full((32, 32, 3), 0.5, np.float32)
    g = make_graphs(x, x)
    assert _decode(g).size[0] > 0


def test_make_graphs_thread_safety():
    """Concurrent renders (the serving threadpool) must each produce a valid
    PNG equal to the single-threaded render of the same data — per-thread
    templates, no shared mutable artists."""
    rng = np.random.default_rng(1)
    inputs = []
    for i in range(6):
        x = rng.uniform(0, 1, (48, 48, 3)).astype(np.float32)
        y = np.clip(x + rng.normal(0, 0.03 * (i + 1), x.shape),
                    0, 1).astype(np.float32)
        inputs.append((x, y))
    expected = [make_graphs(x, y) for x, y in inputs]
    with concurrent.futures.ThreadPoolExecutor(6) as ex:
        got = list(ex.map(lambda p: make_graphs(*p), inputs))
    assert got == expected


def test_make_graphs_big_input_downsampled_panels_full_histogram():
    """>512-row inputs downsample the imshow panels (latency guard) but the
    histogram still sees every pixel."""
    rng = np.random.default_rng(2)
    x = rng.uniform(0, 1, (1024, 64, 3)).astype(np.float32)
    y = np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1).astype(np.float32)
    g = make_graphs(x, y)
    assert _decode(g).size[0] > 0
