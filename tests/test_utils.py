"""utils + device-resize coverage: profiling helpers, tree paths, and
jax.image bicubic vs PIL tolerance (the device resize replaces PIL in the
on-device pipeline; they use different bicubic conventions, so the check is
a bounded-difference sanity, not bit parity — PIL parity is the C++ native
stage's job, tests/test_native.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from celebrity_image_denoiser_tpu import ops
from celebrity_image_denoiser_tpu.utils import tree
from celebrity_image_denoiser_tpu.utils.profiling import StepTimer, debug_nans


def test_tree_flatten_roundtrip():
    t = {"a": {"b": 1, "c": {"d": 2}}, "e": 3}
    flat = tree.flatten(t)
    assert flat == {"a.b": 1, "a.c.d": 2, "e": 3}
    assert tree.unflatten(flat) == t
    assert tree.get_path(t, "a.c.d") == 2
    assert tree.get_path(t, "a.x", default=-1) == -1
    tree.set_path(t, "a.x.y", 9)
    assert t["a"]["x"]["y"] == 9


def test_step_timer_accounting():
    import time

    st = StepTimer()
    for _ in range(3):
        st.start()
        time.sleep(0.01)
        st.stop(items=4)
    s = st.summary()
    assert s["steps"] == 3
    assert s["mean_ms"] >= 10.0
    assert 0 < s["items_per_s"] <= 4 / 0.01


def test_debug_nans_context():
    import jax

    with debug_nans(True):
        assert jax.config.jax_debug_nans
        with pytest.raises(FloatingPointError):
            # 0/0 -> NaN (1/0 is inf, which debug_nans ignores)
            jax.jit(lambda x: x / x)(jnp.float32(0.0)).block_until_ready()
    assert not jax.config.jax_debug_nans


def test_device_resize_tracks_pil(rng_np):
    from PIL import Image

    img = rng_np.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    up = np.asarray(ops.resize_bicubic(jnp.asarray(img), (128, 128)))
    ref = np.asarray(Image.fromarray(img).resize((128, 128),
                                                 Image.Resampling.BICUBIC))
    # upscale: both are classic 4-tap bicubic; small fixed-point deltas
    assert np.mean(np.abs(up.astype(int) - ref.astype(int))) < 3.0

    down = np.asarray(ops.resize_bicubic(jnp.asarray(img), (32, 32)))
    refd = np.asarray(Image.fromarray(img).resize((32, 32),
                                                  Image.Resampling.BICUBIC))
    # downscale: jax.image antialiases like PIL; means must track closely
    assert abs(down.mean() - refd.mean()) < 2.0
    assert np.mean(np.abs(down.astype(int) - refd.astype(int))) < 12.0
