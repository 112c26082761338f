"""Per-request analysis graphs.

Port of ``make_graphs`` (reference app.py:302-313): a 3-panel matplotlib
figure — noise map (input − output, shifted to [0,1]), absolute error map at
2× gain, and a 50-bin histogram of the differences — returned as a base64
PNG with the same layout/titles so the frontend renders identically.
"""

from __future__ import annotations

import base64
import io

import numpy as np


def fig_to_base64(fig) -> str:
    """Works for both pyplot-managed figures and bare Figure objects; uses
    only per-figure methods (no pyplot global current-figure state)."""
    buf = io.BytesIO()
    fig.tight_layout()
    fig.savefig(buf, format="PNG")
    try:  # release pyplot's registry entry if this figure is registered
        import matplotlib.pyplot as plt

        plt.close(fig)
    except Exception:
        pass
    buf.seek(0)
    return base64.b64encode(buf.read()).decode("utf-8")


# imshow renders into a ~1500x500 px canvas; feeding it more pixels than
# that only slows the figure down (the 1024² SRGAN case spent ~4 s of its
# 5.3 s warm latency here, benchmarks/kernel_notes.md) — the panels are
# diagnostic, not pixel-exact.  Histogram still uses every pixel.
_MAX_PANEL_ROWS = 512


def _panel_view(img: np.ndarray) -> np.ndarray:
    h = img.shape[0]
    if h <= _MAX_PANEL_ROWS:
        return img
    stride = -(-h // _MAX_PANEL_ROWS)  # ceil
    return img[::stride, ::stride]


def make_graphs(input_vis: np.ndarray, output_vis: np.ndarray) -> str:
    """input_vis/output_vis: float HWC in [0,1] (the cropped view tensors).

    Built with the object-oriented Figure API (no pyplot): the serving
    stack renders figures from concurrent request threads, and pyplot's
    global current-figure registry is not thread-safe."""
    from matplotlib.figure import Figure

    noise = np.asarray(input_vis, np.float32) - np.asarray(output_vis, np.float32)
    noise_panel = _panel_view(noise)
    fig = Figure(figsize=(15, 5))
    axs = fig.subplots(1, 3)
    axs[0].imshow(np.clip(noise_panel * 0.5 + 0.5, 0, 1))
    axs[0].set_title("Noise Map (Input - Output)")
    axs[0].axis("off")
    axs[1].imshow(np.clip(np.abs(noise_panel) * 2.0, 0, 1))
    axs[1].set_title("Absolute Error Map")
    axs[1].axis("off")
    axs[2].hist(noise.flatten(), bins=50)
    axs[2].set_title("Histogram of Noise Values")
    axs[2].set_xlabel("Difference")
    axs[2].set_ylabel("Frequency")
    return fig_to_base64(fig)
