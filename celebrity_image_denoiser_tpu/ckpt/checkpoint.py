"""Native checkpoint format: save/restore with actual resume.

The reference saves full trainer state every epoch but never loads one to
continue training (SURVEY.md §5: "save-only, no resume"; training.py:359-376).
Here checkpoints are a directory of ``.npz`` pytree leaves + a JSON metadata
blob, and the trainer resumes from them (params, opt state, BN stats, epoch,
best PSNR, metric history).

Format: ``<path>/arrays.npz`` holds every array leaf under its dotted path
(section-prefixed: ``params.g.down1.0.kernel``); ``<path>/meta.json`` holds
scalars/history.  Dependency-free, host-portable, and mesh-agnostic — arrays
are saved as host numpy and re-sharded on restore by whatever shardings the
caller jits with.
"""

from __future__ import annotations

import json
import os
import re
import threading
from typing import Any, Dict, Optional

import jax
import numpy as np

from celebrity_image_denoiser_tpu.utils import tree as treelib
from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.ckpt")

_ESC = "\x00"  # npz keys can't collide with '/' paths; keep dotted paths


_pending_saves: list = []
_save_errors: list = []


def save_checkpoint(path: str, sections: Dict[str, Any],
                    meta: Optional[Dict] = None,
                    async_write: bool = False) -> None:
    """sections: {"g_params": tree, "d_params": tree, ...} of array pytrees;
    meta: JSON-serializable scalars (epoch, best_psnr, metric_history...).

    Writes are **atomic**: arrays land in a temp file os.replace'd into
    place, so a crash mid-write never leaves a truncated arrays.npz for
    latest_checkpoint() to pick up.

    ``async_write``: D2H transfer and a meta snapshot happen inline;
    serialization/compression/IO runs on a background thread so training
    resumes immediately.  Call ``wait_for_saves()`` before relying on the
    files — it re-raises the first background write error.
    """
    flat: Dict[str, np.ndarray] = {}
    for section, t in sections.items():
        if t is None:
            continue
        for k, v in treelib.flatten(t, section).items():
            flat[k] = np.asarray(jax.device_get(v))
    # snapshot now: callers keep mutating live objects (metric_history)
    # while the background thread serializes
    meta_json = json.dumps(meta or {}, indent=1, default=float)

    def write():
        try:
            os.makedirs(path, exist_ok=True)
            tmp = os.path.join(path, ".arrays.npz.tmp")
            with open(tmp, "wb") as f:
                np.savez(f, **flat)
            os.replace(tmp, os.path.join(path, "arrays.npz"))
            tmp_meta = os.path.join(path, ".meta.json.tmp")
            with open(tmp_meta, "w") as f:
                f.write(meta_json)
            os.replace(tmp_meta, os.path.join(path, "meta.json"))
            logger.info("saved checkpoint: %s (%d arrays)", path, len(flat))
        except Exception as e:
            logger.error("checkpoint write failed: %s (%s)", path, e)
            _save_errors.append(e)
            raise

    if async_write:
        t = threading.Thread(target=write, daemon=True)
        t.start()
        _pending_saves.append(t)
    else:
        write()


def wait_for_saves() -> None:
    """Block until all async checkpoint writes complete; re-raise the first
    background write error (a silently missing checkpoint is worse than a
    loud failure)."""
    while _pending_saves:
        _pending_saves.pop().join()
    if _save_errors:
        err = _save_errors[0]
        _save_errors.clear()
        raise err


def load_checkpoint(path: str):
    """Returns (sections, meta) — sections is a dict of pytrees keyed by the
    section names passed at save time."""
    with np.load(os.path.join(path, "arrays.npz")) as z:
        flat = {k: z[k] for k in z.files}
    nested = treelib.unflatten(flat)
    meta_path = os.path.join(path, "meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return nested, meta


def latest_checkpoint(checkpoint_dir: str, prefix: str = "") -> Optional[str]:
    """Find the newest ``<prefix>epoch_<N>`` checkpoint directory for resume."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best_epoch, best = -1, None
    pat = re.compile(re.escape(prefix) + r"epoch_(\d+)$")
    for name in os.listdir(checkpoint_dir):
        m = pat.search(name)
        full = os.path.join(checkpoint_dir, name)
        if m and os.path.isdir(full) and os.path.exists(os.path.join(full, "arrays.npz")):
            e = int(m.group(1))
            if e > best_epoch:
                best_epoch, best = e, full
    return best
