"""Persistent XLA compilation cache.

Cold serving compiles cost 36-61 s per model per input shape on the
tunneled v5e (benchmarks/kernel_notes.md); the reference pays its model
load once per process too (app.py:319-345) but has no compiled-program
reuse at all.  JAX's persistent cache works through this PJRT backend
(measured 3.3 s -> 1.0 s across processes for a 320² U-Net forward), so
server/trainer restarts skip recompilation entirely.
"""

from __future__ import annotations

import os
from typing import Optional

from celebrity_image_denoiser_tpu.utils.logging import get_logger

logger = get_logger("cid_tpu.compile_cache")

_DEFAULT = os.path.join(os.path.expanduser("~"), ".cache", "cid_tpu", "xla")


def enable(path: Optional[str] = None) -> str:
    """Point jax at a persistent compilation cache dir (created if needed).
    Call before the first jit compilation; safe to call repeatedly."""
    import jax

    path = path or _DEFAULT
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    logger.info("persistent XLA compilation cache: %s", path)
    return path


def add_cli_arg(parser) -> None:
    """The shared --compilation-cache flag (cli.serve and cli.train)."""
    parser.add_argument(
        "--compilation-cache", default="auto",
        help="persistent XLA compilation cache dir so restarts skip "
             "recompiles ('auto' = ~/.cache/cid_tpu/xla; 'off' disables)")


def enable_from_arg(value: str) -> Optional[str]:
    if value == "off":
        return None
    return enable(None if value == "auto" else value)
