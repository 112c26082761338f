"""Batch normalization with running statistics, NHWC.

Functional replacement for ``nn.BatchNorm2d`` (torch convention, eps=1e-5,
momentum=0.1: running = (1-m)*running + m*batch) and Keras
``layers.BatchNormalization`` (eps=1e-3, momentum=0.99:
running = m*running + (1-m)*batch) — both conventions used by the reference
(training.py:84-91 torch; training5Pbar.py:23-31 keras).

State (running mean/var) is threaded explicitly: ``batch_norm`` returns the
updated statistics so the whole train step stays a pure function under jit.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp


def batch_norm(
    x: jax.Array,
    params: Dict[str, jax.Array],
    state: Dict[str, jax.Array],
    *,
    train: bool,
    eps: float = 1e-5,
    momentum: float = 0.1,
    keras_momentum: bool = False,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """params: {scale, bias}; state: {mean, var}. Normalizes over (N, H, W).

    In train mode uses batch statistics and returns updated running stats.
    The normalizer always uses the biased batch variance; the running-var
    update is unbiased (Bessel-corrected) in the torch convention but biased
    in the Keras one — Keras 3 feeds ``moving_variance`` the same biased
    variance it normalizes with (golden-tested against real Keras in
    tests/test_tf_golden.py).  In eval mode uses the running stats unchanged.
    """
    scale, bias = params["scale"], params["bias"]
    if train:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.size // x.shape[-1]
        unbiased = var * (n / max(n - 1, 1))
        if keras_momentum:
            new_mean = momentum * state["mean"] + (1.0 - momentum) * mean
            new_var = momentum * state["var"] + (1.0 - momentum) * var
        else:
            new_mean = (1.0 - momentum) * state["mean"] + momentum * mean
            new_var = (1.0 - momentum) * state["var"] + momentum * unbiased
        new_state = {"mean": new_mean, "var": new_var}
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    inv = jax.lax.rsqrt(var.astype(jnp.float32) + eps).astype(x.dtype)
    y = (x - mean.astype(x.dtype)) * inv * scale.astype(x.dtype) + bias.astype(x.dtype)
    return y, new_state
