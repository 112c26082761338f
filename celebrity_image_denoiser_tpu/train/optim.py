"""First-party optimizers and LR schedules.

The reference trains with ``optim.Adam(lr=1e-4, betas=(0.9, 0.999))`` +
``StepLR(step_size=30, gamma=0.1)`` (training.py:239-242) and Keras Adam
(training5Pbar.py:166-167).  These are implemented here directly — tiny,
pure-pytree, jit-friendly — so the framework has no optimizer dependency.

Interface (optax-style pair of pure functions):
    init(params) -> opt_state
    update(grads, opt_state, params, lr) -> (new_params, new_opt_state)

``lr`` is passed per-call so host-side schedules (StepLR steps per *epoch*,
training.py:439-440) don't trigger recompilation: it enters the jitted step
as a scalar argument.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jax.Array
    mu: dict
    nu: dict


def adam(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """torch-convention Adam: bias-corrected moments, eps outside the sqrt
    of the corrected second moment."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state: AdamState, params, lr):
        step = state.step + 1
        t = step.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, grads)
        bc1 = 1 - b1 ** t
        bc2 = 1 - b2 ** t

        def upd(p, m, v):
            m_hat = m / bc1
            v_hat = v / bc2
            return p - lr * m_hat / (jnp.sqrt(v_hat) + eps)

        new_params = jax.tree.map(upd, params, mu, nu)
        return new_params, AdamState(step=step, mu=mu, nu=nu)

    return init, update


def adam_keras(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-7):
    """Keras-convention Adam — the optimizer the reference's cGAN trainer
    actually uses (``tf.keras.optimizers.Adam(1e-4)``, training5Pbar.py:
    166-167).  Same moment updates as torch, but the step applies
    ``alpha = lr * sqrt(1 - b2^t) / (1 - b1^t)`` and adds eps to the
    UNCORRECTED ``sqrt(v)`` (keras/src/optimizers/adam.py), with default
    eps 1e-7 (torch: 1e-8 on the corrected ``sqrt(v_hat)``).  Golden-tested
    against real ``keras.optimizers.Adam`` in tests/test_tf_golden.py."""

    def init(params):
        zeros = jax.tree.map(jnp.zeros_like, params)
        return AdamState(step=jnp.zeros((), jnp.int32), mu=zeros,
                         nu=jax.tree.map(jnp.zeros_like, params))

    def update(grads, state: AdamState, params, lr):
        step = state.step + 1
        t = step.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
        nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * (g * g), state.nu, grads)
        alpha = lr * jnp.sqrt(1 - b2 ** t) / (1 - b1 ** t)

        def upd(p, m, v):
            return p - alpha * m / (jnp.sqrt(v) + eps)

        new_params = jax.tree.map(upd, params, mu, nu)
        return new_params, AdamState(step=step, mu=mu, nu=nu)

    return init, update


def sgd(momentum: float = 0.0):
    def init(params):
        if momentum == 0.0:
            return {}
        return {"velocity": jax.tree.map(jnp.zeros_like, params)}

    def update(grads, state, params, lr):
        if momentum == 0.0:
            return jax.tree.map(lambda p, g: p - lr * g, params, grads), state
        vel = jax.tree.map(lambda v, g: momentum * v + g, state["velocity"], grads)
        new_params = jax.tree.map(lambda p, v: p - lr * v, params, vel)
        return new_params, {"velocity": vel}

    return init, update


def step_lr(base_lr: float, step_size: int = 30, gamma: float = 0.1) -> Callable[[int], float]:
    """torch StepLR: lr = base * gamma^(epoch // step_size)."""

    def schedule(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))

    return schedule


def constant_lr(base_lr: float) -> Callable[[int], float]:
    return lambda _: base_lr
