"""Minimal functional module system (init/apply).

The reference leans on two stateful frameworks (torch ``nn.Module`` and
``tf.keras`` — e.g. app.py:39-218, training5Pbar.py:16-54).  On TPU the whole
train/infer step must be a pure function XLA can trace once, so modules here
are *descriptions*: ``init(rng) -> (params, state)`` builds pytrees, and
``apply(params, state, x, train=...) -> (y, new_state)`` is pure.  Params and
running statistics (BatchNorm) are threaded explicitly; nothing is mutated.

Naming mirrors torch's ``state_dict`` layout (``down1.0.kernel`` etc. with
Sequential children keyed by their torch child index) so the .pth importer in
ckpt/torch_import.py is a mechanical key/layout translation.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

Params = Dict[str, Any]
State = Dict[str, Any]


class Module:
    """Base class.  Subclasses either:

    * register named children via ``self.add(name, module)`` and implement
      ``forward(self, P, S, x, train)`` using ``self.call(name, P, S, x,
      train)`` for each child, or
    * override ``init`` / ``apply`` directly (leaf layers).
    """

    def __init__(self):
        self._children: Dict[str, "Module"] = {}

    # -- child registration ------------------------------------------------
    def add(self, name: str, module: "Module") -> "Module":
        self._children[name] = module
        return module

    @property
    def children(self) -> Dict[str, "Module"]:
        return self._children

    # -- functional API ----------------------------------------------------
    def init(self, rng: jax.Array) -> Tuple[Params, State]:
        params: Params = {}
        state: State = {}
        keys = jax.random.split(rng, max(len(self._children), 1))
        for key, (name, child) in zip(keys, self._children.items()):
            p, s = child.init(key)
            if p:
                params[name] = p
            if s:
                state[name] = s
        return params, state

    def apply(
        self, params: Params, state: State, *args, train: bool = False
    ) -> Tuple[Any, State]:
        return self.forward(params, state, *args, train=train)

    def forward(self, params, state, *args, train: bool = False):
        raise NotImplementedError

    # -- helper for running a named child and collecting its new state -----
    def call(
        self,
        name: str,
        params: Params,
        state: State,
        new_state: State,
        *args,
        train: bool = False,
    ):
        child = self._children[name]
        y, s = child.apply(
            params.get(name, {}), state.get(name, {}), *args, train=train
        )
        if s:
            new_state[name] = s
        return y


class Sequential(Module):
    """Children keyed '0', '1', ... by position — including parameter-less
    layers, matching torch ``nn.Sequential`` indexing so imported
    ``model.3.weight``-style keys line up."""

    def __init__(self, *layers: Module):
        super().__init__()
        for i, layer in enumerate(layers):
            self.add(str(i), layer)

    def forward(self, params, state, x, *, train: bool = False):
        new_state: State = {}
        for name in self._children:
            x = self.call(name, params, state, new_state, x, train=train)
        return x, new_state

    def slice(self, start: int, stop: int) -> "Sequential":
        """Sub-sequence view (used by the torch-arch cGAN's ``model[0:2]``
        split at reference app.py:141-142).  Parameters keep their original
        indices, so the same param tree works for the slice."""
        sub = Sequential()
        names = list(self._children)[start:stop]
        for n in names:
            sub.add(n, self._children[n])
        return sub


class Lambda(Module):
    """Stateless elementwise / reshaping layer."""

    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def init(self, rng):
        return {}, {}

    def apply(self, params, state, x, *, train: bool = False):
        return self.fn(x), {}
