"""Jitted model initialization.

flax `Module.init` runs eagerly op-by-op; through a remote-dispatch TPU
backend each op is an RPC round-trip, turning init into minutes. Wrapping
init in jit compiles the whole initializer into one program (~seconds).
"""

from __future__ import annotations

import jax


def jit_init(model, rng, batch, train: bool = False):
    """One-program model.init; returns the variables dict."""
    @jax.jit
    def _init(rng, batch):
        return model.init(rng, batch, train=train)

    return _init(rng, batch)
