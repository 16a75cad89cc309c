"""Standalone exponential moving average of a parameter pytree.

Mirrors the reference's ``ExponentialMovingAverage``
(/root/reference/pnpflow/image_generation/models/ema.py:10-98): the
warmup-dependent decay ``min(decay, (1+n)/(10+n))``, ``update`` /
``copy_to`` / ``store`` / ``restore`` and a serializable state dict.

TPU-first: state is an immutable pytree (jit/scan/shard-friendly — carry
it through the train step like any other state leaf) and ``update`` is a
pure function.  The FM trainer keeps its inlined fixed-decay EMA
(training/flow_matching.py:61-73) for the fused step; this module is the
full-surface equivalent for RF-style training loops and checkpoint
interop.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    shadow: Any            # pytree of averaged params
    num_updates: Any       # int32 scalar, or None when warmup is disabled
    decay: float


def init(params, decay: float, use_num_updates: bool = True) -> EMAState:
    """Start the average at the current parameters (ema.py:27-30)."""
    if decay < 0.0 or decay > 1.0:
        raise ValueError("Decay must be between 0 and 1")
    return EMAState(
        shadow=jax.tree_util.tree_map(jnp.asarray, params),
        num_updates=jnp.int32(0) if use_num_updates else None,
        decay=decay,
    )


def update(state: EMAState, params) -> EMAState:
    """One EMA step after an optimizer update (ema.py:32-52).

    With warmup, the effective decay ramps as min(decay, (1+n)/(10+n)) so
    early averages track the fast-moving params.
    """
    if state.num_updates is not None:
        n = state.num_updates + 1
        decay = jnp.minimum(state.decay, (1.0 + n) / (10.0 + n))
    else:
        n = None
        decay = state.decay
    one_minus = 1.0 - decay
    shadow = jax.tree_util.tree_map(
        lambda s, p: s - one_minus * (s - p), state.shadow, params
    )
    return EMAState(shadow=shadow, num_updates=n, decay=state.decay)


def copy_to(state: EMAState):
    """The averaged parameters (ema.py:54-64) — functional: returns them."""
    return state.shadow


class EMA:
    """Stateful wrapper with the reference's exact method surface
    (update/copy_to/store/restore/state_dict/load_state_dict) for code
    ported from the torch API; internally the pure functions above."""

    def __init__(self, params, decay: float, use_num_updates: bool = True):
        self._state = init(params, decay, use_num_updates)
        self._stored = None

    def update(self, params):
        self._state = update(self._state, params)

    def copy_to(self):
        return self._state.shadow

    def store(self, params):
        """Snapshot current params (ema.py:66-74)."""
        self._stored = jax.tree_util.tree_map(jnp.asarray, params)

    def restore(self):
        """Return the snapshot taken by ``store`` (ema.py:76-87)."""
        if self._stored is None:
            raise ValueError("No parameters stored")
        return self._stored

    def state_dict(self):
        n = self._state.num_updates
        return {
            "decay": self._state.decay,
            "num_updates": None if n is None else int(n),
            "shadow_params": self._state.shadow,
        }

    def load_state_dict(self, sd):
        n = sd["num_updates"]
        self._state = EMAState(
            shadow=sd["shadow_params"],
            num_updates=None if n is None else jnp.int32(n),
            decay=sd["decay"],
        )
