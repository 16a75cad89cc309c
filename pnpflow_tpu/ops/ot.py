"""Minibatch optimal-transport couplings for flow-matching training.

The reference computes an exact OT plan per minibatch with POT on the host
(``ot.dist`` squared-euclidean on flattened pixels then ``ot.emd``,
train_flow_matching.py:85-93) and samples B index pairs from the plan with
replacement (train_flow_matching.py:94-99).

TPU-native design: two interchangeable couplings.

  * ``exact``   — for uniform marginals and equal batch sizes the exact OT
                  plan is a permutation/B, i.e. a linear assignment.  We
                  solve it with ``scipy.optimize.linear_sum_assignment``
                  through ``jax.pure_callback`` (host LP, parity-safe with
                  POT — same optimal objective), then bootstrap-sample B
                  matched pairs exactly like the reference.
  * ``sinkhorn``— fully on-device log-domain Sinkhorn (lax.scan) for an
                  entropic plan; pairs sampled from the plan with a Gumbel
                  categorical draw.  No host round-trip — the coupling
                  stays inside the jitted train step.

Both return (idx0, idx1) index vectors of length B to gather the paired
(x0, x1).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(B, B) squared euclidean distances of flattened samples — one matmul
    on the MXU plus rank-1 corrections (cf. ot.dist 'sqeuclidean')."""
    a = a.reshape(a.shape[0], -1)
    b = b.reshape(b.shape[0], -1)
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    cross = a @ b.T
    return jnp.maximum(a2 - 2.0 * cross + b2.T, 0.0)


_LAP_LIB = None


def _load_lap_lib():
    """Native Jonker-Volgenant LAP solver (csrc/lap.cpp), built on demand;
    None if the shared library is unavailable."""
    global _LAP_LIB
    if _LAP_LIB is not None:
        return _LAP_LIB if _LAP_LIB is not False else None
    import ctypes
    import os
    import subprocess

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(here, "csrc", "liblap.so")
    if not os.path.exists(so):
        src = os.path.join(here, "csrc", "lap.cpp")
        if os.path.exists(src):
            try:
                subprocess.run(
                    ["make", "-C", os.path.dirname(src)],
                    check=True, capture_output=True,
                )
            except Exception:
                pass
    try:
        lib = ctypes.CDLL(so)
        lib.lap_solve.restype = ctypes.c_int
        _LAP_LIB = lib
        return lib
    except OSError:
        _LAP_LIB = False
        return None


def _host_assignment(cost: np.ndarray) -> np.ndarray:
    cost = np.ascontiguousarray(cost, dtype=np.float64)
    n = cost.shape[0]
    lib = _load_lap_lib()
    if lib is not None:
        import ctypes

        out = np.empty(n, np.int32)
        rc = lib.lap_solve(
            n,
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc == 0:
            return out
    from scipy.optimize import linear_sum_assignment

    _, col = linear_sum_assignment(cost)
    return col.astype(np.int32)


def exact_assignment(cost: jnp.ndarray) -> jnp.ndarray:
    """Exact OT assignment sigma: row i of x0 pairs with sigma(i) of x1.

    Host LP via pure_callback; jit/scan-safe, vmap-unfriendly (per-batch
    call).  Identical optimal coupling to the reference's ``ot.emd`` with
    uniform marginals.
    """
    b = cost.shape[0]
    return jax.pure_callback(
        _host_assignment,
        jax.ShapeDtypeStruct((b,), jnp.int32),
        cost,
        vmap_method="sequential",
    )


@partial(jax.jit, static_argnames=("iters",))
def sinkhorn_plan(cost: jnp.ndarray, reg: float = 0.05, iters: int = 100):
    """Log-domain Sinkhorn with uniform marginals; returns log-plan (B, B).

    ``reg`` is relative to the mean cost so the temperature is scale-free.
    """
    b = cost.shape[0]
    eps = reg * jnp.mean(cost) + 1e-12
    log_k = -cost / eps
    log_mu = -jnp.log(b) * jnp.ones((b,), cost.dtype)

    def body(carry, _):
        f, g = carry
        f = log_mu - jax.scipy.special.logsumexp(log_k + g[None, :], axis=1)
        g = log_mu - jax.scipy.special.logsumexp(log_k + f[:, None], axis=0)
        return (f, g), None

    (f, g), _ = jax.lax.scan(
        body, (jnp.zeros((b,), cost.dtype), jnp.zeros((b,), cost.dtype)),
        None, length=iters,
    )
    return log_k + f[:, None] + g[None, :]


def sample_pairs_from_log_plan(log_plan: jnp.ndarray, key: jax.Array):
    """Draw B (i, j) pairs ~ plan with replacement (Gumbel-max over the
    flattened plan) — the reference's np.random.choice(p=plan.flatten())
    (train_flow_matching.py:94-99) done on-device."""
    b = log_plan.shape[0]
    flat = log_plan.reshape(-1)
    gumbel = jax.random.gumbel(key, (b, flat.shape[0]), flat.dtype)
    choice = jnp.argmax(flat[None, :] + gumbel, axis=1)
    return choice // b, choice % b


def host_ot_pair(x0: np.ndarray, x1: np.ndarray, rng: np.random.Generator):
    """Exact OT pairing computed fully on the host (no jax callback) — the
    path for backends without host-callback support.  Returns (idx0, idx1)
    numpy index vectors, bootstrap-resampled with replacement like the
    reference's sampling from the plan (train_flow_matching.py:94-99)."""
    a = np.ascontiguousarray(x0.reshape(x0.shape[0], -1), np.float32)
    b = np.ascontiguousarray(x1.reshape(x1.shape[0], -1), np.float32)
    n = a.shape[0]
    lib = _load_lap_lib()
    if lib is not None:
        import ctypes

        cost = np.empty((n, n), np.float64)
        lib.sq_dist_matrix(
            n, a.shape[1],
            a.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        )
        sigma = np.empty(n, np.int32)
        rc = lib.lap_solve(
            n, cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            sigma.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        if rc != 0:
            sigma = None
    else:
        sigma = None
    if sigma is None:
        d = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
        sigma = _host_assignment(d)
    rows = rng.integers(0, n, size=n)
    return rows, sigma[rows]


def ot_pair_indices(x0, x1, key, method: str = "exact",
                    reg: float = 0.05, iters: int = 100):
    """Pair minibatch noise x0 with data x1 by minibatch OT.

    Returns (idx0, idx1) so that (x0[idx0], x1[idx1]) are coupled samples.
    """
    cost = pairwise_sq_dists(x0, x1)
    b = cost.shape[0]
    if method == "exact":
        sigma = exact_assignment(cost)
        # bootstrap-resample matched pairs with replacement, mirroring the
        # reference's sampling from the (permutation) plan
        rows = jax.random.randint(key, (b,), 0, b)
        return rows, sigma[rows]
    if method == "sinkhorn":
        log_plan = sinkhorn_plan(cost, reg=reg, iters=iters)
        return sample_pairs_from_log_plan(log_plan, key)
    if method == "indep":
        idx = jnp.arange(b)
        return idx, idx
    raise ValueError("Unknown OT coupling method: {}".format(method))
