"""Jittable ODE integrators (the torchdiffeq replacement).

The reference integrates the flow ODE dx/dt = v(x, t) with
``torchdiffeq.odeint_adjoint`` dopri5 at rtol=atol=1e-5
(train_flow_matching.py:131-150, d_flow.py:51-60) and with fixed-step
euler/midpoint schemes (d_flow.py:41-49, sampling.py:69-109).

TPU-native design: everything is pure ``lax.scan`` / ``lax.while_loop`` under
``jit``; no host stepping.

  * ``odeint_euler`` / ``odeint_midpoint`` / ``odeint_heun`` — fixed-step
    scans, fully reverse-differentiable (used where the reference
    differentiates through the solve, d_flow.py:41-49).
  * ``odeint_dopri5`` — adaptive Dormand–Prince 5(4) with a PI step-size
    controller, matching torchdiffeq's defaults (safety 0.9, PI control
    0.7/0.4 per Söderlind, ifactor 10, dfactor 0.2).  Inference-only (a
    ``lax.while_loop`` is not reverse-differentiable); the solvers use it
    where the reference runs it under no_grad.

All integrators take ``f(x, t) -> dx/dt`` and integrate from t0 to t1
(either direction).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def odeint_euler(f, x0, t0: float, t1: float, steps: int):
    dt = (t1 - t0) / steps

    def body(x, i):
        t = t0 + i * dt
        return x + dt * f(x, t), None

    x, _ = jax.lax.scan(body, x0, jnp.arange(steps, dtype=jnp.float32))
    return x


def odeint_midpoint(f, x0, t0: float, t1: float, steps: int):
    """Explicit midpoint — the reference's d_flow forward flow
    (d_flow.py:41-49, torchdiffeq 'midpoint': 2 f-evals per step)."""
    dt = (t1 - t0) / steps

    def body(x, i):
        t = t0 + i * dt
        k1 = f(x, t)
        k2 = f(x + 0.5 * dt * k1, t + 0.5 * dt)
        return x + dt * k2, None

    x, _ = jax.lax.scan(body, x0, jnp.arange(steps, dtype=jnp.float32))
    return x


def odeint_heun(f, x0, t0: float, t1: float, steps: int):
    dt = (t1 - t0) / steps

    def body(x, i):
        t = t0 + i * dt
        k1 = f(x, t)
        k2 = f(x + dt * k1, t + dt)
        return x + 0.5 * dt * (k1 + k2), None

    x, _ = jax.lax.scan(body, x0, jnp.arange(steps, dtype=jnp.float32))
    return x


# ---------------------------------------------------------------------------
# Dormand–Prince 5(4)

_DOPRI_C = jnp.array([0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0])
_DOPRI_A = [
    [],
    [1 / 5],
    [3 / 40, 9 / 40],
    [44 / 45, -56 / 15, 32 / 9],
    [19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729],
    [9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656],
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84],
]
_DOPRI_B5 = jnp.array(
    [35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0]
)
_DOPRI_B4 = jnp.array(
    [5179 / 57600, 0.0, 7571 / 16695, 393 / 640, -92097 / 339200,
     187 / 2100, 1 / 40]
)


def _dopri_step(f, x, t, dt):
    ks = [f(x, t)]
    for i in range(1, 7):
        xi = x
        for j, a in enumerate(_DOPRI_A[i]):
            xi = xi + dt * a * ks[j]
        ks.append(f(xi, t + _DOPRI_C[i] * dt))
    x5 = x
    err = jnp.zeros_like(x)
    for i in range(7):
        x5 = x5 + dt * _DOPRI_B5[i] * ks[i]
        err = err + dt * (_DOPRI_B5[i] - _DOPRI_B4[i]) * ks[i]
    return x5, err


def _error_ratio(err, x0, x1, rtol, atol):
    tol = atol + rtol * jnp.maximum(jnp.abs(x0), jnp.abs(x1))
    # RMS norm over all elements (torchdiffeq convention)
    return jnp.sqrt(jnp.mean((err / tol) ** 2))


@partial(jax.jit, static_argnums=(0,), static_argnames=("max_steps",))
def _odeint_dopri5_stats(f, x0, t0, t1, rtol: float = 1e-5,
                         atol: float = 1e-5, max_steps: int = 10000):
    """Adaptive DOPRI5 from t0 to t1 (either direction) -> (x, nfe).

    Matches the reference's odeint(..., method implicit dopri5,
    rtol=atol=1e-5) inference behavior (train_flow_matching.py:131-150).

    ``max_steps`` bounds attempted (incl. rejected) steps; a pathologically
    stiff field that exhausts it yields the state integrated so far (a
    while_loop cannot raise under jit) — the generous default makes that a
    practical impossibility for flow models at these tolerances.
    """
    t0 = jnp.asarray(t0, jnp.float32)
    t1 = jnp.asarray(t1, jnp.float32)
    direction = jnp.sign(t1 - t0)
    span = jnp.abs(t1 - t0)
    dt0 = direction * span * 0.01  # initial step: 1% of the interval

    def cond(state):
        x, t, dt, nsteps = state
        return (jnp.abs(t - t0) < span) & (nsteps < max_steps)

    def body(state):
        x, t, dt, nsteps = state
        # clip the step to land exactly on t1
        remaining = t1 - t
        dt = jnp.where(jnp.abs(dt) > jnp.abs(remaining), remaining, dt)
        x_new, err = _dopri_step(f, x, t, dt)
        ratio = _error_ratio(err, x, x_new, rtol, atol)
        accept = ratio <= 1.0

        # PI controller
        safety, ifactor, dfactor = 0.9, 10.0, 0.2
        factor = jnp.clip(
            safety * (1.0 / jnp.maximum(ratio, 1e-10)) ** 0.2,
            dfactor, ifactor,
        )
        dt_next = dt * factor

        x = jnp.where(accept, x_new, x)
        t = jnp.where(accept, t + dt, t)
        return (x, t, dt_next, nsteps + 1)

    state = (x0, t0, dt0, jnp.asarray(0, jnp.int32))
    x, t, _, nsteps = jax.lax.while_loop(cond, body, state)
    # 7 field evals per attempted step (no FSAL) — the nfe the reference's
    # rk45 sampler reports (sampling.py:147-150, scipy sol.nfev)
    return x, 7 * nsteps


def odeint_dopri5(f, x0, t0, t1, rtol: float = 1e-5, atol: float = 1e-5,
                  max_steps: int = 10000):
    return _odeint_dopri5_stats(f, x0, t0, t1, rtol=rtol, atol=atol,
                                max_steps=max_steps)[0]


def odeint(f, x0, t0, t1, method: str = "dopri5", steps: int = 100,
           rtol: float = 1e-5, atol: float = 1e-5):
    if method == "euler":
        return odeint_euler(f, x0, t0, t1, steps)
    if method == "midpoint":
        return odeint_midpoint(f, x0, t0, t1, steps)
    if method == "heun":
        return odeint_heun(f, x0, t0, t1, steps)
    if method == "dopri5":
        return odeint_dopri5(f, x0, t0, t1, rtol=rtol, atol=atol)
    raise ValueError("Unknown ODE method: {}".format(method))
