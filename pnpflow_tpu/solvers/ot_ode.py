"""OT-ODE solver (Pokle et al.) as one jitted ``lax.scan`` program.

Algorithm (reference pnpflow/methods/ot_ode.py:27-147): from t0 = start_time,
for iterations i = steps*t0 .. steps-1 with t = i/steps:

    v    = v(x, t)
    rt2  = (1-t)^2 / ((1-t)^2 + t^2)
    x1^  = x + (1-t) v
    d    = y - H(x1^)
    sol  = solve (rt2 H H^T + sigma^2 I) sol = d          # per-problem
    vec  = H_adj(sol)
    g    = vec + (1-t) * (dv/dx)^T vec                     # model vjp
    x   += delta * (v + ((1-t)/t) * gamma(t) * g)

Per-problem closed forms (ot_ode.py:81-128): masks -> elementwise divide by
(mask*rt2 + sigma^2); denoising -> divide by (rt2 + sigma^2); SR -> divide by
(diag(D D^T)*rt2' + sigma^2) where diag(D D^T) = 1 for plain decimation (the
reference builds the explicit downsampling matrix, utils.py:1124-1146 — same
diagonal, O(N) here) and rt2' replicates the reference's literal
``(1-t)^2/((1-t)^2 + delta*i^2)`` expression (ot_ode.py:96-97) for parity;
FFT deblur -> Fourier divide; anything else -> batched GMRES
(jax.scipy.sparse.linalg.gmres, replacing the reference's hand-rolled
Arnoldi GMRES utils.py:972-1109).

TPU-first: the branch is resolved at trace time (static problem string); the
model vjp comes from ``jax.vjp`` inside the scanned step; initialization is
x = t0 * H_adj(y) + (1-t0) * eps (ot_ode.py:27-29).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pnpflow_tpu.solvers.base import Solver
from pnpflow_tpu.utils.jax_setup import default_compiler_options

_MASK_PROBLEMS = ("inpainting", "random_inpainting", "paintbrush_inpainting")


def make_ot_ode_solver(
    model_apply,
    degradation,
    *,
    problem: str,
    steps: int,
    gamma: str,
    sigma_noise: float,
):
    H, H_adj = degradation.H, degradation.H_adj
    delta = 1.0 / steps
    s2 = sigma_noise**2

    if problem in _MASK_PROBLEMS:
        mask = degradation.mask

        def solve_C(d, rt2, i):
            return d / (mask * rt2 + s2)

    elif problem == "denoising":

        def solve_C(d, rt2, i):
            return d / (rt2 + s2)

    elif problem == "superresolution":
        # plain decimation: diag(H H^T) = 1.  parity quirk: the reference
        # recomputes rt^2 with (1-t)^2 / ((1-t)^2 + delta * iteration^2)
        # (ot_ode.py:96-97).  The bicubic variant has dense H H^T and falls
        # through to the generic GMRES branch below (the reference's
        # else-branch, ot_ode.py:119-128).
        def solve_C(d, rt2, i):
            t = delta * i
            rt2_ref = (1.0 - t) ** 2 / ((1.0 - t) ** 2 + delta * i**2)
            return d / (rt2_ref + s2)

    elif problem == "gaussian_deblurring_FFT":
        fft_filter = degradation.fft_filter

        def solve_C(d, rt2, i):
            inv = rt2 * fft_filter * jnp.conj(fft_filter) + s2
            return jnp.real(
                jnp.fft.ifft2(jnp.fft.fft2(d, axes=(1, 2)) / inv, axes=(1, 2))
            )

    else:  # generic fallback: GMRES on C = rt2 H H_adj + s2 I

        def solve_C(d, rt2, i):
            def C_op(z):
                return rt2 * H(H_adj(z)) + s2 * z

            sol, _ = jax.scipy.sparse.linalg.gmres(
                C_op, d, maxiter=100, solve_method="batched"
            )
            return sol

    def gamma_fn(t):
        if gamma == "constant":
            return 1.0
        if gamma == "gamma_t":
            return jnp.sqrt(t / (t**2 + (1.0 - t) ** 2))
        raise ValueError("Unknown gamma: {}".format(gamma))

    @partial(jax.jit, static_argnames=("n_iters",),
             compiler_options=default_compiler_options())
    def solve(params, y, x, key, start_iter, n_iters):
        del key  # iteration is deterministic

        def step(x, k):
            i = (start_iter + k).astype(jnp.float32)
            t = i * delta
            t_vec = jnp.full((x.shape[0],), t, dtype=jnp.float32)

            fwd = lambda z: model_apply(params, z, t_vec)
            vt, vjp_fn = jax.vjp(fwd, x)

            rt2 = (1.0 - t) ** 2 / ((1.0 - t) ** 2 + t**2)
            x1_hat = x + (1.0 - t) * vt
            d = y - H(x1_hat)
            sol = solve_C(d, rt2, i)
            vec = H_adj(sol)

            g = vec + (1.0 - t) * vjp_fn(vec)[0]
            ratio = (1.0 - t) / t
            v_adapted = vt + ratio * gamma_fn(t) * g
            return x + delta * v_adapted, None

        x, _ = jax.lax.scan(step, x, jnp.arange(n_iters))
        return x

    return solve


class OTOde(Solver):
    """Reference-compatible wrapper (ot_ode.py:9-213)."""

    def _build(self, degradation, sigma_noise):
        args = self.args
        return make_ot_ode_solver(
            self.model.apply,
            degradation,
            problem=args.problem,
            steps=int(args.steps_ode),
            gamma=args.gamma,
            sigma_noise=float(sigma_noise),
        )

    def solve_batch(self, clean_img, noisy_img, degradation, sigma_noise,
                    batch, report_cb=None):
        args = self.args
        steps = int(args.steps_ode)
        start_time = float(args.start_time)
        first_iter = int(steps * start_time)
        total = steps - first_iter
        self._ensure_physics_cache(degradation, sigma_noise)
        if getattr(self, "_solver_cache", None) is None:
            self._solver_cache = self._build(degradation, sigma_noise)
        solve = self._solver_cache

        # x = t0 * H_adj(y) + (1-t0) * eps  (ot_ode.py:27-29,50-52), jitted
        if getattr(self, "_init_cache", None) is None:
            self._init_cache = jax.jit(
                lambda y, key: start_time * degradation.H_adj(y)
                + (1.0 - start_time)
                * jax.random.normal(key, y.shape, y.dtype)
            )
        x = self._init_cache(noisy_img, jax.random.PRNGKey(1000 + batch))

        def run(x, start_abs, n):
            return solve(
                self.model.params, noisy_img, x, None,
                jnp.asarray(start_abs, dtype=jnp.int32), n,
            )

        if report_cb is not None:
            # reference cadence: after iteration i when i % 10 == 0 or
            # i % (steps//10) == 0 (ot_ode.py:150,200-201)
            stride = max(steps // 10, 1)
            points = sorted(
                {
                    i
                    for i in range(first_iter, steps)
                    if i % 10 == 0 or i % stride == 0
                }
            )
            done = first_iter
            for r in points:
                x = run(x, done, r + 1 - done)
                done = r + 1
                report_cb(x, r)
            if done < steps:
                x = run(x, done, steps - done)
        else:
            x = run(x, first_iter, total)
        return x, steps - 1
