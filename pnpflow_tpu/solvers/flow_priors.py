"""Flow-Priors solver (OC-Flow / Zhang et al.) as one jitted scan.

Algorithm (reference pnpflow/methods/flow_priors.py:27-141): x ~ N(0,I); for
each of N ODE steps at num_t = i/N*(1-eps)+eps, run K inner Adam(eta) steps
on x minimizing

    lmbda * ||H(x + v(x,t) dt) - y_next||^2_2    (gaussian; L1 for laplace)
    + trace_term * dt                             (Hutchinson jvp, 1 probe)
    + [iteration 0 only]  0.5 ||x||^2

with y_next = (t+dt) y + (1-(t+dt)) H(x_init) annealing the measurement;
iterations > 0 add the analytic interpolation-likelihood gradient
    grad_lik = -1/(1-t) * (-x + t * v(x,t))       (pred detached,
                                                   flow_priors.py:137-138)
then advance x += v(x, t) dt.  The Adam optimizer is re-initialized at every
outer iteration (flow_priors.py:89), which we mirror by resetting the optax
state inside the scan.

TPU-first notes: the Hutchinson probe uses ``jax.jvp`` inside ``jax.grad``
(forward-over-reverse — cheap on TPU); Rademacher probes mirror
utils.py:243-270 (rand<0.5 -> ±1); the whole N*K loop is a nested
``lax.scan`` resident in HBM.
"""

from __future__ import annotations


from functools import partial

import jax
import jax.numpy as jnp
import optax

from pnpflow_tpu.solvers.base import Solver
from pnpflow_tpu.utils.jax_setup import default_compiler_options


def hutchinson_trace(model_fwd, x, t_vec, key, n_probes: int = 1):
    """Per-image Hutchinson estimate of tr(dv/dx) with Rademacher probes
    (reference utils.py:243-270).  Differentiable through the jvp."""

    def one(k):
        eps = jax.random.rademacher(k, x.shape, jnp.float32)
        _, jv = jax.jvp(lambda z: model_fwd(z, t_vec), (x,), (eps,))
        return jnp.sum(jv * eps, axis=(1, 2, 3))

    keys = jax.random.split(key, n_probes)
    return jnp.mean(jax.vmap(one)(keys), axis=0)


def make_flow_priors_solver(
    model_apply,
    H,
    *,
    N: int,
    K: int,
    lmbda: float,
    eta: float,
    start_time: float,
    noise_type: str,
    sigma_noise: float,
):
    del sigma_noise  # the reference objective never uses sigma here
    if start_time > 0.0:
        eps_t = start_time
        dt = (1.0 - eps_t) / N
    else:
        dt = 1.0 / N
        eps_t = 1e-3
    tx = optax.adam(eta)

    def model_fwd(params, x, t):
        t_vec = jnp.full((x.shape[0],), t, dtype=jnp.float32)
        return model_apply(params, x, t_vec)

    @partial(jax.jit, compiler_options=default_compiler_options())
    def solve(params, y, h_x_init, x, key):
        fwd = lambda z, t: model_fwd(params, z, t)

        def outer(carry, i):
            x, key = carry
            num_t = i.astype(jnp.float32) / N * (1.0 - eps_t) + eps_t
            y_next = (num_t + dt) * y + (1.0 - (num_t + dt)) * h_x_init
            first = i == 0

            def loss_fn(x, k):
                x_next = x + fwd(x, num_t) * dt
                resid = H(x_next) - y_next
                if noise_type == "gaussian":
                    fid = lmbda * jnp.sum(resid**2, axis=(1, 2, 3))
                else:
                    fid = lmbda * jnp.sum(jnp.abs(resid), axis=(1, 2, 3))
                trace = hutchinson_trace(fwd, x, num_t, k)
                prior = jnp.where(
                    first, 0.5 * jnp.sum(x**2, axis=(1, 2, 3)), 0.0
                )
                return jnp.sum(fid + trace * dt + prior)

            def inner(carry, k_key):
                x, opt_state = carry
                grad = jax.grad(loss_fn)(x, k_key)
                pred = fwd(x, num_t)
                grad_lik = jnp.where(
                    first,
                    0.0,
                    -1.0 / (1.0 - num_t) * (-x + num_t * pred),
                )
                updates, opt_state = tx.update(grad + grad_lik, opt_state, x)
                return (optax.apply_updates(x, updates), opt_state), None

            key, sub = jax.random.split(key)
            # fresh Adam state every outer iteration (flow_priors.py:89)
            (x, _), _ = jax.lax.scan(
                inner, (x, tx.init(x)), jax.random.split(sub, K)
            )
            x = x + fwd(x, num_t) * dt
            return (x, key), None

        (x, _), _ = jax.lax.scan(outer, (x, key), jnp.arange(N))
        return x

    return solve


class FlowPriors(Solver):
    """Reference-compatible wrapper (flow_priors.py:9-208)."""

    def solve_batch(self, clean_img, noisy_img, degradation, sigma_noise,
                    batch, report_cb=None):
        args = self.args
        self._ensure_physics_cache(degradation, sigma_noise)
        if getattr(self, "_solver_cache", None) is None:
            self._solver_cache = make_flow_priors_solver(
                self.model.apply,
                degradation.H,
                N=int(args.N),
                K=int(args.K),
                lmbda=float(args.lmbda),
                eta=float(args.eta),
                start_time=float(args.start_time),
                noise_type=args.noise_type,
                sigma_noise=float(sigma_noise),
            )
        solve = self._solver_cache

        # x_init ~ N(0, I) in the CLEAN image shape (flow_priors.py:57-58)
        if getattr(self, "_init_cache", None) is None:
            self._init_cache = jax.jit(
                lambda ref, key: (
                    lambda x0: (x0, degradation.H(x0))
                )(jax.random.normal(key, ref.shape, ref.dtype))
            )
        key = jax.random.PRNGKey(1000 + batch)
        k_init, k_run = jax.random.split(key)
        x_init, h_x_init = self._init_cache(clean_img, k_init)
        x = solve(self.model.params, noisy_img, h_x_init, x_init, k_run)
        return x, int(args.N) - 1
