"""D-Flow solver (Ben-Hamu et al.): latent LBFGS through the flow.

Algorithm (reference pnpflow/methods/d_flow.py:41-121):

  1. invert the measurement: z0 = ODE(H_adj(y), t: 1 -> 0) with adaptive
     dopri5 at rtol=atol=1e-5, no grad (d_flow.py:51-60);
  2. blend  z = sqrt(alpha) z0 + sqrt(1-alpha) eps  (d_flow.py:88-90);
  3. minimize over z with LBFGS (history 100, strong-Wolfe line search,
     d_flow.py:94-95):
         loss(z) = sum_b ||H(T(z)) - y||^2
                   + lmbda * (0.5 clip(||z||^2) - (d-1) log(||z|| + 1e-5))
     where T(z) is ``steps_euler`` midpoint steps of the flow ODE from
     start_time to 1, differentiated end-to-end (d_flow.py:41-49).

TPU-first: torch.optim.LBFGS(closure) becomes ``optax.lbfgs`` with a zoom
(strong-Wolfe) line search, the whole optimization a single jitted
``lax.scan`` of max_iter * LBFGS_iter iterations (torch keeps LBFGS history
across the outer ``optim.step`` calls, so the flat loop is the same
computation); the midpoint integration is a ``lax.scan`` the gradient flows
through (checkpointed per step to bound memory).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from pnpflow_tpu.solvers.base import Solver
from pnpflow_tpu.ops.ode import odeint_dopri5
from pnpflow_tpu.utils.jax_setup import default_compiler_options


def make_forward_flow(model_apply, steps_euler: int, start_time: float):
    """T(z): steps_euler-1 midpoint steps from start_time to 1
    (reference d_flow.py:41-49), reverse-differentiable."""
    delta = (1.0 - start_time) / (steps_euler - 1)

    def forward(params, z):
        def body(z, i):
            t = start_time + delta * i
            t1 = jnp.full((z.shape[0],), t, dtype=jnp.float32)
            t2 = t1 + delta / 2.0
            half = z + delta / 2.0 * model_apply(params, z, t1)
            z = z + delta * model_apply(params, half, t2)
            return z, None

        step = jax.checkpoint(body, prevent_cse=False)
        z, _ = jax.lax.scan(step, z, jnp.arange(steps_euler - 1, dtype=jnp.float32))
        return z

    return forward


def make_d_flow_solver(
    model_apply,
    H,
    *,
    steps_euler: int,
    start_time: float,
    lmbda: float,
    max_iter: int,
    lbfgs_iter: int,
    early_exit: bool = True,
    tol_grad: float = 1e-7,
    tol_change: float = 1e-9,
):
    """LBFGS-through-the-flow solver.

    ``early_exit=True`` (default) runs the LBFGS loop as a
    ``lax.while_loop`` with torch.optim.LBFGS's own stopping criteria
    (``tolerance_grad`` on max|grad| and ``tolerance_change`` on both the
    step and the loss decrease — torch lbfgs.py defaults 1e-7/1e-9, the
    values the reference runs with, d_flow.py:94-95): iterations past
    convergence are skipped instead of re-running a converged problem.
    ``early_exit=False`` keeps the flat fixed-length ``lax.scan``
    (differentiable, deterministic step count)."""
    forward = make_forward_flow(model_apply, steps_euler, start_time)
    total_iters = max_iter * lbfgs_iter

    opt = optax.lbfgs(
        memory_size=100,
        linesearch=optax.scale_by_zoom_linesearch(max_linesearch_steps=25),
    )

    @partial(jax.jit, compiler_options=default_compiler_options())
    def solve(params, y, z):
        d = z.shape[1] * z.shape[2] * z.shape[3]

        def loss_fn(z):
            norm = jnp.sqrt(jnp.sum(z**2, axis=(1, 2, 3)))
            reg = 0.5 * jnp.clip(norm**2, -1e6, 1e6) - (d - 1) * jnp.log(
                norm + 1e-5
            )
            resid = H(forward(params, z)) - y
            fid = jnp.sum(resid**2, axis=(1, 2, 3))
            return jnp.sum(fid + lmbda * reg)

        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def lbfgs_step(z, state):
            value, grad = value_and_grad(z, state=state)
            updates, state = opt.update(
                grad, state, z, value=value, grad=grad, value_fn=loss_fn
            )
            return optax.apply_updates(z, updates), state, value, updates, grad

        if early_exit:
            def cond(carry):
                _, _, it, done, _ = carry
                return jnp.logical_and(it < total_iters,
                                       jnp.logical_not(done))

            def body(carry):
                z, state, it, _, prev_value = carry
                z_new, state, value, updates, grad = lbfgs_step(z, state)
                # torch lbfgs.py stopping tests: max|grad| <= tolerance_grad;
                # max|step| <= tolerance_change; |loss decrease| <
                # tolerance_change (prev_value is last iteration's loss;
                # inf on the first pass so the test cannot fire early)
                done = jnp.max(jnp.abs(grad)) <= tol_grad
                done |= jnp.max(jnp.abs(updates)) <= tol_change
                done |= jnp.abs(prev_value - value) < tol_change
                return z_new, state, it + 1, done, value

            z, _, _, _, _ = jax.lax.while_loop(
                cond, body,
                (z, opt.init(z), jnp.asarray(0, jnp.int32),
                 jnp.asarray(False), jnp.asarray(jnp.inf, jnp.float32)),
            )
        else:
            def step(carry, _):
                z, state = carry
                z, state, value, _, _ = lbfgs_step(z, state)
                return (z, state), value

            (z, _), _ = jax.lax.scan(
                step, (z, opt.init(z)), None, length=total_iters
            )
        return z, forward(params, z)

    return solve


class DFlow(Solver):
    """Reference-compatible wrapper (d_flow.py:13-189)."""

    def solve_batch(self, clean_img, noisy_img, degradation, sigma_noise,
                    batch, report_cb=None):
        args = self.args
        self._ensure_physics_cache(degradation, sigma_noise)
        if getattr(self, "_solver_cache", None) is None:
            self._solver_cache = make_d_flow_solver(
                self.model.apply,
                degradation.H,
                steps_euler=int(args.steps_euler),
                start_time=float(args.start_time),
                lmbda=float(args.lmbda),
                max_iter=int(args.max_iter),
                lbfgs_iter=int(args.LBFGS_iter),
                # --opts lbfgs_early_exit False restores the fixed-length
                # scan (an A/B knob; semantics match at torch's tolerances)
                early_exit=bool(getattr(args, "lbfgs_early_exit", True)),
            )
        solve = self._solver_cache

        # latent init: reverse dopri5 of H_adj(y) from t=1 to 0, no grad —
        # one jitted program (invert + blend)
        params = self.model.params
        alpha = float(args.alpha)
        if getattr(self, "_init_cache", None) is None:
            model_apply = self.model.apply

            @jax.jit
            def init_fn(params, y, key):
                def vfield(z, t):
                    t_vec = jnp.full((z.shape[0],), t, dtype=jnp.float32)
                    return model_apply(params, z, t_vec)

                x = degradation.H_adj(y)
                z0 = odeint_dopri5(vfield, x, 1.0, 0.0, rtol=1e-5, atol=1e-5)
                return (
                    jnp.sqrt(alpha) * z0
                    + jnp.sqrt(1.0 - alpha)
                    * jax.random.normal(key, z0.shape, z0.dtype)
                )

            self._init_cache = init_fn

        z = self._init_cache(params, noisy_img, jax.random.PRNGKey(1000 + batch))
        _, x_rec = solve(params, noisy_img, z)
        return x_rec, int(args.max_iter) - 1
