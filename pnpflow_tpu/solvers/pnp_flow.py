"""PnP-Flow: the paper's method as one jitted ``lax.scan`` program.

Algorithm (reference pnpflow/methods/pnp_flow.py:29-121): for time steps
t = i/N, i = 0..N-1:

  1. data-fidelity gradient step
       gaussian: z = x - gamma(t) * H_adj(H x - y) / sigma^2, with the
       learning rate pre-scaled by sigma^2 (pnp_flow.py:60-62), so the
       effective step is gamma(t)*lr_pnp * H_adj(Hx - y);
       laplace: sign-based L1 gradient scaled by sigma (pnp_flow.py:43,64-66)
  2. Monte-Carlo averaged flow denoiser: num_samples draws of
       z~ = t z + (1-t) eps,   D(z~, t) = z~ + (1-t) v(z~, t)
     averaged (pnp_flow.py:47-52,114-120).

TPU-first design: the whole N-step loop is a single ``lax.scan`` resident in
HBM; the MC samples are folded into the *batch* dimension of one model call
(S*B images per forward) so the MXU sees one large batch instead of S small
sequential ones.  gamma(t) strategies mirror pnp_flow.py:29-37.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pnpflow_tpu.solvers.base import Solver
from pnpflow_tpu.utils.jax_setup import default_compiler_options


def _gamma(style: str, lr, t, alpha: float):
    if style == "1_minus_t":
        return lr * (1 - t)
    if style == "sqrt_1_minus_t":
        return lr * jnp.sqrt(1 - t)
    if style == "constant":
        return lr
    if style == "alpha_1_minus_t":
        return lr * (1 - t) ** alpha
    return lr


def make_pnp_flow_solver(
    model_apply,
    H,
    H_adj,
    *,
    steps: int,
    num_samples: int,
    lr_pnp: float,
    gamma_style: str,
    alpha: float,
    noise_type: str,
    sigma_noise: float,
    unroll: int = 1,
    eps_seq=None,
):
    """Build a jitted segment solver.

    Returns ``solve(params, y, x, key, start_iter, n_iters) -> x'`` running
    ``n_iters`` PnP steps starting at global iteration ``start_iter``.
    ``n_iters`` is static; ``start_iter`` is traced so one compilation serves
    every segment of the same length.

    ``eps_seq`` is a verification seam: a host array of shape
    ``(steps, num_samples, b, h, w, c)`` holding the Monte-Carlo
    interpolation noise for every global iteration, replacing the in-scan
    ``jax.random`` draws.  It exists so reference-in-the-loop parity tests
    can feed the *identical* noise to this solver and to the reference's
    ``torch.randn_like`` (pnp_flow.py:48,115); the live path leaves it None.
    """
    delta = 1.0 / steps
    if noise_type == "gaussian":
        lr = sigma_noise**2 * lr_pnp
    elif noise_type == "laplace":
        lr = sigma_noise * lr_pnp
    else:
        raise ValueError("Noise type not supported")

    def grad_datafit(x, y):
        if noise_type == "gaussian":
            return H_adj(H(x) - y) / (sigma_noise**2)
        # laplace: subgradient of ||Hx - y||_1 via 2*heaviside(.)-1
        return H_adj(2.0 * jnp.heaviside(H(x) - y, 0.0) - 1.0) / sigma_noise

    def denoise_mc(params, z, t, key, global_iter=None):
        """Monte-Carlo flow denoiser, samples folded into the batch dim."""
        b, h, w, c = z.shape
        if eps_seq is not None:
            eps = jnp.asarray(eps_seq, z.dtype)[global_iter]
        else:
            eps = jax.random.normal(key, (num_samples, b, h, w, c), z.dtype)
        z_tilde = t * z[None] + (1.0 - t) * eps
        flat = z_tilde.reshape(num_samples * b, h, w, c)
        t_vec = jnp.full((num_samples * b,), t, dtype=jnp.float32)
        v = model_apply(params, flat, t_vec)
        denoised = flat + (1.0 - t) * v
        return jnp.mean(denoised.reshape(num_samples, b, h, w, c), axis=0)

    @partial(jax.jit, static_argnames=("n_iters",),
             compiler_options=default_compiler_options())
    def solve(params, y, x, key, start_iter, n_iters):
        def step(x, i):
            t = (start_iter + i).astype(jnp.float32) * delta
            lr_t = _gamma(gamma_style, lr, t, alpha)
            z = x - lr_t * grad_datafit(x, y)
            k = jax.random.fold_in(key, start_iter + i)
            return denoise_mc(params, z, t, k, start_iter + i), None

        x, _ = jax.lax.scan(step, x, jnp.arange(n_iters), unroll=unroll)
        return x

    return solve


class PnPFlow(Solver):
    """Reference-compatible wrapper (pnp_flow.py:10-188)."""

    def _build(self, degradation, sigma_noise):
        args = self.args
        return make_pnp_flow_solver(
            self.model.apply,
            degradation.H,
            degradation.H_adj,
            steps=int(args.steps_pnp),
            num_samples=int(args.num_samples),
            lr_pnp=float(args.lr_pnp),
            gamma_style=args.gamma_style,
            alpha=float(getattr(args, "alpha", 1.0)),
            noise_type=args.noise_type,
            sigma_noise=float(sigma_noise),
        )

    def solve_batch(self, clean_img, noisy_img, degradation, sigma_noise,
                    batch, report_cb=None):
        args = self.args
        steps = int(args.steps_pnp)
        self._ensure_physics_cache(degradation, sigma_noise)
        if getattr(self, "_solver_cache", None) is None:
            self._solver_cache = self._build(degradation, sigma_noise)
        solve = self._solver_cache

        # init with the adjoint of ones (reference pnp_flow.py:93), jitted —
        # eager per-op dispatch is expensive on a remote TPU
        if getattr(self, "_init_cache", None) is None:
            self._init_cache = jax.jit(
                lambda y: degradation.H_adj(jnp.ones_like(y))
            )
        x = self._init_cache(noisy_img)
        key = jax.random.PRNGKey(1000 + batch)

        def run(x, start, n):
            return solve(
                self.model.params, noisy_img, x, key,
                jnp.asarray(start, dtype=jnp.int32), n,
            )

        if report_cb is not None:
            # reference reports after iteration i when i % 50 == 0 or
            # i % (steps//10) == 0 (pnp_flow.py:128-139); final report is
            # issued by the caller.
            stride = max(steps // 10, 1)
            points = sorted(
                {i for i in range(steps) if i % 50 == 0 or i % stride == 0}
            )
            done = 0
            for r in points:
                x = run(x, done, r + 1 - done)
                done = r + 1
                report_cb(x, r)
            if done < steps:
                x = run(x, done, steps - done)
        else:
            x = run(x, 0, steps)
        return x, steps - 1
