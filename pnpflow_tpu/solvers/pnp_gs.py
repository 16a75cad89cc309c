"""Prox-PnP / PnP-GS solver (Hurault et al.) with the gradient-step denoiser.

Algorithms (reference pnpflow/methods/pnp_gs.py:86-222):

  * ``pgd``  — proximal gradient descent: data-fidelity gradient step
    (skipped for gaussian denoising) then relaxed denoising
    ``x = (1-alpha) z + alpha D(z)`` with denoiser level
    ``sigma_factor * sigma_noise`` (pnp_gs.py:202-222).
  * ``hqs``  — half-quadratic splitting with problem-specific closed-form
    proxes (pnp_gs.py:138-200):
      - random_inpainting: exact prox ``H(y) - H(x) + x`` with denoiser level
        0.2 for the first 20 iterations then sigma_noise; the prox is skipped
        on the final iteration (pnp_gs.py:138-156);
      - gaussian_deblurring_FFT: Fourier prox of
        ``argmin 0.5||Hx - y||^2 + 1/(2 alpha) ||x - z||^2`` plus
        objective-gap-based alpha backtracking (alpha *= 0.9 when the
        objective decrease beats 0.1/alpha * ||dx||^2, pnp_gs.py:158-178);
      - superresolution_bicubic: block-splitting Fourier prox
        (pnp_gs.py:45-76,180-200).

The denoiser is D(x) = x - Dg(x) with Dg from the vjp of the trained network
(training/denoiser.py).  The whole iteration is a jitted ``lax.scan`` whose
carried state includes the backtracked alpha.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from pnpflow_tpu.solvers.base import Solver
from pnpflow_tpu.training.denoiser import make_calculate_grad
from pnpflow_tpu.ops.degradations import Superresolution
from pnpflow_tpu.utils.jax_setup import default_compiler_options


def _splits_mean(a, sf):
    """Mean ACROSS the sf x sf contiguous blocks at each within-block
    position (reference pnp_gs.py:51-61,70-72: stack torch.chunk blocks on a
    trailing axis, then mean over it): NHWC -> (B, H/sf, W/sf, C)."""
    b, h, w, c = a.shape
    a = a.reshape(b, sf, h // sf, sf, w // sf, c)
    return jnp.mean(a, axis=(1, 3))


def make_pnp_gs_solver(
    model_apply,
    degradation,
    *,
    problem: str,
    algo: str,
    noise_type: str,
    sigma_noise: float,
    lr_pnp: float,
    alpha: float,
    sigma_factor: float,
    max_iter: int,
):
    H, H_adj = degradation.H, degradation.H_adj
    calculate_grad = make_calculate_grad(model_apply)
    # lr pre-scaled by sigma^2 (pnp_gs.py:90)
    lr = sigma_noise**2 * lr_pnp

    def denoise_Dg(params, x, sigma_scalar, compute_g=False):
        sigma_vec = jnp.full((x.shape[0],), sigma_scalar, dtype=jnp.float32)
        return calculate_grad(params, x, sigma_vec, compute_g=compute_g)

    def grad_datafit(x, y):
        if noise_type == "gaussian":
            return H_adj(H(x) - y) / (sigma_noise**2)
        return H_adj(2.0 * jnp.heaviside(H(x) - y, 0.0) - 1.0) / sigma_noise

    def objective(x, y, lmbda, g):
        if noise_type == "gaussian":
            datafit = 0.5 * jnp.sum((H(x) - y) ** 2)
        else:
            datafit = jnp.mean(jnp.abs(H(x) - y))
        return datafit + lmbda * g

    if algo == "pgd":

        def step(params, y, x, alpha_c, i):
            if problem != "denoising" or noise_type == "laplace":
                z = x - lr * grad_datafit(x, y)
            else:
                z = x
            Dg, _ = denoise_Dg(params, z, sigma_factor * sigma_noise)
            Dz = z - Dg
            return (1.0 - alpha_c) * z + alpha_c * Dz, alpha_c

    elif algo == "hqs" and problem == "random_inpainting":

        def step(params, y, x, alpha_c, i):
            sigma_ = jnp.where(i < 20, 0.2, sigma_noise)
            Dg, _ = denoise_Dg(params, x, sigma_)
            Dx = x - Dg
            # prox H(y) - H(z) + z (pnp_gs.py:33-34).  On the final
            # iteration the reference computes Dx but never assigns it
            # (pnp_gs.py:153-156: the `if iteration < max_iter - 1` guard),
            # so x stays at the PREVIOUS iterate.
            z = H(y) - H(Dx) + Dx
            x_new = jnp.where(i < max_iter - 1, z, x)
            return x_new, alpha_c

    elif algo == "hqs" and problem == "gaussian_deblurring_FFT":
        fft_filter = degradation.fft_filter

        def prox(z, y, a):
            fft_d = jnp.fft.fft2(a * H_adj(y) + z, axes=(1, 2))
            inv = a * jnp.conj(fft_filter) * fft_filter + 1.0
            return jnp.real(jnp.fft.ifft2(fft_d / inv, axes=(1, 2)))

        def step(params, y, x, alpha_c, i):
            Dg, _, g = denoise_Dg(params, x, 1.8 * sigma_noise, compute_g=True)
            Dx = x - Dg
            z_in = 0.1 * alpha_c * Dx + alpha_c * (1.0 - alpha_c * 0.1) * x
            x_new = prox(z_in, y, alpha_c)
            # objective-gap backtracking (pnp_gs.py:174-178)
            gap = objective(x_new, y, 0.1, g) - objective(x, y, 0.1, g)
            shrink = gap < 0.1 / alpha_c * jnp.sum((x_new - x) ** 2)
            return x_new, jnp.where(shrink, 0.9 * alpha_c, alpha_c)

    elif algo == "hqs" and problem == "superresolution_bicubic":
        sf = degradation.sf
        fft_filter = degradation.fft_filter

        def prox(z, y, a):
            # block-splitting trick (pnp_gs.py:45-76)
            hat_z = H_adj(y) + z / a
            fft_hat_z = jnp.fft.fft2(hat_z, axes=(1, 2))
            top = _splits_mean(fft_filter * fft_hat_z, sf)
            below = (
                _splits_mean(
                    jnp.conj(fft_filter) * fft_filter * fft_hat_z, sf
                )
                + 1.0 / a
            )
            rc = jnp.conj(fft_filter) * jnp.tile(top / below, (1, sf, sf, 1))
            sol = jnp.real(jnp.fft.ifft2(rc, axes=(1, 2)))
            return (hat_z - sol) * a

        def step(params, y, x, alpha_c, i):
            Dg, _, g = denoise_Dg(params, x, 2.0 * sigma_noise, compute_g=True)
            Dx = x - Dg
            z_in = 0.065 * alpha_c * Dx + alpha_c * (1.0 - alpha_c * 0.065) * x
            return prox(z_in, y, alpha_c), alpha_c

    else:
        raise ValueError(
            "Unsupported pnp_gs algo/problem: {}/{}".format(algo, problem)
        )

    @partial(jax.jit, static_argnames=("n_iters",),
             compiler_options=default_compiler_options())
    def solve(params, y, x, alpha_c, start_iter, n_iters):
        def body(carry, k):
            x, alpha_c = carry
            i = start_iter + k
            x, alpha_c = step(params, y, x, alpha_c, i)
            return (x, alpha_c), None

        (x, alpha_c), _ = jax.lax.scan(
            body, (x, alpha_c), jnp.arange(n_iters)
        )
        return x, alpha_c

    return solve


class ProxPnP(Solver):
    """Reference-compatible wrapper (pnp_gs.py:11-264)."""

    def solve_ip(self, test_loader, degradation, sigma_noise):
        # the reference initializes alpha once per solve_ip (pnp_gs.py:104)
        # and the deblurring backtracking mutates it across the batch loop —
        # the shrunken alpha carries over to later batches
        self._alpha_carry = float(self.args.alpha)
        super().solve_ip(test_loader, degradation, sigma_noise)

    def solve_batch(self, clean_img, noisy_img, degradation, sigma_noise,
                    batch, report_cb=None):
        args = self.args
        max_iter = int(args.max_iter)
        self._ensure_physics_cache(degradation, sigma_noise)
        if getattr(self, "_solver_cache", None) is None:
            # fresh physics -> fresh alpha: the backtracked value from a
            # previous degradation/sigma must not seed the new solve
            # (within one solve_ip the cache persists, so the reference's
            # across-batch alpha carry is preserved)
            self._alpha_carry = float(args.alpha)
            self._solver_cache = make_pnp_gs_solver(
                self.model.apply,
                degradation,
                problem=args.problem,
                algo=args.algo,
                noise_type=args.noise_type,
                sigma_noise=float(sigma_noise),
                lr_pnp=float(args.lr_pnp),
                alpha=float(args.alpha),
                sigma_factor=float(getattr(args, "sigma_factor", 1.0)),
                max_iter=max_iter,
            )
        solve = self._solver_cache

        # init (pnp_gs.py:119-130), one jitted program
        if getattr(self, "_init_cache", None) is None:
            if args.problem == "random_inpainting":
                init = lambda y: 1.5 * y - degradation.H(y)
            elif args.problem == "superresolution":
                sr_bic = Superresolution(
                    degradation.sf, clean_img.shape[1], mode="bicubic"
                )
                init = sr_bic.H_adj
            else:
                init = degradation.H_adj
            self._init_cache = jax.jit(init)
        x = self._init_cache(noisy_img)

        alpha_c = jnp.asarray(
            getattr(self, "_alpha_carry", float(args.alpha)), jnp.float32
        )

        def run(x, alpha_c, start, n):
            return solve(
                self.model.params, noisy_img, x, alpha_c,
                jnp.asarray(start, jnp.int32), n,
            )

        if report_cb is not None:
            # reference cadence: every 10 iterations (pnp_gs.py:224)
            points = [i for i in range(max_iter) if i % 10 == 0]
            done = 0
            for r in points:
                x, alpha_c = run(x, alpha_c, done, r + 1 - done)
                done = r + 1
                report_cb(x, r)
            if done < max_iter:
                x, alpha_c = run(x, alpha_c, done, max_iter - done)
        else:
            x, alpha_c = run(x, alpha_c, 0, max_iter)
        self._alpha_carry = float(alpha_c)
        return x, max_iter - 1
