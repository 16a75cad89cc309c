"""Straight-line oracle parity: replay the reference algorithms step by step
in plain Python/numpy (mirroring the jitted solvers' RNG streams exactly)
and compare against the compiled lax.scan programs.

This pins the scan/jit assembly to the reference's iteration math
(pnp_flow.py:103-121, ot_ode.py:63-147) independent of any neural model —
the 'model' is an analytic linear map whose vjp is exact.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pnpflow_tpu.ops.degradations import BoxInpainting, GaussianDeblurring

DIM = 16
B = 2


def linear_model_apply(params, x, t_vec):
    """v(x, t) = a * x + t * b with a scalar, b an image — analytic vjp."""
    a, b = params
    return a * x + t_vec[:, None, None, None] * b


def test_pnp_flow_oracle_exact():
    from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver

    op = BoxInpainting(4, DIM)
    rng = np.random.default_rng(0)
    clean = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    y = np.asarray(op.H(jnp.asarray(clean)))
    a = 0.3
    bmap = rng.normal(size=(1, DIM, DIM, 3)).astype(np.float32) * 0.1
    params = (a, jnp.asarray(bmap))

    steps, S, lr_pnp, sigma = 6, 3, 1.0, 0.05
    solve = make_pnp_flow_solver(
        linear_model_apply, op.H, op.H_adj,
        steps=steps, num_samples=S, lr_pnp=lr_pnp,
        gamma_style="alpha_1_minus_t", alpha=1.0,
        noise_type="gaussian", sigma_noise=sigma,
    )
    key = jax.random.PRNGKey(42)
    x0 = np.asarray(op.H_adj(jnp.ones_like(jnp.asarray(y))))
    got = np.asarray(
        solve(params, jnp.asarray(y), jnp.asarray(x0), key,
              jnp.asarray(0, jnp.int32), steps)
    )

    # ---- oracle: same math, same RNG stream, plain numpy
    mask = np.asarray(op.mask)
    x = x0.copy()
    delta = 1.0 / steps
    lr = sigma**2 * lr_pnp
    for i in range(steps):
        t = i * delta
        lr_t = lr * (1 - t) ** 1.0
        grad = mask * (mask * x - y) / sigma**2
        z = x - lr_t * grad
        k = jax.random.fold_in(key, i)
        eps = np.asarray(
            jax.random.normal(k, (S, B, DIM, DIM, 3), jnp.float32)
        )
        z_tilde = t * z[None] + (1 - t) * eps
        t_vec = np.full((S * B,), t, np.float32)
        flat = z_tilde.reshape(S * B, DIM, DIM, 3)
        v = a * flat + t_vec[:, None, None, None] * bmap
        x = np.mean(
            (flat + (1 - t) * v).reshape(S, B, DIM, DIM, 3), axis=0
        )
    assert np.allclose(got, x, atol=1e-4), np.abs(got - x).max()


def test_ot_ode_oracle_exact_deblurring():
    from pnpflow_tpu.solvers.ot_ode import make_ot_ode_solver

    op = GaussianDeblurring(1.0, 7, "fft", 3, DIM)
    rng = np.random.default_rng(1)
    clean = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    y = np.asarray(op.H(jnp.asarray(clean)))
    a = 0.2
    bmap = rng.normal(size=(1, DIM, DIM, 3)).astype(np.float32) * 0.05
    params = (a, jnp.asarray(bmap))

    steps, sigma = 10, 0.05
    solve = make_ot_ode_solver(
        linear_model_apply, op,
        problem="gaussian_deblurring_FFT", steps=steps, gamma="gamma_t",
        sigma_noise=sigma,
    )
    start_iter = 2
    x0 = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    got = np.asarray(
        solve(params, jnp.asarray(y), jnp.asarray(x0), None,
              jnp.asarray(start_iter, jnp.int32), steps - start_iter)
    )

    # ---- oracle
    fft_filter = np.asarray(op.fft_filter)
    delta = 1.0 / steps

    def H(v):
        return np.real(
            np.fft.ifft2(np.fft.fft2(v, axes=(1, 2)) * fft_filter,
                         axes=(1, 2))
        )

    def H_adj(v):
        return np.real(
            np.fft.ifft2(
                np.fft.fft2(v, axes=(1, 2)) * np.conj(fft_filter),
                axes=(1, 2),
            )
        )

    x = x0.copy()
    for i in range(start_iter, steps):
        t = i * delta
        vt = a * x + t * bmap
        rt2 = (1 - t) ** 2 / ((1 - t) ** 2 + t**2)
        x1_hat = x + (1 - t) * vt
        d = y - H(x1_hat)
        inv = rt2 * fft_filter * np.conj(fft_filter) + sigma**2
        sol = np.real(
            np.fft.ifft2(np.fft.fft2(d, axes=(1, 2)) / inv, axes=(1, 2))
        )
        vec = H_adj(sol)
        # vjp of v(x,t) = a x + t b w.r.t. x applied to vec is a * vec
        g = vec + (1 - t) * (a * vec)
        gamma = np.sqrt(t / (t**2 + (1 - t) ** 2))
        x = x + delta * (vt + (1 - t) / t * gamma * g)
    assert np.allclose(got, x, atol=1e-3), np.abs(got - x).max()


def test_diffpir_oracle_exact():
    from pnpflow_tpu.solvers.pnp_diff import (
        _schedules,
        make_diffpir_solver,
        make_prox,
    )

    op = BoxInpainting(4, DIM)
    rng = np.random.default_rng(2)
    clean = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    y01 = (np.asarray(op.H(jnp.asarray(clean))) + 1) / 2
    a = 0.1
    bmap = rng.normal(size=(1, DIM, DIM, 3)).astype(np.float32) * 0.02
    params = (a, jnp.asarray(bmap))

    # eps model reuses linear_model_apply on scaled t (t in [0, 999])
    def eps_model(p, x, t_vec):
        return linear_model_apply(p, x, t_vec / 999.0)[..., : x.shape[-1]]

    sigma, lmbda, zeta, iters = 0.05, 7.0, 0.3, 4
    prox = make_prox("inpainting", op, sigma, "gaussian")
    solve = make_diffpir_solver(
        eps_model, prox, op.H_adj, lmbda=lmbda, zeta=zeta,
        max_iter=iters, sigma_noise=sigma,
    )
    key = jax.random.PRNGKey(7)
    got = np.asarray(solve(params, jnp.asarray(y01), key))

    # ---- oracle with the same RNG stream
    acp, sigmas = _schedules()
    seq = np.sqrt(np.linspace(0, 1000**2, iters))
    seq = np.unique(np.clip(seq.astype(np.int64), 0, 999))
    seq[-1] = 999
    seq_desc = seq[::-1].copy()
    seq_next = np.concatenate([seq_desc[1:], [0]])
    rhos = lmbda * sigma**2 / np.maximum(sigmas**2, 1e-12)
    mask = np.asarray(op.mask)
    norm = 1.0 / sigma**2

    key2, sub = jax.random.split(key)
    x0_init = 2 * (mask * y01) - 1
    t0 = int(seq_desc[0])
    x = np.sqrt(acp[t0]) * x0_init + np.sqrt(1 - acp[t0]) * np.asarray(
        jax.random.normal(sub, x0_init.shape, jnp.float32)
    )
    key_c = key2
    for idx in range(len(seq_desc)):
        t, t_next = int(seq_desc[idx]), int(seq_next[idx])
        at, at_next = acp[t], acp[t_next]
        t_vec = np.full((B,), t, np.float32)
        eps = a * x + (t_vec / 999.0)[:, None, None, None] * bmap
        x0 = (x - np.sqrt(1 - at) * eps) / np.sqrt(at)
        gamma = 1.0 / (2 * rhos[t])
        x0_01 = (np.clip(x0, -1, 1) + 1) / 2
        d = mask * y01 * norm + x0_01 / gamma
        x0 = 2 * (d / (mask * norm + 1 / gamma)) - 1
        eps_hat = (x - np.sqrt(at) * x0) / np.sqrt(max(1 - at, 1e-12))
        key_c, sub = jax.random.split(key_c)
        noise = np.asarray(jax.random.normal(sub, x.shape, jnp.float32))
        x = np.sqrt(at_next) * x0 + np.sqrt(1 - at_next) * (
            np.sqrt(1 - zeta) * eps_hat + np.sqrt(zeta) * noise
        )
    assert np.allclose(got, x, atol=1e-3), np.abs(got - x).max()


def test_ot_ode_oracle_superresolution_quirk():
    """The reference recomputes rt^2 as (1-t)^2/((1-t)^2 + delta*i^2) on the
    SR path (ot_ode.py:96-97) — our solver must replicate that literal
    expression, not the standard rt^2."""
    from pnpflow_tpu.ops.degradations import Superresolution
    from pnpflow_tpu.solvers.ot_ode import make_ot_ode_solver

    op = Superresolution(2, DIM)
    rng = np.random.default_rng(3)
    clean = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    y = np.asarray(op.H(jnp.asarray(clean)))
    a = 0.15
    bmap = rng.normal(size=(1, DIM, DIM, 3)).astype(np.float32) * 0.05
    params = (a, jnp.asarray(bmap))

    steps, sigma = 10, 0.05
    solve = make_ot_ode_solver(
        linear_model_apply, op, problem="superresolution", steps=steps,
        gamma="constant", sigma_noise=sigma,
    )
    start_iter = 2
    x0 = rng.normal(size=(B, DIM, DIM, 3)).astype(np.float32)
    got = np.asarray(
        solve(params, jnp.asarray(y), jnp.asarray(x0), None,
              jnp.asarray(start_iter, jnp.int32), steps - start_iter)
    )

    delta = 1.0 / steps
    x = x0.copy()
    for i in range(start_iter, steps):
        t = i * delta
        vt = a * x + t * bmap
        rt2 = (1 - t) ** 2 / ((1 - t) ** 2 + t**2)
        x1_hat = x + (1 - t) * vt
        d = y - x1_hat[:, ::2, ::2, :]
        # the reference's literal SR expression (ot_ode.py:96-97)
        rt2_ref = (1 - t) ** 2 / ((1 - t) ** 2 + delta * i**2)
        sol = d / (rt2_ref + sigma**2)
        vec = np.zeros_like(x)
        vec[:, ::2, ::2, :] = sol
        g = vec + (1 - t) * (a * vec)
        x = x + delta * (vt + (1 - t) / t * 1.0 * g)
    assert np.allclose(got, x, atol=1e-3), np.abs(got - x).max()
