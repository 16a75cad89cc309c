"""Rectified-flow sampling factory (reference sampling.py:36-161).

``get_sampling_fn(config, model_apply, shape)`` mirrors the vendored
surface: dispatches on ``config.sampling.method`` ('rectified_flow'),
honors ``init_type`` / ``init_noise_scale`` / ``sigma_variance`` /
``sample_N`` / ``use_ode_sampler`` / ``ode_tol``, and returns a function
``sample(params, key, z=None) -> (x, nfe)`` — samples plus the number of
velocity-field evaluations, like the reference's samplers return.

TPU-first: the euler path is the jitted stochastic-Euler scan from
training/flow_matching.py (sigma_variance converts the ODE into a
marginal-preserving diffusion); the rk45 path is the jitted adaptive
dopri5 from ops/ode.py (scipy-RK45 equivalent), with nfe counted inside
the while_loop instead of scipy's sol.nfev.

``model_apply`` must carry the model's own t convention (the rectified
t*999 fold lives in models/registry.py, as in the reference's
get_model_fn wrapper).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnpflow_tpu.ops.ode import _odeint_dopri5_stats
from pnpflow_tpu.training.flow_matching import euler_sample_stochastic

EPS = 1e-3  # sampling.py:90 / sde_lib ode eps


def get_rectified_flow_sampler(model_apply, shape, *,
                               init_type: str = "gaussian",
                               init_noise_scale: float = 1.0,
                               sigma_variance: float = 0.0,
                               sample_N: int = 100,
                               use_ode_sampler: str = "rk45",
                               ode_tol: float = 1e-5,
                               inverse_scaler=lambda x: x):
    """-> ``sample(params, key, z=None) -> (x, nfe)``
    (reference sampling.py:62-161)."""
    if init_type != "gaussian":
        raise NotImplementedError(
            "INITIALIZATION TYPE NOT IMPLEMENTED"  # sde_lib.py:103-107
        )

    def _z0(key):
        return init_noise_scale * jax.random.normal(key, shape)

    if use_ode_sampler == "euler":
        def sample(params, key, z=None):
            k0, k1 = jax.random.split(key)
            # euler_sample_stochastic draws its own z0 from noise_scale;
            # an explicit z overrides by re-integrating from it
            if z is None:
                x = euler_sample_stochastic(
                    model_apply, params, k0, shape, steps=sample_N,
                    sigma_var=sigma_variance,
                    noise_scale=init_noise_scale, eps=EPS,
                )
            else:
                x = _euler_from(params, z, k1)
            return inverse_scaler(x), sample_N

        def _euler_from(params, z, key):
            dt = 1.0 / sample_N

            def body(carry, i):
                x, k = carry
                num_t = i / sample_N * (1.0 - EPS) + EPS
                t = jnp.full((shape[0],), num_t, jnp.float32)
                pred = model_apply(params, x, t)
                sigma_t = (1.0 - num_t) * sigma_variance
                pred_sigma = pred + (sigma_t**2) / (
                    2.0 * (init_noise_scale**2) * (1.0 - num_t) ** 2
                ) * (0.5 * num_t * (1.0 - num_t) * pred
                     - 0.5 * (2.0 - num_t) * x)
                k, sub = jax.random.split(k)
                x = (x + pred_sigma * dt
                     + sigma_t * jnp.sqrt(dt)
                     * jax.random.normal(sub, shape))
                return (x, k), None

            (x, _), _ = jax.lax.scan(
                body, (z, key), jnp.arange(sample_N, dtype=jnp.float32)
            )
            return x

        return sample

    if use_ode_sampler in ("rk45", "ode"):
        def sample(params, key, z=None):
            x0 = _z0(key) if z is None else z

            def vfield(x, t):
                tvec = jnp.full((shape[0],), t, jnp.float32)
                return model_apply(params, x, tvec)

            x, nfe = _odeint_dopri5_stats(
                vfield, x0, EPS, 1.0, rtol=ode_tol, atol=ode_tol
            )
            return inverse_scaler(x), int(nfe)

        return sample

    raise ValueError(
        "Sampler {} unknown.".format(use_ode_sampler)
    )


def get_sampling_fn(config, model_apply, shape,
                    inverse_scaler=lambda x: x):
    """Config-driven dispatch (reference sampling.py:36-60): only the
    'rectified_flow' method exists in the trimmed reference."""
    method = config.sampling.method
    if method.lower() != "rectified_flow":
        raise ValueError("Sampler name {} unknown.".format(method))
    s = config.sampling
    return get_rectified_flow_sampler(
        model_apply, shape,
        init_type=getattr(s, "init_type", "gaussian"),
        init_noise_scale=float(getattr(s, "init_noise_scale", 1.0)),
        sigma_variance=float(getattr(s, "sigma_variance", 0.0)),
        sample_N=int(getattr(s, "sample_N", 100)),
        use_ode_sampler=getattr(s, "use_ode_sampler", "rk45"),
        ode_tol=float(getattr(s, "ode_tol", 1e-5)),
        inverse_scaler=inverse_scaler,
    )
