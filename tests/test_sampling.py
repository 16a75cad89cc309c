"""RF sampler factory: config dispatch, knobs, nfe contract, and
linear-model oracles (reference sampling.py:36-161)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.training.sampling import (
    EPS,
    get_rectified_flow_sampler,
    get_sampling_fn,
)


def _linear_model(a=0.5):
    def apply(params, x, t):
        return params["a"] * x

    return apply, {"a": jnp.float32(a)}


def test_rk45_sampler_matches_closed_form():
    apply, params = _linear_model(0.4)
    shape = (2, 8, 8, 1)
    sample = get_rectified_flow_sampler(apply, shape,
                                        use_ode_sampler="rk45")
    x, nfe = sample(params, jax.random.PRNGKey(0))
    # dx/dt = 0.4 x from eps to 1: x1 = z0 * exp(0.4*(1-eps))
    z0 = jax.random.normal(jax.random.PRNGKey(0), shape)
    want = np.asarray(z0) * np.exp(0.4 * (1.0 - EPS))
    np.testing.assert_allclose(np.asarray(x), want, rtol=1e-4)
    assert nfe > 0 and nfe % 7 == 0


def test_euler_sampler_sigma0_matches_ode():
    apply, params = _linear_model(-0.3)
    shape = (2, 4, 4, 1)
    s_euler = get_rectified_flow_sampler(
        apply, shape, use_ode_sampler="euler", sample_N=4000,
        sigma_variance=0.0,
    )
    x, nfe = s_euler(params, jax.random.PRNGKey(1))
    assert nfe == 4000
    # sample() splits once; euler_sample_stochastic splits again and draws
    # z0 from the first half
    k0 = jax.random.split(jax.random.PRNGKey(1))[0]
    z0 = jax.random.normal(jax.random.split(k0)[0], shape)
    want = np.asarray(z0) * np.exp(-0.3 * (1.0 - EPS))
    np.testing.assert_allclose(np.asarray(x), want, rtol=2e-3, atol=1e-5)


def test_explicit_latent_z():
    apply, params = _linear_model(0.0)  # zero field: x stays at z
    shape = (1, 4, 4, 1)
    z = jnp.full(shape, 2.5)
    for name in ("euler", "rk45"):
        sample = get_rectified_flow_sampler(
            apply, shape, use_ode_sampler=name, sample_N=10
        )
        x, _ = sample(params, jax.random.PRNGKey(2), z=z)
        np.testing.assert_allclose(np.asarray(x), 2.5, rtol=1e-6)


def test_init_noise_scale_scales_z0():
    apply, params = _linear_model(0.0)
    shape = (2, 4, 4, 1)
    s1 = get_rectified_flow_sampler(apply, shape, use_ode_sampler="rk45",
                                    init_noise_scale=1.0)
    s3 = get_rectified_flow_sampler(apply, shape, use_ode_sampler="rk45",
                                    init_noise_scale=3.0)
    x1, _ = s1(params, jax.random.PRNGKey(3))
    x3, _ = s3(params, jax.random.PRNGKey(3))
    np.testing.assert_allclose(np.asarray(x3), 3.0 * np.asarray(x1),
                               rtol=1e-5)


def test_inverse_scaler_applied():
    apply, params = _linear_model(0.0)
    shape = (1, 2, 2, 1)
    sample = get_rectified_flow_sampler(
        apply, shape, use_ode_sampler="rk45",
        inverse_scaler=lambda x: (x + 1.0) / 2.0,
    )
    z = jnp.zeros(shape)
    x, _ = sample(params, jax.random.PRNGKey(4), z=z)
    np.testing.assert_allclose(np.asarray(x), 0.5)


def test_config_dispatch_and_unknowns():
    from pnpflow_tpu.config.rf_configs import get_config

    cfg = get_config("cifar10_rf_gaussian_ddpmpp")
    apply, params = _linear_model(0.1)
    sample = get_sampling_fn(cfg, apply, (1, 4, 4, 1))
    x, nfe = sample(params, jax.random.PRNGKey(5))
    assert x.shape == (1, 4, 4, 1) and nfe > 0

    cfg.sampling.method = "pc"
    with pytest.raises(ValueError):
        get_sampling_fn(cfg, apply, (1, 4, 4, 1))

    with pytest.raises(NotImplementedError):
        get_rectified_flow_sampler(apply, (1, 4, 4, 1), init_type="uniform")
