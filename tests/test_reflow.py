"""Reflow/distillation: t-schedules, losses, pair generation, online step.

Oracle style: a linear velocity model with known closed-form flow so the
generated pairs and loss values can be checked by math, matching the
reference semantics (losses.py:81-146, sde_lib.py:37-107).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pnpflow_tpu.training.reflow import (
    EPS,
    generate_reflow_pairs,
    make_online_reflow_step,
    make_reflow_loss,
    make_reflow_train_step,
    sample_reflow_t,
)


def test_t_schedules():
    key = jax.random.PRNGKey(0)
    t0 = sample_reflow_t(key, 8, "t0")
    assert np.allclose(np.asarray(t0), EPS)
    t1 = sample_reflow_t(key, 8, "t1")
    assert np.allclose(np.asarray(t1), 1.0)
    tu = np.asarray(sample_reflow_t(key, 1000, "uniform"))
    assert tu.min() >= EPS and tu.max() <= 1.0 and tu.std() > 0.2
    # integer k: values on the k-point grid k_i*(1-eps)/k + eps
    tk = np.asarray(sample_reflow_t(key, 1000, 4))
    grid = (np.arange(4) * (1.0 - EPS) / 4 + EPS).astype(np.float32)
    assert np.all(np.isclose(tk[:, None], grid[None, :], atol=1e-6).any(1))
    assert len(np.unique(np.round(tk, 5))) == 4
    with pytest.raises(NotImplementedError):
        sample_reflow_t(key, 4, "nope")


def _linear_model(a=0.5):
    """v(x, t) = a*x — flow x(T) = x(eps) * exp(a (T-eps))."""

    def apply(params, x, t):
        return params["a"] * x

    return apply, {"a": jnp.float32(a)}


def test_generate_pairs_euler_matches_closed_form():
    """euler reproduces the reference euler_ode quirk (dt = 1/N over the
    [eps, 1) grid -> total advance 1.0): x1 -> z0 * exp(a * 1.0)."""
    apply, params = _linear_model(0.5)
    z0, x1 = generate_reflow_pairs(
        apply, params, jax.random.PRNGKey(1), (4, 8, 8, 3),
        sampler="euler", steps=4000,
    )
    want = np.asarray(z0) * np.exp(0.5)
    np.testing.assert_allclose(np.asarray(x1), want, rtol=2e-4)


def test_generate_pairs_rk45_matches_closed_form():
    apply, params = _linear_model(-0.3)
    z0, x1 = generate_reflow_pairs(
        apply, params, jax.random.PRNGKey(2), (2, 4, 4, 1),
        sampler="rk45",
    )
    want = np.asarray(z0) * np.exp(-0.3 * (1.0 - EPS))
    np.testing.assert_allclose(np.asarray(x1), want, rtol=1e-4, atol=1e-6)


def test_reflow_l2_loss_value():
    """reduce_mean l2: mean over data dims of (v - (x1-z0))², then batch
    mean (losses.py:120-122,138-141)."""
    apply, params = _linear_model(1.0)
    loss_fn = make_reflow_loss(apply, "uniform", "l2")
    rng = np.random.default_rng(3)
    z0 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    t = jnp.asarray([0.25, 0.75], jnp.float32)
    got = float(loss_fn(params, z0, x1, t))
    xt = np.asarray(t)[:, None, None, None] * np.asarray(z0 * 0 + x1) \
        + (1 - np.asarray(t)[:, None, None, None]) * np.asarray(z0)
    v = xt  # a=1 -> v = xt
    per = ((v - (np.asarray(x1) - np.asarray(z0))) ** 2).reshape(2, -1)
    want = float(per.mean(-1).mean())
    assert abs(got - want) < 1e-5


def test_reflow_lpips_requires_t0_and_fn():
    apply, _ = _linear_model()
    with pytest.raises(ValueError):
        make_reflow_loss(apply, "uniform", "lpips", lpips_fn=lambda a, b: 0)
    with pytest.raises(ValueError):
        make_reflow_loss(apply, "t0", "lpips", lpips_fn=None)


def test_reflow_lpips_plus_l2_with_stub_metric():
    """lpips+l2 wiring with a stub perceptual metric (losses.py:126-132)."""
    apply, params = _linear_model(1.0)
    stub = lambda a, b: jnp.mean(jnp.abs(a - b), axis=(1, 2, 3))
    loss_fn = make_reflow_loss(apply, "t0", "lpips+l2", lpips_fn=stub)
    rng = np.random.default_rng(4)
    z0 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(2, 4, 4, 1)).astype(np.float32))
    t = jnp.full((2,), EPS, jnp.float32)
    val = float(loss_fn(params, z0, x1, t))
    assert np.isfinite(val) and val > 0


def _tiny_mlp():
    import flax.linen as nn

    class V(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            b = x.shape[0]
            h = x.reshape(b, -1)
            h = jnp.concatenate([h, t[:, None]], axis=1)
            h = nn.Dense(32)(h)
            h = nn.tanh(h)
            h = nn.Dense(x[0].size)(h)
            return h.reshape(x.shape)

    m = V()
    x = jnp.zeros((1, 4, 4, 1))
    params = m.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    return (lambda p, x, t: m.apply(p, x, t)), params


def test_reflow_train_step_descends():
    apply, params = _tiny_mlp()
    tx = optax.adam(1e-2)
    step = jax.jit(make_reflow_train_step(apply, tx, t_schedule="uniform"))
    state = {"params": params, "opt_state": tx.init(params),
             "ema": params, "step": jnp.int32(0)}
    rng = np.random.default_rng(5)
    z0 = jnp.asarray(rng.normal(size=(16, 4, 4, 1)).astype(np.float32))
    x1 = z0 * 2.0  # fixed pair law -> learnable target v = x1 - z0 = z0
    losses = []
    for i in range(30):
        state, loss = step(state, z0, x1, jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < 0.2 * np.mean(losses[:5])
    assert int(state["step"]) == 30


def test_online_reflow_step_runs_and_descends():
    apply, params = _tiny_mlp()
    tx = optax.adam(1e-2)
    import functools

    step = jax.jit(
        functools.partial(
            make_online_reflow_step(apply, tx, t_schedule="t0",
                                    gen_steps=8),
            shape=(8, 4, 4, 1),
        ),
        static_argnames=(),
    )
    state = {"params": params, "opt_state": tx.init(params),
             "ema": params, "step": jnp.int32(0)}
    losses = []
    for i in range(20):
        state, loss = step(state, key=jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.all(np.isfinite(losses))
    # the pair law moves with the params (self-distillation), so the loss
    # is not monotone — it must stay bounded, not diverge
    assert max(losses) < 100 * (losses[0] + 1e-3)
