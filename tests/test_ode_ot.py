"""ODE integrator accuracy and OT coupling correctness."""

import numpy as np
import jax
import jax.numpy as jnp

from pnpflow_tpu.ops.ode import (
    odeint_dopri5,
    odeint_euler,
    odeint_heun,
    odeint_midpoint,
)
from pnpflow_tpu.ops.ot import (
    exact_assignment,
    ot_pair_indices,
    pairwise_sq_dists,
    sinkhorn_plan,
)


def test_dopri5_exponential_decay():
    f = lambda x, t: -x
    x = odeint_dopri5(f, jnp.ones((4,)), 0.0, 1.0)
    assert abs(float(x[0]) - np.exp(-1)) < 1e-4


def test_dopri5_reverse_time():
    f = lambda x, t: -x
    x = odeint_dopri5(f, jnp.ones((4,)), 1.0, 0.0)
    assert abs(float(x[0]) - np.exp(1)) < 1e-4


def test_dopri5_nonautonomous():
    """dx/dt = t from 0 to 1 => 0.5 exactly."""
    x = odeint_dopri5(
        lambda x, t: jnp.full_like(x, t), jnp.zeros((2,)), 0.0, 1.0
    )
    assert abs(float(x[0]) - 0.5) < 1e-5


def test_fixed_step_orders():
    """Euler O(h), midpoint/heun O(h^2) on exp decay."""
    f = lambda x, t: -x
    x0 = jnp.ones(())
    exact = np.exp(-1)
    err_euler = abs(float(odeint_euler(f, x0, 0.0, 1.0, 50)) - exact)
    err_mid = abs(float(odeint_midpoint(f, x0, 0.0, 1.0, 50)) - exact)
    err_heun = abs(float(odeint_heun(f, x0, 0.0, 1.0, 50)) - exact)
    assert err_mid < err_euler / 10
    assert err_heun < err_euler / 10


def test_midpoint_differentiable():
    f = lambda x, t: -x

    def loss(x0):
        return jnp.sum(odeint_midpoint(f, x0, 0.0, 1.0, 20) ** 2)

    g = jax.grad(loss)(jnp.ones((3,)))
    # d/dx0 (x0 e^-1)^2 = 2 x0 e^-2
    assert np.allclose(np.asarray(g), 2 * np.exp(-2), atol=1e-3)


# ---------------------------------------------------------------------------


def test_pairwise_sq_dists_matches_numpy():
    rng = np.random.default_rng(0)
    a = rng.normal(size=(6, 10)).astype(np.float32)
    b = rng.normal(size=(6, 10)).astype(np.float32)
    d = np.asarray(pairwise_sq_dists(jnp.asarray(a), jnp.asarray(b)))
    ref = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    assert np.allclose(d, ref, atol=1e-4)


def test_exact_assignment_identity_for_permuted_cloud():
    """x1 = permutation of x0 => OT assignment recovers the permutation."""
    rng = np.random.default_rng(1)
    x0 = rng.normal(size=(8, 4)).astype(np.float32)
    perm = rng.permutation(8)
    x1 = x0[perm]
    cost = pairwise_sq_dists(jnp.asarray(x0), jnp.asarray(x1))
    sigma = np.asarray(exact_assignment(cost))
    # row i of x0 should map to the row of x1 holding the same point
    assert np.allclose(x1[sigma], x0)


def test_sinkhorn_plan_marginals():
    rng = np.random.default_rng(2)
    cost = jnp.asarray(rng.uniform(size=(8, 8)).astype(np.float32))
    log_plan = sinkhorn_plan(cost, reg=0.1, iters=200)
    plan = np.exp(np.asarray(log_plan))
    assert np.allclose(plan.sum(1), 1 / 8, atol=1e-3)
    assert np.allclose(plan.sum(0), 1 / 8, atol=1e-3)


def test_ot_pair_indices_shapes_and_jit():
    rng = np.random.default_rng(3)
    x0 = jnp.asarray(rng.normal(size=(8, 4, 4, 1)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(8, 4, 4, 1)).astype(np.float32))
    for method in ("exact", "sinkhorn", "indep"):
        i0, i1 = jax.jit(
            lambda a, b, k: ot_pair_indices(a, b, k, method=method)
        )(x0, x1, jax.random.PRNGKey(0))
        assert i0.shape == (8,) and i1.shape == (8,)
        assert int(i0.max()) < 8 and int(i1.max()) < 8


def test_host_ot_pair_recovers_permutation():
    """Fully-host exact pairing (C++ LAP or scipy fallback)."""
    from pnpflow_tpu.ops.ot import host_ot_pair

    rng = np.random.default_rng(5)
    x0 = rng.normal(size=(16, 3, 3, 1)).astype(np.float32)
    perm = rng.permutation(16)
    x1 = x0[perm]
    i0, i1 = host_ot_pair(x0, x1, np.random.default_rng(0))
    # each sampled pair must be an exact match under the permutation
    assert np.allclose(
        x0.reshape(16, -1)[i0], x1.reshape(16, -1)[i1], atol=1e-6
    )


def test_precoupled_train_step_descends():
    import optax
    from pnpflow_tpu.training.flow_matching import (
        make_fm_train_step_precoupled,
    )

    def mlp_apply(params, x, t):
        return x * params["w"]

    params = {"w": jnp.zeros((1,))}
    tx = optax.sgd(0.1)
    step = make_fm_train_step_precoupled(mlp_apply, tx)
    state = {
        "params": params, "opt_state": tx.init(params),
        "ema": params, "step": jnp.zeros((), jnp.int32),
    }
    x0 = jnp.zeros((8, 4, 4, 1))
    x1 = jnp.ones((8, 4, 4, 1))
    l0 = None
    for i in range(5):
        state, loss = step(state, x0, x1, jax.random.PRNGKey(i))
        l0 = float(loss) if l0 is None else l0
    assert float(loss) < l0


def test_log_likelihood_linear_flow_closed_form():
    """v(x,t) = a x  =>  x1 = e^a z0; log p1 must match the gaussian
    N(0, e^{2a} I) density exactly (divergence is exact for Rademacher
    probes on a diagonal jacobian)."""
    from pnpflow_tpu.ops.likelihood import log_likelihood

    a = 0.5

    def fwd(x, t_vec):
        return a * x

    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(4, 2, 2, 1)).astype(np.float32))
    logp, z0 = log_likelihood(fwd, x1, jax.random.PRNGKey(0), steps=200)
    d = 4
    var = np.exp(2 * a)
    expected = (
        -0.5 * np.sum(np.asarray(x1).reshape(4, -1) ** 2, axis=1) / var
        - 0.5 * d * np.log(2 * np.pi * var)
    )
    assert np.allclose(np.asarray(logp), expected, atol=2e-2)
    assert np.allclose(np.asarray(z0), np.asarray(x1) * np.exp(-a), atol=1e-3)


def test_native_lap_optimal_vs_scipy():
    """The C++ Hungarian must return OPTIMAL assignments (not merely valid
    permutations) — checked against scipy on random cost matrices."""
    from pnpflow_tpu.ops.ot import _load_lap_lib

    lib = _load_lap_lib()
    if lib is None:
        import pytest

        pytest.skip("native LAP library unavailable")
    import ctypes

    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(0)
    for _ in range(50):
        n = int(rng.integers(2, 48))
        cost = rng.uniform(size=(n, n)).astype(np.float64)
        out = np.empty(n, np.int32)
        rc = lib.lap_solve(
            n, cost.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        assert rc == 0
        assert len(set(out.tolist())) == n
        r, c = linear_sum_assignment(cost)
        assert np.isclose(
            cost[np.arange(n), out].sum(), cost[r, c].sum(), atol=1e-9
        )
