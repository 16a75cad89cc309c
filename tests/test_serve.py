"""Serving API: Restorer configure-once / restore-many contract."""

import numpy as np
import jax.numpy as jnp
import pytest

from pnpflow_tpu.serve import Restorer


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    """Hermetic checkpoint root: serve tests must never pick up whatever
    ./model/ the working tree happens to hold (e.g. on-device training
    output — a 64²-trained U-Net loads structurally into ANY resolution)."""
    return str(tmp_path_factory.mktemp("serve_ckpts"))


@pytest.fixture(scope="module")
def restorer(ckpt_root):
    with pytest.warns(UserWarning, match="random init"):
        # 64²: the protocol's 61-tap blur kernel must fit the image
        return Restorer(
            method="pnp_flow", problem="gaussian_deblurring_FFT",
            dim_image=64, batch_size=2,
            overrides={"steps_pnp": 4, "num_samples": 1},
            output_root=ckpt_root,
        )


def _clean(n=2, dim=64):
    rng = np.random.default_rng(0)
    return np.tanh(rng.normal(size=(n, dim, dim, 3)) * 0.4).astype(
        np.float32
    )


def test_restore_shape_finite_deterministic(restorer):
    y = restorer.degrade(_clean(), seed=3)
    a = restorer.restore(y, seed=3)
    b = restorer.restore(y, seed=3)
    assert a.shape == (2, 64, 64, 3)
    assert np.isfinite(a).all()
    np.testing.assert_array_equal(a, b)
    # a different MC seed changes the trajectory
    c = restorer.restore(y, seed=4)
    assert not np.array_equal(a, c)


def test_restore_reduces_measurement_misfit(restorer):
    """The data-fidelity steps must reduce ||H x - y|| vs the adjoint
    init, prior quality aside."""
    clean = _clean()
    y = restorer.degrade(clean, seed=1)
    out = restorer.restore(y, seed=1)
    H = restorer.degradation.H
    init = restorer.degradation.H_adj(jnp.ones_like(jnp.asarray(y)))
    mis_out = float(jnp.linalg.norm(H(jnp.asarray(out)) - y))
    mis_init = float(jnp.linalg.norm(H(init) - y))
    assert mis_out < mis_init


def test_method_defaults_resolved_from_config(restorer):
    # three-tier config surface: method-file defaults present, overrides
    # applied
    assert restorer.args.steps_pnp == 4
    assert restorer.args.num_samples == 1
    assert restorer.args.gamma_style == "alpha_1_minus_t"
    assert restorer.sigma_noise == pytest.approx(0.05)


def test_other_method_and_problem(ckpt_root):
    with pytest.warns(UserWarning, match="random init"):
        r = Restorer(
            method="ot_ode", problem="denoising", dim_image=16,
            batch_size=2, overrides={"steps_ode": 5},
            output_root=ckpt_root,
        )
    y = r.degrade(_clean(dim=16), seed=0)
    out = r.restore(y, seed=0)
    assert out.shape == (2, 16, 16, 3)
    assert np.isfinite(out).all()
    assert r.sigma_noise == pytest.approx(0.2)  # denoising default


def test_warmup_compiles(restorer):
    assert restorer.warmup(2) is restorer


def test_sharded_restore_matches_unsharded(restorer, ckpt_root):
    """Mesh-sharded serving (8 virtual CPU devices via conftest): same
    restorations as the single-device path."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    with pytest.warns(UserWarning, match="random init"):
        sharded = Restorer(
            method="pnp_flow", problem="gaussian_deblurring_FFT",
            dim_image=64, batch_size=8,
            overrides={"steps_pnp": 4, "num_samples": 1},
            shard=True, n_devices=8, output_root=ckpt_root,
        )
    y = sharded.degrade(_clean(8), seed=2)
    got = sharded.restore(y, seed=2)
    want = restorer.restore(y, seed=2)
    np.testing.assert_allclose(got, want, atol=1e-5)
