"""Model-zoo families: DDPM, NCSNv1/v2, normalization zoo, RF configs.

Parity where torch is cheap to consult (norm layers, align-corners
interpolation vs torch.nn.functional); shape/finiteness + registry wiring
for the full models (the reference's NCSNv2 dilated path crashes as
shipped, so no end-to-end torch oracle exists for those — see
models/ncsn_layers.py docstring).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest


# ---------------------------------------------------------------------------
# normalization zoo vs torch


def _torch():
    return pytest.importorskip("torch")


def test_instance_norm_matches_torch():
    torch = _torch()
    from pnpflow_tpu.models.normalization import instance_norm

    x = np.random.default_rng(0).normal(size=(2, 5, 7, 3)).astype(np.float32)
    want = torch.nn.InstanceNorm2d(3)(
        torch.from_numpy(x.transpose(0, 3, 1, 2))
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_instance_norm_plus_matches_torch():
    torch = _torch()
    import sys

    sys.path.insert(0, "/root/reference")
    ref_norm = pytest.importorskip(
        "pnpflow.image_generation.models.normalization"
    )
    from pnpflow_tpu.models.normalization import InstanceNorm2dPlus

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 6, 6, 8)).astype(np.float32)
    alpha = rng.normal(size=(8,)).astype(np.float32)
    gamma = rng.normal(size=(8,)).astype(np.float32)
    beta = rng.normal(size=(8,)).astype(np.float32)

    m = ref_norm.InstanceNorm2dPlus(8)
    with torch.no_grad():
        m.alpha.copy_(torch.from_numpy(alpha))
        m.gamma.copy_(torch.from_numpy(gamma))
        m.beta.copy_(torch.from_numpy(beta))
        want = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    want = want.transpose(0, 2, 3, 1)

    mod = InstanceNorm2dPlus()
    got = mod.apply(
        {"params": {"alpha": alpha, "gamma": gamma, "beta": beta}},
        jnp.asarray(x),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_variance_norm_matches_torch_semantics():
    from pnpflow_tpu.models.normalization import VarianceNorm2d

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 4, 4, 5)).astype(np.float32)
    alpha = rng.normal(size=(5,)).astype(np.float32)
    got = VarianceNorm2d().apply({"params": {"alpha": alpha}},
                                 jnp.asarray(x))
    v = x.var(axis=(1, 2), keepdims=True)  # biased, matches torch.var def.
    want = alpha * x / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=1e-5)


def test_get_normalization_factory():
    from pnpflow_tpu.models import normalization as N

    assert N.get_normalization("InstanceNorm") is N.InstanceNorm2d
    assert N.get_normalization("InstanceNorm++") is N.InstanceNorm2dPlus
    assert N.get_normalization("VarianceNorm") is N.VarianceNorm2d
    with pytest.raises(ValueError):
        N.get_normalization("nope")


def test_conditional_instance_norm_plus_shapes():
    from pnpflow_tpu.models.normalization import (
        ConditionalInstanceNorm2dPlus,
    )

    m = ConditionalInstanceNorm2dPlus(num_classes=10)
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(4, 6, 6, 8)), jnp.float32
    )
    y = jnp.asarray([0, 3, 9, 1])
    params = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(params, x, y)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())
    # different classes produce different outputs for identical inputs
    out2 = m.apply(params, x, jnp.asarray([1, 1, 1, 1]))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


# ---------------------------------------------------------------------------
# align-corners bilinear vs torch F.interpolate


@pytest.mark.parametrize("in_hw,out_hw", [
    ((8, 8), (16, 16)), ((7, 5), (13, 9)), ((16, 16), (8, 8)),
    ((4, 4), (4, 4)),
])
def test_bilinear_align_corners_matches_torch(in_hw, out_hw):
    torch = _torch()
    from pnpflow_tpu.models.ncsn_layers import interpolate_bilinear_ac

    x = np.random.default_rng(4).normal(
        size=(2, *in_hw, 3)
    ).astype(np.float32)
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x.transpose(0, 3, 1, 2)), size=out_hw,
        mode="bilinear", align_corners=True,
    ).numpy().transpose(0, 2, 3, 1)
    got = np.asarray(interpolate_bilinear_ac(jnp.asarray(x), out_hw))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pools_match_torch():
    torch = _torch()
    from pnpflow_tpu.models.ncsn_layers import (
        avg_pool_2x2,
        avg_pool_5x5,
        max_pool_5x5,
    )

    x = np.random.default_rng(5).normal(size=(2, 8, 8, 4)).astype(np.float32)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    for fn, tfn in [
        (max_pool_5x5,
         torch.nn.MaxPool2d(kernel_size=5, stride=1, padding=2)),
        (avg_pool_5x5,
         torch.nn.AvgPool2d(kernel_size=5, stride=1, padding=2)),
        (avg_pool_2x2, torch.nn.AvgPool2d(kernel_size=2, stride=2)),
    ]:
        want = tfn(xt).numpy().transpose(0, 2, 3, 1)
        got = np.asarray(fn(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# DDPM


def test_ddpm_forward_shape_and_finite():
    from pnpflow_tpu.models.ddpm import DDPM

    m = DDPM(nf=32, ch_mult=(1, 2), num_res_blocks=1,
             attn_resolutions=(8,), image_size=16, channels=3,
             scale_by_sigma=False)
    x = jnp.asarray(
        np.random.default_rng(6).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 500])
    params = m.init(jax.random.PRNGKey(0), x, labels)
    out = m.apply(params, x, labels)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_ddpm_scale_by_sigma():
    from pnpflow_tpu.models.ddpm import DDPM

    kw = dict(nf=32, ch_mult=(1, 2), num_res_blocks=1,
              attn_resolutions=(), image_size=16, channels=3,
              sigmas=(2.0, 0.5), dropout=0.0)
    m0 = DDPM(scale_by_sigma=False, **kw)
    m1 = DDPM(scale_by_sigma=True, **kw)
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    labels = jnp.asarray([0, 1])
    params = m0.init(jax.random.PRNGKey(0), x, labels)
    a = np.asarray(m0.apply(params, x, labels))
    b = np.asarray(m1.apply(params, x, labels))
    np.testing.assert_allclose(b[0], a[0] / 2.0, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(b[1], a[1] / 0.5, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# NCSNv2 family (dilated paths run here; they crash in the reference)


def test_ncsnv2_64_forward():
    from pnpflow_tpu.models.ncsnv2 import NCSNv2, get_sigmas

    sig = get_sigmas(50.0, 0.01, 10)
    m = NCSNv2(nf=16, image_size=16, sigmas=tuple(sig))
    x = jnp.asarray(
        np.random.default_rng(8).uniform(size=(2, 16, 16, 3)), jnp.float32
    )
    y = jnp.asarray([0, 9])
    params = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(params, x, y)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_ncsn_conditional_forward():
    from pnpflow_tpu.models.ncsnv2 import NCSN

    m = NCSN(nf=16, image_size=16, num_scales=5)
    x = jnp.asarray(
        np.random.default_rng(9).uniform(size=(2, 16, 16, 3)), jnp.float32
    )
    y = jnp.asarray([0, 4])
    params = m.init(jax.random.PRNGKey(0), x, y)
    out = m.apply(params, x, y)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


@pytest.mark.slow
def test_ncsnv2_128_and_256_forward():
    from pnpflow_tpu.models.ncsnv2 import NCSNv2_128, NCSNv2_256

    x = jnp.asarray(
        np.random.default_rng(10).uniform(size=(1, 32, 32, 3)), jnp.float32
    )
    y = jnp.asarray([0])
    for cls in (NCSNv2_128, NCSNv2_256):
        m = cls(nf=8, sigmas=(10.0, 0.1))
        params = m.init(jax.random.PRNGKey(0), x, y)
        out = m.apply(params, x, y)
        assert out.shape == x.shape
        assert bool(jnp.isfinite(out).all())


def test_get_network_size_dispatch():
    from pnpflow_tpu.models.ncsnv2 import (
        NCSNv2,
        NCSNv2_128,
        NCSNv2_256,
        get_network,
    )

    assert get_network(64) is NCSNv2
    assert get_network(128) is NCSNv2_128
    assert get_network(256) is NCSNv2_256
    with pytest.raises(NotImplementedError):
        get_network(512)


# ---------------------------------------------------------------------------
# zoo registry + RF configs


def test_zoo_registry_names():
    from pnpflow_tpu.models import zoo

    for name in ("ddpm", "ncsn", "ncsnv2_64", "ncsnv2_128", "ncsnv2_256",
                 "ncsnpp"):
        assert zoo.get_model(name) is not None


def test_rf_configs_all_constructible():
    from pnpflow_tpu.config import rf_configs

    names = rf_configs.available()
    assert len(names) == 11
    for name in names:
        cfg = rf_configs.get_config(name)
        assert cfg.model.name == "ncsnpp"
        assert cfg.training.sde == "rectified_flow"


def test_rf_config_values_match_reference():
    """Spot-check the two live 256² configs and the cifar10 base against
    the reference files' values."""
    from pnpflow_tpu.config import rf_configs

    hq = rf_configs.get_config("celeba_hq_pytorch_rf_gaussian")
    assert tuple(hq.model.ch_mult) == (1, 1, 2, 2, 2, 2, 2)
    assert hq.model.embedding_type == "fourier"
    assert hq.model.scale_by_sigma is True
    assert hq.data.image_size == 256
    assert hq.training.batch_size == 64
    assert hq.sampling.snr == 0.075

    c10 = rf_configs.get_config("cifar10_rf_gaussian_ddpmpp")
    assert tuple(c10.model.ch_mult) == (1, 2, 2, 2)
    assert c10.model.num_res_blocks == 4
    assert c10.model.fir is False
    assert c10.model.embedding_type == "positional"
    assert c10.model.dropout == 0.15
    assert c10.model.ema_rate == 0.999999

    rt = rf_configs.get_config("cifar10_rf_gaussian_reflow_distill_k=1")
    assert rt.reflow.reflow_t_schedule == "t0"
    assert rt.reflow.reflow_loss == "lpips"
    assert rt.model.ema_rate == 0.9999


def test_zoo_create_model_builds_cifar10_ncsnpp():
    from pnpflow_tpu.config import rf_configs
    from pnpflow_tpu.models import zoo

    cfg = rf_configs.get_config("cifar10_rf_gaussian_ddpmpp")
    cfg.data.image_size = 16  # shrink for test speed
    cfg.model.nf = 16
    cfg.model.num_res_blocks = 1
    m = zoo.create_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(11).normal(size=(1, 16, 16, 3)), jnp.float32
    )
    t = jnp.asarray([3.0])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == x.shape


def test_zoo_create_model_builds_ddpm():
    from pnpflow_tpu.config import rf_configs
    from pnpflow_tpu.models import zoo

    cfg = rf_configs.get_config("cifar10_rf_gaussian_ddpmpp")
    cfg.model.name = "ddpm"
    cfg.data.image_size = 16
    cfg.model.nf = 32
    cfg.model.ch_mult = (1, 2)
    cfg.model.num_res_blocks = 1
    cfg.model.conditional = True
    m = zoo.create_model(cfg)
    x = jnp.asarray(
        np.random.default_rng(12).normal(size=(1, 16, 16, 3)), jnp.float32
    )
    t = jnp.asarray([3])
    params = m.init(jax.random.PRNGKey(0), x, t)
    out = m.apply(params, x, t)
    assert out.shape == x.shape
