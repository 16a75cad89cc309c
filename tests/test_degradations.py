"""Degradation operator tests: closed-form behavior + adjointness
<H x, y> == <x, H_adj y> (the reference relies on exact adjoints,
degradations.py:55-127)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.ops.degradations import (
    BoxInpainting,
    Denoising,
    GaussianDeblurring,
    PaintbrushInpainting,
    RandomInpainting,
    Superresolution,
    gaussian_2d_kernel,
    bicubic_filter,
)

DIM = 64
B, C = 2, 3


def rand(key, shape=(B, DIM, DIM, C)):
    return jax.random.normal(jax.random.PRNGKey(key), shape)


def assert_adjoint(op, x, y, tol=1e-3):
    lhs = jnp.vdot(op.H(x), y)
    rhs = jnp.vdot(x, op.H_adj(y))
    assert jnp.allclose(lhs, rhs, rtol=tol), (lhs, rhs)


def test_denoising_identity():
    op = Denoising()
    x = rand(0)
    assert jnp.array_equal(op.H(x), x)
    assert_adjoint(op, rand(1), rand(2))


def test_box_inpainting_zeroes_center():
    op = BoxInpainting(half_size_mask=10, dim_image=DIM)
    x = jnp.ones((B, DIM, DIM, C))
    out = op.H(x)
    d = DIM // 2
    assert jnp.all(out[:, d - 10 : d + 10, d - 10 : d + 10, :] == 0)
    assert jnp.all(out[:, : d - 10, :, :] == 1)
    assert_adjoint(op, rand(1), rand(2))


def test_random_inpainting_deterministic_mask():
    op1 = RandomInpainting(0.7, DIM, B)
    op2 = RandomInpainting(0.7, DIM, B)
    assert jnp.array_equal(op1.mask, op2.mask)  # fixed seed 42 (ref parity)
    keep_frac = float(jnp.mean(op1.mask))
    assert abs(keep_frac - 0.3) < 0.02  # Bernoulli(1-p) with p=0.7
    assert_adjoint(op1, rand(1), rand(2))


def test_paintbrush_mask_properties():
    op = PaintbrushInpainting(DIM, B)
    m = np.asarray(op.mask)
    assert m.shape == (B, DIM, DIM, 1)
    assert set(np.unique(m)) <= {0.0, 1.0}
    # lines are near the center; corners stay unmasked
    assert m[:, :2, :2].min() == 1.0
    # something actually got masked
    assert m.mean() < 1.0
    # deterministic across constructions
    op2 = PaintbrushInpainting(DIM, B)
    assert np.array_equal(m, np.asarray(op2.mask))
    assert_adjoint(op, rand(1), rand(2))


def test_gaussian_kernel_matches_reference_grid():
    k = gaussian_2d_kernel(1.0, 5)
    assert k.shape == (5, 5)
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[2, 2] == k.max()  # centered
    # symmetric
    assert np.allclose(k, k.T)
    assert np.allclose(k, k[::-1, ::-1])


def test_deblurring_fft_adjoint_and_blur():
    op = GaussianDeblurring(1.0, 15, "fft", C, DIM)
    x = rand(3)
    y = rand(4)
    assert_adjoint(op, x, y)
    # blurring a constant image is (nearly) identity
    const = jnp.ones((1, DIM, DIM, C)) * 0.7
    assert jnp.allclose(op.H(const), const, atol=1e-4)
    # blur reduces variance
    assert jnp.var(op.H(x)) < jnp.var(x)


def test_deblurring_conv_mode_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    op = GaussianDeblurring(1.0, 5, "conv", C, DIM)
    x = np.asarray(rand(5), dtype=np.float32)
    ours = np.asarray(op.H(jnp.asarray(x)))
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    k = torch.from_numpy(op.kernel).view(1, 1, 5, 5).repeat(C, 1, 1, 1)
    ref = F.conv2d(xt, k, stride=1, padding="same", groups=C)
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref, atol=1e-5)


def test_superresolution_decimation_and_adjoint():
    op = Superresolution(2, DIM)
    x = rand(6)
    y = op.H(x)
    assert y.shape == (B, DIM // 2, DIM // 2, C)
    assert jnp.array_equal(y, x[:, ::2, ::2, :])
    up = op.H_adj(y)
    assert up.shape == x.shape
    assert jnp.array_equal(up[:, ::2, ::2, :], y)
    assert jnp.all(up[:, 1::2, 1::2, :] == 0)
    assert_adjoint(op, rand(7), rand(8, (B, DIM // 2, DIM // 2, C)))


def test_superresolution_bicubic_adjoint():
    op = Superresolution(2, DIM, mode="bicubic")
    assert_adjoint(op, rand(9), rand(10, (B, DIM // 2, DIM // 2, C)))


def test_bicubic_filter_shape_and_sum():
    w = bicubic_filter(2)
    assert w.shape == (8, 8)
    assert abs(w.sum() - 1.0) < 1e-6


def test_operators_jit_inline():
    """Operators must close over static data and jit cleanly."""
    op = GaussianDeblurring(1.0, 15, "fft", C, DIM)

    @jax.jit
    def f(x):
        return op.H_adj(op.H(x))

    out = f(rand(11))
    assert out.shape == (B, DIM, DIM, C)
