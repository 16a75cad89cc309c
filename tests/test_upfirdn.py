"""upfirdn2d / FIR resampling parity against a numpy oracle implementing the
reference CUDA op's exact fallback semantics (op/upfirdn2d.py:159-200)."""

import numpy as np
import jax.numpy as jnp
import pytest

from pnpflow_tpu.ops.upfirdn import (
    conv_downsample_2d,
    downsample_2d,
    fused_leaky_relu,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
    upsample_conv_2d,
)


def upfirdn2d_oracle(x_nhwc, k, up=1, down=1, pad=(0, 0)):
    """Direct numpy port of upfirdn2d_native (NHWC in/out)."""
    b, in_h, in_w, c = x_nhwc.shape
    kh, kw = k.shape
    pad0, pad1 = pad
    # zero-insertion upsample (appends up-1 zeros after every sample)
    up_buf = np.zeros((b, in_h * up, in_w * up, c), np.float64)
    up_buf[:, ::up, ::up, :] = x_nhwc
    # pad
    padded = np.pad(
        up_buf,
        ((0, 0), (max(pad0, 0), max(pad1, 0)), (max(pad0, 0), max(pad1, 0)),
         (0, 0)),
    )
    # correlate with flipped kernel == convolve with k
    kf = k[::-1, ::-1]
    oh = in_h * up + pad0 + pad1 - kh + 1
    ow = in_w * up + pad0 + pad1 - kw + 1
    out = np.zeros((b, oh, ow, c), np.float64)
    for i in range(oh):
        for j in range(ow):
            patch = padded[:, i : i + kh, j : j + kw, :]
            out[:, i, j, :] = np.einsum("bhwc,hw->bc", patch, kf)
    return out[:, ::down, ::down, :]


@pytest.mark.parametrize(
    "up,down,pad",
    [(1, 1, (1, 1)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (2, 2)),
     (1, 1, (0, 0))],
)
def test_upfirdn2d_matches_oracle(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 6, 6, 3)).astype(np.float32)
    k = setup_kernel([1, 3, 3, 1])
    ours = np.asarray(upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    ref = upfirdn2d_oracle(x.astype(np.float64), k.astype(np.float64),
                           up=up, down=down, pad=pad)
    assert ours.shape == ref.shape
    assert np.allclose(ours, ref, atol=1e-4), (up, down, pad)


def test_upsample_2d_constant_gain():
    """Constant input stays constant under FIR upsampling (gain-normalized
    kernel)."""
    x = jnp.ones((1, 8, 8, 2))
    y = upsample_2d(x, [1, 3, 3, 1], factor=2)
    assert y.shape == (1, 16, 16, 2)
    inner = np.asarray(y)[:, 4:-4, 4:-4, :]
    assert np.allclose(inner, 1.0, atol=1e-5)


def test_downsample_2d_constant_gain():
    x = jnp.ones((1, 16, 16, 2))
    y = downsample_2d(x, [1, 3, 3, 1], factor=2)
    assert y.shape == (1, 8, 8, 2)
    inner = np.asarray(y)[:, 2:-2, 2:-2, :]
    assert np.allclose(inner, 1.0, atol=1e-5)


def test_up_then_down_roundtrip_identityish():
    """FIR up then down of a smooth image approximately preserves it."""
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    x = np.sin(2 * np.pi * xx)[None, :, :, None].astype(np.float32)
    y = downsample_2d(
        upsample_2d(jnp.asarray(x), [1, 3, 3, 1]), [1, 3, 3, 1]
    )
    inner_in = x[:, 4:-4, 4:-4, :]
    inner_out = np.asarray(y)[:, 4:-4, 4:-4, :]
    assert np.abs(inner_out - inner_in).max() < 0.15


def test_upsample_conv_2d_shape_and_conv_parity():
    """up=2 with a 3x3 kernel -> (2H, 2W); degenerate factor-1 FIR check via
    torch conv_transpose parity."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 5, 5, 2)).astype(np.float32)
    w = rng.normal(size=(3, 3, 2, 4)).astype(np.float32)  # HWIO
    y = upsample_conv_2d(jnp.asarray(x), jnp.asarray(w), k=[1, 3, 3, 1])
    assert y.shape == (1, 10, 10, 4)

    # reference pipeline: conv_transpose2d with flipped weights + FIR
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    # torch convT weight layout (in, out, kh, kw), pre-flipped
    wt = torch.from_numpy(
        np.ascontiguousarray(np.transpose(w[::-1, ::-1], (2, 3, 0, 1)))
    )
    mid_ref = F.conv_transpose2d(xt, wt, stride=2)
    k = setup_kernel([1, 3, 3, 1]) * 4.0
    p = (k.shape[0] - 2) - 2
    mid_ref_nhwc = np.transpose(mid_ref.numpy(), (0, 2, 3, 1))
    ref = upfirdn2d_oracle(
        mid_ref_nhwc.astype(np.float64), k.astype(np.float64),
        pad=((p + 1) // 2 + 1, p // 2 + 1),
    )
    assert np.allclose(np.asarray(y), ref, atol=1e-3)


def test_conv_downsample_2d_shape():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 8, 8, 2)).astype(np.float32)
    w = rng.normal(size=(3, 3, 2, 4)).astype(np.float32)
    y = conv_downsample_2d(jnp.asarray(x), jnp.asarray(w), k=[1, 3, 3, 1])
    assert y.shape == (1, 4, 4, 4)


def test_naive_resampling():
    x = jnp.asarray(np.arange(16, dtype=np.float32).reshape(1, 4, 4, 1))
    up = naive_upsample_2d(x)
    assert up.shape == (1, 8, 8, 1)
    assert float(up[0, 0, 0, 0]) == float(up[0, 1, 1, 0])
    down = naive_downsample_2d(up)
    assert np.allclose(np.asarray(down), np.asarray(x))


def test_fused_leaky_relu_semantics():
    """leaky_relu(x + b, 0.2) * sqrt(2) (op/fused_act.py:86-94)."""
    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([0.5, -0.5])
    y = np.asarray(fused_leaky_relu(x, b))
    expected = np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2.0)
    assert np.allclose(y, expected, atol=1e-6)
