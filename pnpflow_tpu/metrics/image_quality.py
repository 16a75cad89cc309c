"""On-device restoration metrics: PSNR and SSIM (NHWC).

PSNR mirrors torchmetrics' per-image reduction used by the reference
(utils.py:610-611: data_range=1.0, dim=(1,2,3), elementwise-mean): per-image
10*log10(range^2 / mse) averaged over the batch.

SSIM mirrors ignite's gaussian-window SSIM used by the reference
(utils.py:795-802: data_range=1.0): 11x11 gaussian window sigma 1.5,
k1=0.01, k2=0.03, reflect ('SYMMETRIC'-style) padding, per-pixel SSIM map
averaged over everything.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 1.0):
    """Mean per-image PSNR over the batch (NHWC)."""
    mse = jnp.mean((pred - target) ** 2, axis=(1, 2, 3))
    val = 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-20))
    return jnp.mean(val)


def _gaussian_window(kernel_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    coords = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


def _filter2d(x: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise valid conv of NHWC x with a (k, k) window."""
    c = x.shape[-1]
    k = jnp.asarray(window)[:, :, None, None]
    k = jnp.tile(k, (1, 1, 1, c))
    return lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
):
    """Structural similarity, ignite-compatible (uniform mean of the per-pixel
    SSIM map over batch, space and channels)."""
    window = _gaussian_window(kernel_size, sigma)
    pad = (kernel_size - 1) // 2
    pad_cfg = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    x = jnp.pad(pred.astype(jnp.float32), pad_cfg, mode="reflect")
    y = jnp.pad(target.astype(jnp.float32), pad_cfg, mode="reflect")

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    mu_x = _filter2d(x, window)
    mu_y = _filter2d(y, window)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y

    sigma_xx = _filter2d(x * x, window) - mu_xx
    sigma_yy = _filter2d(y * y, window) - mu_yy
    sigma_xy = _filter2d(x * y, window) - mu_xy

    a1 = 2 * mu_xy + c1
    a2 = 2 * sigma_xy + c2
    b1 = mu_xx + mu_yy + c1
    b2 = sigma_xx + sigma_yy + c2
    ssim_map = (a1 * a2) / (b1 * b2)
    return jnp.mean(ssim_map)
