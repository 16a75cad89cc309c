"""LPIPS (AlexNet backbone) in Flax.

The reference computes LPIPS with the ``lpips`` package's pretrained AlexNet
(utils.py:677-724).  Those weights cannot be downloaded in a zero-egress
environment, so this module implements the LPIPS *architecture* natively
(AlexNet feature trunk + per-layer 1x1 linear heads + ImageNet input
scaling) and loads converted weights from
``{output_root}/model/lpips_alex.npz`` when present.  Use
``pnpflow_tpu.utils.lpips_convert.convert`` to produce that file once from a
torch LPIPS checkpoint.  When the file is absent, LPIPS reporting is skipped
with a warning (PSNR/SSIM are always available).
"""

from __future__ import annotations

import os
import warnings

import numpy as np
import jax.numpy as jnp
from jax import lax

_CACHE: dict = {}

# AlexNet conv trunk (features): (out_ch, kernel, stride, pad)
_ALEX_LAYOUT = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool after trunk layers 0, 1 (indices into _ALEX_LAYOUT)
_POOL_AFTER = {0, 1}

# LPIPS input scaling (the 'scaling_layer'): shift/scale on [-1,1] inputs
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)


def _conv(x, w, b, stride, pad):
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b[None, None, None, :]


def _maxpool(x):
    return lax.reduce_window(
        x,
        -jnp.inf,
        lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 2, 2, 1),
        padding="VALID",
    )


def _normalize(feat, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(feat**2, axis=-1, keepdims=True))
    return feat / (norm + eps)


def lpips_distance(weights: dict, x: jnp.ndarray, y: jnp.ndarray):
    """LPIPS(x, y) for NHWC images in [-1, 1]; mean over the batch."""
    shift = jnp.asarray(_SHIFT)[None, None, None, :]
    scale = jnp.asarray(_SCALE)[None, None, None, :]
    xs = (x - shift) / scale
    ys = (y - shift) / scale

    total = 0.0
    hx, hy = xs, ys
    for i, (_, _, stride, pad) in enumerate(_ALEX_LAYOUT):
        w = jnp.asarray(weights[f"conv{i}_w"])
        b = jnp.asarray(weights[f"conv{i}_b"])
        hx = jnp.maximum(_conv(hx, w, b, stride, pad), 0.0)
        hy = jnp.maximum(_conv(hy, w, b, stride, pad), 0.0)
        diff = (_normalize(hx) - _normalize(hy)) ** 2
        lin = jnp.asarray(weights[f"lin{i}_w"])  # (C,) nonneg 1x1 weights
        total = total + jnp.mean(
            jnp.sum(diff * lin[None, None, None, :], axis=-1), axis=(1, 2)
        )
        if i in _POOL_AFTER:
            hx = _maxpool(hx)
            hy = _maxpool(hy)
    return jnp.mean(total)


def get_lpips_fn(args):
    """Return a callable (clean, rec) -> scalar, or None if no weights."""
    path = os.path.abspath(os.path.join(
        getattr(args, "output_root", "./"), "model", "lpips_alex.npz"
    ))
    if path in _CACHE:
        return _CACHE[path]
    if not os.path.exists(path):
        if ("warned", path) not in _CACHE:
            warnings.warn(
                "LPIPS weights not found at {} — skipping LPIPS reporting "
                "(PSNR/SSIM unaffected). Convert torch LPIPS weights with "
                "pnpflow_tpu.utils.lpips_convert.".format(path)
            )
            _CACHE[("warned", path)] = True
        return None
    data = dict(np.load(path))
    _CACHE[path] = lambda a, b: lpips_distance(data, a, b)
    return _CACHE[path]
