"""TPU-native upfirdn2d + fused bias/leaky-ReLU (StyleGAN2 resampling ops).

These replace the reference's two CUDA custom ops — its only native code
(op/upfirdn2d.cpp + op/upfirdn2d_kernel.cu, op/fused_bias_act.cpp +
op/fused_bias_act_kernel.cu, SURVEY.md §2.4).  Semantics are specified by the
reference's pure-torch fallbacks ``upfirdn2d_native`` (op/upfirdn2d.py:159-
200: zero-insertion upsample -> pad -> FIR conv with the flipped kernel ->
decimate) and ``fused_leaky_relu`` (op/fused_act.py:86-94: leaky_relu(x + b,
0.2) * sqrt(2)).

TPU-first design: the whole pad/upsample/FIR/decimate pipeline is ONE
``lax.conv_general_dilated`` call — ``lhs_dilation`` performs the zero
insertion, explicit padding absorbs both the FIR pad and the trailing
dilation zeros, ``window_strides`` decimates — which XLA maps directly onto
the MXU/VPU with fused surrounding elementwise ops.  A hand-written Pallas
kernel (ops/pallas_kernels.py) covers the small-resolution depthwise case.

All functions operate on NHWC (the torch originals are NCHW).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def setup_kernel(k) -> np.ndarray:
    """1-D separable or 2-D FIR kernel -> normalized 2-D float32 kernel
    (reference up_or_down_sampling.py:184-192)."""
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k = k / np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


# FIR backend: "xla" (one conv_general_dilated) or "pallas" (hand-written
# VPU kernel, ops/pallas_kernels.py).  Switch globally via set_fir_backend
# or the PNPFLOW_TPU_FIR env var.
import os as _os

_FIR_BACKEND = _os.environ.get("PNPFLOW_TPU_FIR", "xla")


def set_fir_backend(name: str):
    global _FIR_BACKEND
    assert name in ("xla", "pallas"), name
    _FIR_BACKEND = name


def upfirdn2d(x, k: np.ndarray, up: int = 1, down: int = 1,
              pad=(0, 0)):
    """Upsample-FIR-downsample on NHWC, matching ``upfirdn2d_native``
    (op/upfirdn2d.py:159-200) with pad_x = pad_y = pad.

    out = decimate_down( conv(pad(zero_insert_up(x)), flip(k)) )
    """
    if _FIR_BACKEND == "pallas":
        from pnpflow_tpu.ops.pallas_kernels import upfirdn2d_pallas

        return upfirdn2d_pallas(x, np.asarray(k), up=up, down=down, pad=pad)
    return upfirdn2d_xla(x, k, up=up, down=down, pad=pad)


def upfirdn2d_xla(x, k: np.ndarray, up: int = 1, down: int = 1,
                  pad=(0, 0)):
    """The one-conv XLA formulation (always used for the fallback path)."""
    c = x.shape[-1]
    kh, kw = k.shape
    kernel = jnp.asarray(np.ascontiguousarray(k[::-1, ::-1]), x.dtype)
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    pad0, pad1 = int(pad[0]), int(pad[1])
    # native zero-insertion appends up-1 trailing zeros after the last
    # sample; lhs_dilation only inserts between samples -> fold the
    # difference into the high-side padding.
    extra = up - 1
    lo, hi = pad0, pad1 + extra
    # native crops negative pads before the conv
    if lo < 0 or hi < 0:
        raise NotImplementedError("negative upfirdn2d padding")
    # fp32 inputs get exact accumulation (TPU convs otherwise round
    # passes through bf16; the reference CUDA op is exact fp32)
    precision = (
        lax.Precision.HIGHEST if x.dtype == jnp.float32 else None
    )
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(down, down),
        padding=((lo, hi), (lo, hi)),
        lhs_dilation=(up, up),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=precision,
    )


def upsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR upsample (up_or_down_sampling.py:197-231)."""
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = k.shape[0] - factor
    return upfirdn2d(
        x, k, up=factor, pad=((p + 1) // 2 + factor - 1, p // 2)
    )


def downsample_2d(x, k=None, factor: int = 2, gain: float = 1.0):
    """FIR downsample (up_or_down_sampling.py:234-259)."""
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = k.shape[0] - factor
    return upfirdn2d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def upsample_conv_2d(x, w_hwio, k=None, factor: int = 2, gain: float = 1.0):
    """Fused transposed-conv upsample + FIR (up_or_down_sampling.py:72-143).

    ``w_hwio``: (kh, kw, in, out) conv kernel.  The torch original flips the
    weight and calls conv_transpose2d; the equivalent XLA program is one
    cross-correlation with ``lhs_dilation`` and full padding.
    """
    kh = w_hwio.shape[0]
    w_hwio = jnp.asarray(w_hwio, x.dtype)  # keep bf16 compute paths bf16
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * (gain * factor**2)
    p = (k.shape[0] - factor) - (kh - 1)

    y = lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding=((kh - 1, kh - 1), (kh - 1, kh - 1)),
        lhs_dilation=(factor, factor),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(
        y, k, pad=((p + 1) // 2 + factor - 1, p // 2 + 1)
    )


def conv_downsample_2d(x, w_hwio, k=None, factor: int = 2, gain: float = 1.0):
    """Fused FIR + strided conv downsample (up_or_down_sampling.py:146-181)."""
    kh = w_hwio.shape[0]
    w_hwio = jnp.asarray(w_hwio, x.dtype)  # keep bf16 compute paths bf16
    if k is None:
        k = [1.0] * factor
    k = setup_kernel(k) * gain
    p = (k.shape[0] - factor) + (kh - 1)
    y = upfirdn2d(x, k, pad=((p + 1) // 2, p // 2))
    return lax.conv_general_dilated(
        y,
        w_hwio,
        window_strides=(factor, factor),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def naive_upsample_2d(x, factor: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h, 1, w, 1, c)
    x = jnp.tile(x, (1, 1, factor, 1, factor, 1))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x, factor: int = 2):
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = float(np.sqrt(2.0))):
    """bias-add + leaky-ReLU * sqrt(2) — the reference's second CUDA op
    (op/fused_act.py:86-94).  XLA fuses this into neighboring ops."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale
