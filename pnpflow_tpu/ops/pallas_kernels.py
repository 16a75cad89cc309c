"""Pallas TPU kernels — hand-written equivalents of the reference's CUDA ops.

The reference's only native code is the StyleGAN2 ``upfirdn2d`` CUDA kernel
(op/upfirdn2d_kernel.cu:50-368) plus ``fused_bias_act``.  The XLA
formulation (ops/upfirdn.py) is one ``conv_general_dilated``; this module
adds a Pallas kernel for the depthwise FIR core that maps the K*K taps onto
VPU shifted-adds instead of a conv — the small 4x4 depthwise filter wastes
the MXU, while the VPU formulation is pure bandwidth.

Decomposition: every upfirdn2d = (zero-insert up) -> pad -> dense KxK FIR ->
decimate.  Zero-insertion and decimation are trivial XLA ops; the dense FIR
is the Pallas kernel ``fir2d``: grid over the batch, one padded image per
program in VMEM, K*K statically-shifted adds (channels ride the lane
dimension, rows/cols the sublanes).  Images too large for VMEM fall back to
the XLA conv formulation.

``fused_bias_act`` needs no kernel — XLA already fuses bias+leaky-ReLU into
neighbors (ops/upfirdn.py:fused_leaky_relu).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# per-program VMEM budget for in-block FIR (input block + output block)
_VMEM_BUDGET = 10 * 1024 * 1024


def _fir2d_kernel(x_ref, out_ref, *, taps, h_out, w_out):
    kh = len(taps)
    kw = len(taps[0])
    acc = jnp.zeros((h_out, w_out, x_ref.shape[-1]), jnp.float32)
    for p in range(kh):
        for q in range(kw):
            tap = taps[p][q]
            if tap == 0.0:
                continue
            acc += tap * x_ref[0, p : p + h_out, q : q + w_out, :].astype(
                jnp.float32
            )
    out_ref[0] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def _fir2d_padded(x_padded, k: tuple, interpret: bool = False):
    """Dense KxK FIR (true convolution with k) of a pre-padded NHWC array.

    ``k`` is a tuple-of-tuples of python floats (static) — the kernel taps
    are compile-time constants.  Output: (B, Hp-K+1, Wp-K+1, C).
    """
    kh = len(k)
    kw = len(k[0])
    b, hp, wp, c = x_padded.shape
    h_out, w_out = hp - kh + 1, wp - kw + 1
    # true convolution = correlation with the flipped taps
    taps = tuple(tuple(reversed(row)) for row in reversed(k))

    kernel = functools.partial(
        _fir2d_kernel, taps=taps, h_out=h_out, w_out=w_out
    )
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, hp, wp, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, h_out, w_out, c), lambda i: (i, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x_padded.dtype),
        interpret=interpret,
    )(x_padded)


def _fits_vmem(hp, wp, c, itemsize=4):
    return 2 * hp * wp * c * itemsize <= _VMEM_BUDGET


def upfirdn2d_pallas(x, k: np.ndarray, up: int = 1, down: int = 1,
                     pad=(0, 0), interpret: bool = False):
    """upfirdn2d with the FIR core as a Pallas kernel.

    Matches ``ops.upfirdn.upfirdn2d`` / the reference ``upfirdn2d_native``
    semantics (op/upfirdn2d.py:159-200).  Zero-insertion and decimation are
    XLA; the KxK FIR runs in the Pallas kernel.  Shapes whose padded image
    exceeds the per-program VMEM budget fall back to the XLA formulation.
    """
    b, h, w, c = x.shape
    pad0, pad1 = int(pad[0]), int(pad[1])
    if pad0 < 0 or pad1 < 0:
        raise NotImplementedError("negative upfirdn2d padding")

    hp = h * up + pad0 + pad1
    wp = w * up + pad0 + pad1
    if not _fits_vmem(hp, wp, c):
        from pnpflow_tpu.ops.upfirdn import upfirdn2d_xla

        return upfirdn2d_xla(x, k, up=up, down=down, pad=pad)

    if up > 1:
        z = jnp.zeros((b, h * up, w * up, c), x.dtype)
        x = z.at[:, ::up, ::up, :].set(x)
    x = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))

    taps = tuple(tuple(float(v) for v in row) for row in np.asarray(k))
    y = _fir2d_padded(x, taps, interpret=interpret)
    if down > 1:
        y = y[:, ::down, ::down, :]
    return y
