"""Pallas TPU kernels — hand-written equivalents of the reference's CUDA ops.

The reference's only native code is the StyleGAN2 ``upfirdn2d`` CUDA kernel
(op/upfirdn2d_kernel.cu:50-368) plus ``fused_bias_act``.  The XLA
formulation (ops/upfirdn.py) is one ``conv_general_dilated``; this module
adds a Pallas kernel for the depthwise FIR core that maps the K*K taps onto
VPU shifted-adds instead of a conv — the small 4x4 depthwise filter wastes
the MXU, while the VPU formulation is pure bandwidth.

Decomposition: every upfirdn2d = (zero-insert up) -> pad -> dense KxK FIR ->
decimate.  Zero-insertion and decimation are trivial XLA ops; the dense FIR
is the Pallas kernel ``fir2d``:

  * grid (B, H/TILE_H); x is pre-padded on the host side of the call;
  * each program DMAs its (TILE_H + K - 1) input rows HBM -> VMEM scratch,
    accumulates the K*K taps as statically-shifted adds, writes TILE_H rows;
  * channels ride the lane dimension (NHWC), rows the sublane dimension.

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


def _pick_tile_h(h_out: int, w: int, c: int, k: int,
                 vmem_budget: int = 8 * 1024 * 1024) -> int:
    """Largest power-of-two row tile whose scratch+out fit the VMEM budget."""
    for tile in (64, 32, 16, 8, 4, 2, 1):
        if tile > h_out:
            continue
        scratch = (tile + k - 1) * w * c * 4
        out = tile * w * c * 4
        if scratch + out <= vmem_budget and h_out % tile == 0:
            return tile
    return 1


def _fir2d_kernel(x_hbm, out_ref, scratch, sem, *, taps, tile_h, w_out,
                  kh, kw):
    b = pl.program_id(0)
    ht = pl.program_id(1)
    rows = tile_h + kh - 1
    dma = pltpu.make_async_copy(
        x_hbm.at[b, pl.ds(ht * tile_h, rows)], scratch, sem
    )
    dma.start()
    dma.wait()

    acc = jnp.zeros((tile_h, w_out, scratch.shape[-1]), jnp.float32)
    for p in range(kh):
        for q in range(kw):
            tap = taps[p][q]
            if tap == 0.0:
                continue
            acc += tap * scratch[p : p + tile_h, q : q + w_out, :]
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
    tile_h = _pick_tile_h(h_out, wp, c, kh)

    kernel = functools.partial(
        _fir2d_kernel, taps=taps, tile_h=tile_h, w_out=w_out, kh=kh, kw=kw
    )
    return pl.pallas_call(
        kernel,
        grid=(b, h_out // tile_h),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, tile_h, w_out, c),
            lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, h_out, w_out, c), x_padded.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile_h + kh - 1, wp, c), x_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_padded)


def upfirdn2d_pallas(x, k: np.ndarray, up: int = 1, down: int = 1,
                     pad=(0, 0), interpret: bool = False):
    """upfirdn2d with the FIR core as a Pallas kernel.

    Matches ``ops.upfirdn.upfirdn2d`` / the reference ``upfirdn2d_native``
    semantics (op/upfirdn2d.py:159-200).  Zero-insertion and decimation are
    XLA; the KxK FIR runs in the Pallas kernel.
    """
    b, h, w, c = x.shape
    pad0, pad1 = int(pad[0]), int(pad[1])
    if pad0 < 0 or pad1 < 0:
        raise NotImplementedError("negative upfirdn2d padding")

    if up > 1:
        z = jnp.zeros((b, h * up, w * up, c), x.dtype)
        x = z.at[:, ::up, ::up, :].set(x)
    x = jnp.pad(x, ((0, 0), (pad0, pad1), (pad0, pad1), (0, 0)))

    taps = tuple(tuple(float(v) for v in row) for row in np.asarray(k))
    y = _fir2d_padded(x, taps, interpret=interpret)
    if down > 1:
        y = y[:, ::down, ::down, :]
    return y
