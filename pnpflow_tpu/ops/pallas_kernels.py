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
import os

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


# ---------------------------------------------------------------------------
# Fused GroupNorm (+ swish) — the profiled hot spot of the restoration loop.
#
# A TPU trace of the headline bench (BASELINE.md) shows the GroupNorm
# statistics reductions (convert_reduce fusions) consuming ~49% of device
# time: XLA materializes the conv output to HBM, re-reads it for the stats
# pass, and re-reads it again for the normalize pass.  This kernel does
# stats + normalize + swish in ONE VMEM pass per batch block: read once,
# write once.  Group pooling of the per-channel moments is a tiny (C, C)
# matmul with a static block-constant matrix, keeping every op lane-aligned
# (C rides the lanes; no reshapes on the lane dim).
#
# Backward runs as plain XLA (custom_vjp below) so the fused forward is
# usable inside jax.grad (GS-denoiser vjp, d_flow) without a hand-written
# transpose kernel.


def _gn_swish_kernel(x_ref, scale_ref, bias_ref, pool_ref, o_ref, *, eps,
                     swish):
    x = x_ref[...].astype(jnp.float32)  # (bblk, H, W, C)
    s1 = jnp.sum(x, axis=(1, 2))        # (bblk, C)
    s2 = jnp.sum(x * x, axis=(1, 2))
    pool_m = pool_ref[...]              # (C, C) group-averaging matrix
    mean = jax.lax.dot(s1, pool_m, precision=jax.lax.Precision.HIGHEST)
    meansq = jax.lax.dot(s2, pool_m, precision=jax.lax.Precision.HIGHEST)
    inv = jax.lax.rsqrt(meansq - mean * mean + eps)
    y = (x - mean[:, None, None, :]) * inv[:, None, None, :]
    y = y * scale_ref[...].astype(jnp.float32) + bias_ref[...].astype(
        jnp.float32
    )
    if swish:
        y = y * jax.nn.sigmoid(y)
    o_ref[...] = y.astype(o_ref.dtype)


def _group_pool_matrix(c: int, num_groups: int, n_per_group: int):
    cg = c // num_groups
    m = np.zeros((c, c), dtype=np.float32)
    for g in range(num_groups):
        m[g * cg : (g + 1) * cg, g * cg : (g + 1) * cg] = 1.0 / n_per_group
    return m


def _pick_batch_block(b: int, image_bytes: int, budget: int = 1 << 20) -> int:
    """Largest divisor of ``b`` whose input block stays under ``budget``.

    The scoped-vmem stack holds the double-buffered bf16 in/out blocks plus
    the fp32 intermediates (~6x the input block), against a 16M scoped
    limit — 1M of input block keeps the total comfortably inside it.
    """
    bblk = 1
    for cand in range(1, b + 1):
        if b % cand == 0 and cand * image_bytes <= budget:
            bblk = cand
    return bblk


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "swish", "interpret")
)
def _gn_swish_fwd_pallas(x, scale, bias, num_groups, eps, swish, interpret):
    b, h, w, c = x.shape
    pool = jnp.asarray(
        _group_pool_matrix(c, num_groups, h * w * (c // num_groups))
    )
    bblk = _pick_batch_block(b, h * w * c * (x.dtype.itemsize + 4))
    kernel = functools.partial(_gn_swish_kernel, eps=eps, swish=swish)
    return pl.pallas_call(
        kernel,
        grid=(b // bblk,),
        in_specs=[
            pl.BlockSpec(
                (bblk, h, w, c), lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bblk, h, w, c), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), x.dtype),
        interpret=interpret,
    )(x, scale, bias, pool)


def _gn_stats(x, num_groups, eps):
    b, h, w, c = x.shape
    cg = c // num_groups
    xf = x.astype(jnp.float32).reshape(b, h * w, num_groups, cg)
    mean = jnp.mean(xf, axis=(1, 3))                       # (b, G)
    var = jnp.mean(xf * xf, axis=(1, 3)) - mean * mean
    inv = jax.lax.rsqrt(var + eps)
    rep = lambda a: jnp.repeat(a, cg, axis=1)[:, None, None, :]
    return rep(mean), rep(inv)


def _gn_swish_reference(x, scale, bias, num_groups, eps, swish):
    """Plain-XLA forward (CPU fallback + the custom-vjp recompute path)."""
    mean, inv = _gn_stats(x, num_groups, eps)
    y = (x.astype(jnp.float32) - mean) * inv
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if swish:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_swish(x, scale, bias, num_groups: int = 32, eps: float = 1e-6,
                    swish: bool = True):
    """Fused GroupNorm(num_groups, eps) [+ swish] on NHWC.

    Pallas one-pass kernel on TPU; plain XLA elsewhere (and for shapes the
    kernel does not support).  fp32 statistics regardless of input dtype.
    """
    b, h, w, c = x.shape
    on_tpu = jax.default_backend() == "tpu"
    # supported iff a batch block fits _pick_batch_block's budget (same
    # constant): a larger threshold would take the Pallas path with a
    # bblk=1 block that overflows the scoped-VMEM stack at runtime
    supported = (
        c % num_groups == 0
        and h * w * c * (x.dtype.itemsize + 4) <= (1 << 20)
    )
    if on_tpu and supported:
        return _gn_swish_fwd_pallas(
            x, scale, bias, num_groups, eps, swish, False
        )
    return _gn_swish_reference(x, scale, bias, num_groups, eps, swish)


def _gn_swish_vjp_fwd(x, scale, bias, num_groups, eps, swish):
    return groupnorm_swish(x, scale, bias, num_groups, eps, swish), (
        x, scale, bias,
    )


def _gn_swish_vjp_bwd(num_groups, eps, swish, res, dy):
    x, scale, bias = res
    mean, inv = _gn_stats(x, num_groups, eps)
    xf = x.astype(jnp.float32)
    xhat = (xf - mean) * inv
    dy = dy.astype(jnp.float32)
    if swish:
        ypre = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        sig = jax.nn.sigmoid(ypre)
        dy = dy * (sig * (1.0 + ypre * (1.0 - sig)))
    dscale = jnp.sum(dy * xhat, axis=(0, 1, 2)).astype(scale.dtype)
    dbias = jnp.sum(dy, axis=(0, 1, 2)).astype(bias.dtype)
    dxhat = dy * scale.astype(jnp.float32)

    b, h, w, c = x.shape
    cg = c // num_groups

    def gmean(a):  # mean over each group's (H, W, Cg) slab, broadcast back
        ar = a.reshape(b, h * w, num_groups, cg)
        m = jnp.mean(ar, axis=(1, 3))
        return jnp.repeat(m, cg, axis=1)[:, None, None, :]

    dx = inv * (dxhat - gmean(dxhat) - xhat * gmean(dxhat * xhat))
    return dx.astype(x.dtype), dscale, dbias


groupnorm_swish.defvjp(_gn_swish_vjp_fwd, _gn_swish_vjp_bwd)


# ---------------------------------------------------------------------------
# Batch-minor fused GroupNorm (+ swish).
#
# The C-minor kernel above loses 4x end to end because XLA lays the conv
# activations out batch-minor ({0,3,2,1}: N on lanes, C on sublanes) at the
# restoration-bench shapes, and a custom call demanding the default NHWC
# layout forces full-tensor transposes on entry and exit.  This variant
# flips the trick around: transpose the NHWC tensor *logically* to
# (HW, C, N).  The default layout of that logical shape (N minor, then C)
# is byte-identical to the batch-minor physical layout of the original, so
# XLA's transpose-is-bitcast pass turns both transposes into free layout
# changes and the kernel reads the activations exactly as the convs
# produced them: N on lanes, C on sublanes (clean (8/16, 128) tiles for
# every live C).
#
# The full activation cannot sit in VMEM, so the kernel runs a two-phase
# sequential grid over HW blocks: phase 0 accumulates per-channel fp32
# moment sums (C, N) in VMEM scratch; phase 1 pools them into group
# statistics (one tiny (C, C) static matmul), then normalizes + swishes
# block by block.  Two HBM reads + one write per element — the same
# traffic as XLA's decomposition, but streamed in the native layout with
# no converts materialized.


def _gn_swish_bm_kernel(x_ref, scale_ref, bias_ref, pool_ref, o_ref,
                        s1_ref, s2_ref, *, eps, swish, inv_n):
    p = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(p == 0)
    def _stats():
        @pl.when(j == 0)
        def _zero():
            s1_ref[...] = jnp.zeros_like(s1_ref)
            s2_ref[...] = jnp.zeros_like(s2_ref)

        x = x_ref[...].astype(jnp.float32)       # (hwblk, C, N)
        s1_ref[...] += jnp.sum(x, axis=0)
        s2_ref[...] += jnp.sum(x * x, axis=0)

    @pl.when(p == 1)
    def _normalize():
        pool = pool_ref[...]                      # (C, C) group-sum matrix
        mean = jax.lax.dot(
            pool, s1_ref[...], precision=jax.lax.Precision.HIGHEST
        ) * inv_n                                 # (C, N)
        meansq = jax.lax.dot(
            pool, s2_ref[...], precision=jax.lax.Precision.HIGHEST
        ) * inv_n
        inv = jax.lax.rsqrt(meansq - mean * mean + eps)
        x = x_ref[...].astype(jnp.float32)
        y = (x - mean[None]) * inv[None]
        y = (y * scale_ref[...].astype(jnp.float32)[None]
             + bias_ref[...].astype(jnp.float32)[None])
        if swish:
            y = y * jax.nn.sigmoid(y)
        o_ref[...] = y.astype(o_ref.dtype)


# Input-block byte budget.  The scoped-VMEM stack is ~6x the input block
# (double-buffered bf16 in/out + fp32 temporaries); the pallas_call below
# raises its own vmem_limit_bytes accordingly.  Small blocks were the
# measured kill: at the old 1 MiB budget a level-0 GN site ran a 256-step
# grid whose per-step overhead swamped the streaming (BASELINE.md).
_BM_BLOCK_BUDGET = int(
    os.environ.get("PNPFLOW_TPU_GN_BLOCK_BUDGET", 6 << 20)
)


def _pick_hw_block(hw: int, row_bytes: int, budget: int | None = None) -> int:
    """Largest divisor of ``hw`` whose (hwblk, C, Npad) block fits budget."""
    budget = _BM_BLOCK_BUDGET if budget is None else budget
    blk = 1
    for cand in range(1, hw + 1):
        if hw % cand == 0 and cand * row_bytes <= budget:
            blk = cand
    return blk


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "swish", "interpret")
)
def _gn_swish_bm_pallas(xt, scale, bias, num_groups, eps, swish, interpret):
    hw, c, n = xt.shape
    cg = c // num_groups
    npad = -(-n // 128) * 128
    hwblk = _pick_hw_block(hw, c * npad * xt.dtype.itemsize)
    # group-SUM matrix (un-normalized; inv_n applied in-kernel)
    pool = jnp.asarray(np.kron(np.eye(num_groups, dtype=np.float32),
                               np.ones((cg, cg), np.float32)))
    kernel = functools.partial(
        _gn_swish_bm_kernel, eps=eps, swish=swish,
        inv_n=np.float32(1.0 / (hw * cg)),
    )
    # Output blocks: phase 0 never writes, so its index map pins block 0 —
    # the buffer is only flushed to HBM once phase 1 starts producing.
    return pl.pallas_call(
        kernel,
        grid=(2, hw // hwblk),
        in_specs=[
            pl.BlockSpec((hwblk, c, n), lambda p, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda p, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 1), lambda p, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda p, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (hwblk, c, n), lambda p, j: (jnp.where(p == 0, 0, j), 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((hw, c, n), xt.dtype),
        scratch_shapes=[
            pltpu.VMEM((c, n), jnp.float32),
            pltpu.VMEM((c, n), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # the scoped stack is ~8x the input block (double-buffered
            # bf16 in/out + fp32 temporaries); 100 MiB leaves headroom
            # inside the v5e's 128 MiB VMEM at the 6 MiB block budget
            vmem_limit_bytes=100 << 20,
        ),
        interpret=interpret,
    )(xt, scale[:, None], bias[:, None], pool)


def _bm_supported(x, num_groups):
    b, h, w, c = x.shape
    return c % num_groups == 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def groupnorm_swish_bm(x, scale, bias, num_groups: int = 32,
                       eps: float = 1e-6, swish: bool = True):
    """Fused GroupNorm [+ swish] on NHWC via the batch-minor Pallas kernel.

    Designed for activations XLA already keeps batch-minor (large batch,
    modest C): the (NHWC)->(HW,C,N) transposes surrounding the custom call
    are layout bitcasts, not data movement.  Falls back to the plain XLA
    formulation off-TPU or for ragged group sizes.
    """
    if jax.default_backend() == "tpu" and _bm_supported(x, num_groups):
        b, h, w, c = x.shape
        xt = jnp.transpose(x, (1, 2, 3, 0)).reshape(h * w, c, b)
        yt = _gn_swish_bm_pallas(xt, scale, bias, num_groups, eps, swish,
                                 False)
        return jnp.transpose(yt.reshape(h, w, c, b), (3, 0, 1, 2))
    return _gn_swish_reference(x, scale, bias, num_groups, eps, swish)


def _gn_swish_bm_vjp_fwd(x, scale, bias, num_groups, eps, swish):
    return groupnorm_swish_bm(x, scale, bias, num_groups, eps, swish), (
        x, scale, bias,
    )


groupnorm_swish_bm.defvjp(_gn_swish_bm_vjp_fwd, _gn_swish_vjp_bwd)
