"""Fused 3x3-conv + GroupNorm-epilogue Pallas kernel (the round-4 stretch).

The headline-bench device trace (BASELINE.md "Round-2 perf investigation")
attributes 49% of pnp_flow step time to the GroupNorm *statistics* pass:
a full HBM read of every conv output, streaming at ~123 GB/s because XLA
lays conv activations out batch-minor.  Rounds 2-3 measured every strategy
that keeps XLA's convs and replaces only the norm (C-minor Pallas kernel,
batch-minor Pallas kernel, MXU-dot stats, bf16 stats, transposed-view
stats) — all slower: a *consumer-side* custom call pays layout/boundary
costs on every norm.  The one direction those A/Bs could not reach is
fusing the statistics into the **producing conv's epilogue**, which
requires owning the conv itself.  That is this kernel.

Design (TPU-first, not a translation — the reference runs eager torch
convs + separate GroupNorm, reference models.py:58-113):

* one `pallas_call`, grid over the batch; each grid step convolves one
  whole image held in VMEM (the flagship 64² shapes fit with room — the
  gate `fits_vmem` falls back to XLA elsewhere);
* prologue: ``swish(x * a + b)`` with per-(sample, channel) ``a``/``b``
  precomputed from the *upstream* tensor's moments — i.e. the GroupNorm
  normalize+activation that precedes every conv in the ResidualBlock,
  fused into the conv's input read;
* conv as im2col + MXU dot: a zero-padded VMEM scratch, three K=3·C dot
  accumulations (dy-split keeps the im2col scratch inside the 16 MiB
  VMEM budget at the 64²/C=64 worst case);
* epilogue: + bias, + per-sample bias (the temb projection), + residual
  (the block's shortcut), cast to the output dtype, and emission of
  **per-channel** moments (sum, sum-of-squares over H·W) of the written
  tensor.

Per-channel moments — not per-group — are the load-bearing choice: any
downstream GroupNorm group structure assembles its statistics from them
with a (N, C) reshape-sum, so moments stay valid through the decoder's
channel-concat skip connections (`jnp.concatenate` of moments along C)
and the GroupNorm stats pass disappears from the whole resblock chain.

Forward-only by design: the fused path serves the restoration/serving
hot loop (pnp_flow's 500 forwards/image); training and the
differentiated solvers keep the standard XLA path.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "conv3x3_gn",
    "conv3x3_gn_reference",
    "channel_moments",
    "gn_prologue",
    "concat_moments",
    "fits_vmem",
]


def _lane_pad(c: int) -> int:
    return ((c + 127) // 128) * 128


def fits_vmem(h: int, w: int, cin: int, cout: int,
              has_residual: bool, budget: int = 40 * 2 ** 20) -> bool:
    """Conservative VMEM estimate for one grid step (bf16 data, f32 acc).

    pad scratch (H+2, W+2, Cp) + im2col (H, W, 3*Cp) + acc (H*W, Cop) f32
    + double-buffered x/out(/res) blocks + weights, against the kernel's
    64 MiB scoped-VMEM limit minus temporaries headroom.
    """
    cp, cop = _lane_pad(cin), _lane_pad(cout)
    pad = (h + 2) * (w + 2) * cp * 2
    im2col = h * w * 3 * cp * 2
    acc = h * w * cop * 4
    xblk = 2 * h * w * cp * 2
    oblk = 2 * h * w * cop * 2
    rblk = (2 * h * w * cop * 2) if has_residual else 0
    wts = 9 * cp * cop * 2
    return pad + im2col + acc + xblk + oblk + rblk + wts < budget


def _kernel(x_ref, w_ref, b_ref, a_ref, pb_ref, sb_ref, res_ref,
            o_ref, mom_ref, pad_ref, im_ref,
            *, H, W, C, CO, prologue, has_sb, has_res, emit, out_dtype):
    n = pl.program_id(0)

    # zero the halo once; the body is overwritten every step
    @pl.when(n == 0)
    def _():
        pad_ref[...] = jnp.zeros(pad_ref.shape, pad_ref.dtype)

    x = x_ref[0]                                   # (H, W, C)
    cdt = x.dtype
    if prologue:
        # normalize+swish in the compute dtype (bf16 on the fast path —
        # the same precision the XLA pair uses with norm_dtype=bf16)
        xf = x * a_ref[0, 0][None, None, :].astype(cdt) \
            + pb_ref[0, 0][None, None, :].astype(cdt)
        # swish; hand-rolled sigmoid — lax.logistic trips a Mosaic
        # verification bug on bf16 vectors (f32 scalar broadcast)
        x = xf / (1.0 + jnp.exp(-xf))
    pad_ref[1:H + 1, 1:W + 1, :] = x

    acc = jnp.zeros((H * W, CO), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            im_ref[:, :, dx * C:(dx + 1) * C] = \
                pad_ref[dy:dy + H, dx:dx + W, :]
        a2 = im_ref[...].reshape(H * W, 3 * C)
        w2 = w_ref[dy]                             # (3*C, CO), pre-reshaped
        acc = acc + jnp.dot(a2, w2, preferred_element_type=jnp.float32)

    y = acc + b_ref[0][None, :].astype(jnp.float32)
    if has_sb:
        y = y + sb_ref[0, 0][None, :].astype(jnp.float32)
    if has_res:
        y = y + res_ref[0].reshape(H * W, CO).astype(jnp.float32)

    yo = y.astype(out_dtype)
    o_ref[0] = yo.reshape(H, W, CO)
    if emit:
        # moments of the tensor as WRITTEN (post-cast), accumulated in f32
        # — matches a downstream GroupNorm reading the stored activation
        yf = yo.astype(jnp.float32)
        mom_ref[0, 0, :] = jnp.sum(yf, axis=0)
        mom_ref[0, 1, :] = jnp.sum(yf * yf, axis=0)
    else:
        # the buffer is still a pallas_call output: leaving it unwritten is
        # rejected by some Mosaic versions and would hand uninitialized
        # memory to any caller that reads it
        mom_ref[...] = jnp.zeros(mom_ref.shape, mom_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("emit_moments", "out_dtype", "interpret"),
)
def _conv3x3_gn_impl(x, w, b, a, pb, sb, res, *, emit_moments, out_dtype,
                     interpret):
    N, H, W, C = x.shape
    CO = w.shape[-1]
    prologue = a is not None
    has_sb = sb is not None
    has_res = res is not None

    f32 = jnp.float32
    # per-sample vectors ride as (N, 1, C) so their (1, C) blocks satisfy
    # the Mosaic block-shape rule (last two dims must tile or equal)
    a_in = (a if prologue else jnp.zeros((N, C), f32)).reshape(N, 1, C)
    pb_in = (pb if prologue else jnp.zeros((N, C), f32)).reshape(N, 1, C)
    sb_in = (sb if has_sb else jnp.zeros((N, CO), f32)).reshape(N, 1, CO)
    res_in = res if has_res else jnp.zeros((N, 1, 1, CO), x.dtype)

    kern = functools.partial(
        _kernel, H=H, W=W, C=C, CO=CO, prologue=prologue,
        has_sb=has_sb, has_res=has_res, emit=emit_moments,
        out_dtype=out_dtype,
    )
    res_block = (1, H, W, CO) if has_res else (1, 1, 1, CO)

    out_shapes = [jax.ShapeDtypeStruct((N, H, W, CO), out_dtype),
                  jax.ShapeDtypeStruct((N, 2, CO), f32)]
    vm = pltpu.VMEM
    y, mom = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, H, W, C), lambda n: (n, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((3, 3 * C, CO), lambda n: (0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, CO), lambda n: (0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, C), lambda n: (n, 0, 0), memory_space=vm),
            pl.BlockSpec((1, 1, CO), lambda n: (n, 0, 0), memory_space=vm),
            pl.BlockSpec(res_block,
                         (lambda n: (n, 0, 0, 0)) if has_res
                         else (lambda n: (0, 0, 0, 0)),
                         memory_space=vm),
        ],
        out_specs=[
            pl.BlockSpec((1, H, W, CO), lambda n: (n, 0, 0, 0),
                         memory_space=vm),
            pl.BlockSpec((1, 2, CO), lambda n: (n, 0, 0),
                         memory_space=vm),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            vm((H + 2, W + 2, C), x.dtype),        # zero-padded image
            vm((H, W, 3 * C), x.dtype),            # dy-split im2col
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * N * H * W * 9 * C * CO,
            bytes_accessed=x.size * x.dtype.itemsize * 2,
            transcendentals=N * H * W * C if prologue else 0,
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20,
        ),
        interpret=interpret,
    )(x, w.reshape(3, 3 * C, CO), b.reshape(1, CO),
      a_in, pb_in, sb_in, res_in)
    return y, mom


def conv3x3_gn(x, w, b, *, prologue=None, sample_bias=None, residual=None,
               emit_moments: bool = True, out_dtype=None,
               interpret: bool | None = None):
    """swish(x·a + b') -> 3x3 same-conv -> +bias(+temb)(+residual), emitting
    per-channel (sum, sumsq) moments of the written output.

    x: (N, H, W, C); w: flax HWIO (3, 3, C, CO); b: (CO,)
    prologue: None or (a, b') each (N, C) f32 — the fused
      GroupNorm-normalize + swish of the input (see :func:`gn_prologue`)
    sample_bias: (N, CO) or None — the temb projection, added pre-moments
    residual: (N, H, W, CO) or None — the block shortcut, added pre-moments
    Returns ``(y, moments)``; moments is (N, 2, CO) f32 (sum, sumsq over
    H·W) or None when ``emit_moments=False``.
    """
    if interpret is None:
        if jax.default_backend() != "tpu":
            # Mosaic needs a TPU.  Non-TPU backends take the XLA mirror
            # (identical semantics) rather than silently running the
            # orders-of-magnitude-slower Pallas interpreter; tests opt into
            # the interpreter explicitly with interpret=True.
            return conv3x3_gn_reference(
                x, w, b, prologue=prologue, sample_bias=sample_bias,
                residual=residual, emit_moments=emit_moments,
                out_dtype=out_dtype,
            )
        interpret = False
    n, h, w_, c = x.shape
    co = w.shape[-1]
    # tiny input channels (the 3-ch begin conv) or over-budget shapes take
    # the XLA mirror — identical semantics, still emits moments
    if c < 8 or not fits_vmem(h, w_, c, co, residual is not None):
        y, mom = conv3x3_gn_reference(
            x, w, b, prologue=prologue, sample_bias=sample_bias,
            residual=residual, emit_moments=emit_moments,
            out_dtype=out_dtype,
        )
        return y, mom
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    a, pb = prologue if prologue is not None else (None, None)
    y, mom = _conv3x3_gn_impl(
        x, w, b, a, pb, sample_bias, residual,
        emit_moments=emit_moments, out_dtype=out_dtype,
        interpret=interpret,
    )
    return y, (mom if emit_moments else None)


# ---------------------------------------------------------------------------
# XLA reference / helpers
# ---------------------------------------------------------------------------


def conv3x3_gn_reference(x, w, b, *, prologue=None, sample_bias=None,
                         residual=None, emit_moments: bool = True,
                         out_dtype=None):
    """Pure-XLA mirror of :func:`conv3x3_gn` (tests + CPU fallback)."""
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    if prologue is not None:
        a, pb = prologue
        xf = x.astype(jnp.float32) * a[:, None, None, :] \
            + pb[:, None, None, :]
        x = (xf * jax.nn.sigmoid(xf)).astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    y = y + b.astype(jnp.float32)[None, None, None, :]
    if sample_bias is not None:
        y = y + sample_bias.astype(jnp.float32)[:, None, None, :]
    if residual is not None:
        y = y + residual.astype(jnp.float32)
    yo = y.astype(out_dtype)
    if not emit_moments:
        return yo, None
    return yo, channel_moments(yo)


def channel_moments(x):
    """Per-channel (sum, sumsq) over H·W in f32: (N, H, W, C) -> (N, 2, C).

    The seam helper: computes what the kernel epilogue emits, for tensors
    produced by plain XLA ops (attention residuals, resamples).
    """
    xf = x.astype(jnp.float32)
    return jnp.stack(
        [jnp.sum(xf, axis=(1, 2)), jnp.sum(xf * xf, axis=(1, 2))], axis=1
    )


def concat_moments(*moms):
    """Moments of a channel-concat = concat of channel moments."""
    return jnp.concatenate(moms, axis=-1)


def gn_prologue(moments, count: int, scale, bias,
                num_groups: int = 32, eps: float = 1e-6):
    """GroupNorm normalize folded to per-(sample, channel) affine (a, b').

    moments: (N, 2, C) channel (sum, sumsq) over ``count`` = H·W elements.
    Returns a, b' (N, C) f32 with  GN(x)·scale + bias == x·a + b'.
    Formula parity: biased variance E[x²]−E[x]², eps inside the rsqrt —
    flax ``nn.GroupNorm`` semantics (reference models.py GroupNorm(32,
    eps=1e-6)).
    """
    n, _, c = moments.shape
    gs = c // num_groups
    s = moments[:, 0, :].reshape(n, num_groups, gs).sum(-1)
    sq = moments[:, 1, :].reshape(n, num_groups, gs).sum(-1)
    cnt = float(count * gs)
    mean = s / cnt
    var = sq / cnt - mean * mean
    rstd = jax.lax.rsqrt(jnp.maximum(var, 0.0) + eps)
    mean_c = jnp.repeat(mean, gs, axis=-1)
    rstd_c = jnp.repeat(rstd, gs, axis=-1)
    a = rstd_c * scale.astype(jnp.float32)[None, :]
    b = bias.astype(jnp.float32)[None, :] - mean_c * a
    return a, b
