"""Velocity U-Net in Flax (NHWC, TPU-first).

Architecture-equivalent to the reference DDPM-style U-Net
(pnpflow/models.py:302-495, provenance sdeflow-light): Swish activations,
GroupNorm(32, eps 1e-6), sinusoidal t-embedding -> 2-layer MLP, residual
blocks with t-embedding projection, single-head self-attention at configured
resolutions, skip-concat up path, variance-scaling fan_avg uniform init with
near-zero-init final convs (models.py:165-250).

TPU-first design choices (deliberate deviations from the torch layout):
  * NHWC everywhere — the natural TPU conv layout; the checkpoint converter
    (utils/torch_convert.py) transposes the published NCHW weights once.
  * A ``dtype`` knob selects the compute precision (bf16 for the fast path);
    parameters and normalization statistics stay fp32.
  * Attention is an einsum over (B, HW, C) tokens (<=256 tokens); XLA maps it
    straight onto the MXU — no need for sequence sharding.

Used as the prior for models 'ot', 'indep' and 'gradient_step'
(reference utils.py:170-180: ch=32, ch_mult=(1,2,4,8), num_res_blocks=6,
attn_resolutions=(16,8), resamp_with_conv=True).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

# variance_scaling fan_avg uniform — equals the reference's kaiming_uniform
# fan_avg with gain=scale (models.py:180-216).
def vs_init(scale: float = 1.0):
    return nn.initializers.variance_scaling(
        max(scale, 1e-10), "fan_avg", "uniform"
    )


def sinusoidal_embedding(t: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal time embedding (reference models.py:253-279):
    freqs exp(-log(10000) * i / (dim/2 - 1)), concat(sin, cos)."""
    half = dim // 2
    freqs = jnp.exp(
        jnp.arange(half, dtype=jnp.float32) * (-math.log(10000.0) / (half - 1))
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """sinusoidal(ch) -> Dense(4ch) -> swish -> Dense(4ch)
    (reference models.py:282-299)."""

    embedding_dim: int
    hidden_dim: int
    output_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t):
        temb = sinusoidal_embedding(t, self.embedding_dim)
        temb = nn.Dense(
            self.hidden_dim, kernel_init=vs_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="dense_0",
        )(temb)
        temb = nn.swish(temb)
        temb = nn.Dense(
            self.output_dim, kernel_init=vs_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="dense_1",
        )(temb)
        return temb


def group_norm(name: str, dtype=None):
    """GroupNorm(32, eps 1e-6).  ``dtype=None`` keeps fp32 statistics (the
    parity-safe default); pass bf16 to stay in the low-precision dataflow on
    the fast path."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=dtype, name=name)


class FusedGroupNorm(nn.Module):
    """GroupNorm(32, eps 1e-6) [+ swish] through a one-pass Pallas kernel
    (ops/pallas_kernels.py).

    Parameter names/shapes are identical to ``nn.GroupNorm`` (scale, bias),
    so checkpoints convert either way.  The profiled motivation: XLA's
    unfused GroupNorm (stats pass + normalize pass over HBM) is ~49% of the
    restoration loop's device time (BASELINE.md trace); the kernel reads
    each activation once and writes once, with fp32 statistics.

    ``impl``: "cmin" = the default-layout kernel (C on lanes); "bm" = the
    batch-minor kernel (N on lanes), matching the layout XLA actually picks
    for the conv activations at large batch, so no transposes materialize.
    """

    use_swish: bool = True
    impl: str = "cmin"

    @nn.compact
    def __call__(self, x):
        from pnpflow_tpu.ops.pallas_kernels import (
            groupnorm_swish,
            groupnorm_swish_bm,
        )

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        fn = groupnorm_swish_bm if self.impl == "bm" else groupnorm_swish
        return fn(x, scale, bias, 32, 1e-6, self.use_swish)


def _fused_impl(fused) -> str:
    return fused if isinstance(fused, str) else "cmin"


class DotStatsGroupNorm(nn.Module):
    """GroupNorm(32, eps 1e-6) [+ swish] with MXU-matmul statistics.

    XLA's GroupNorm reduction streams the batch-minor conv activations at
    ~15% of HBM bandwidth (BASELINE.md trace).  Here the two moment sums
    are contractions against a ones vector — dots the MXU can stream —
    instead of reduce ops; everything stays inside one XLA program (no
    custom-call boundary, unlike the Pallas attempts).  fp32 accumulation
    via preferred_element_type.  Param names/shapes match nn.GroupNorm.
    """

    use_swish: bool = True
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        cg = c // self.groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        hw = hh * ww
        xr = x.reshape(b, hw, c)
        ones = jnp.ones((hw,), x.dtype)
        s1 = jnp.einsum("nhc,h->nc", xr, ones,
                        preferred_element_type=jnp.float32)
        s2 = jnp.einsum("nhc,h->nc", xr * xr, ones,
                        preferred_element_type=jnp.float32)
        inv_n = 1.0 / (hw * cg)
        gsum = lambda s: jnp.repeat(
            jnp.sum(s.reshape(b, self.groups, cg), axis=2), cg, axis=1
        )
        mean = gsum(s1) * inv_n                       # (b, c)
        meansq = gsum(s2) * inv_n
        inv = jax.lax.rsqrt(meansq - mean * mean + self.eps)
        y = (x.astype(jnp.float32) - mean[:, None, None, :]) \
            * inv[:, None, None, :]
        y = y * scale + bias
        if self.use_swish:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)


class TViewStatsGroupNorm(nn.Module):
    """GroupNorm(32, eps 1e-6) [+ swish] with the moment reduce taken over a
    pre-transposed ``(b, g, hw*cg)`` view of the activations.

    The device trace shows XLA holding the 64² conv activations batch-minor
    (``{0,3,2,1}``: N on lanes) and streaming the GN convert+reduce at only
    ~15% of HBM bandwidth (BASELINE.md).  Hypothesis under test: handing XLA
    a view whose single reduction axis is the minor *logical* axis lets it
    either fuse the relayout into the producing conv's epilogue or pick a
    reduce-friendly layout.  Statistics accumulate in fp32 (one-pass
    E[x²]−E[x]², matching flax); the normalize pass reads the original
    (untransposed) tensor, so only the stats input is re-viewed.  Param
    names/shapes match ``nn.GroupNorm`` so checkpoints convert either way.
    """

    use_swish: bool = True
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        g = self.groups
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        hw = hh * ww
        xt = jnp.transpose(x.reshape(b, hw, g, cg), (0, 2, 1, 3))
        xt = xt.reshape(b, g, hw * cg)
        s1 = jnp.sum(xt, axis=2, dtype=jnp.float32)        # (b, g)
        s2 = jnp.sum(xt * xt, axis=2, dtype=jnp.float32)
        inv_n = 1.0 / (hw * cg)
        mean = s1 * inv_n
        var = s2 * inv_n - mean * mean
        inv = jax.lax.rsqrt(var + self.eps)
        mean_c = jnp.repeat(mean, cg, axis=1)[:, None, None, :]
        inv_c = jnp.repeat(inv, cg, axis=1)[:, None, None, :]
        y = (x.astype(jnp.float32) - mean_c) * inv_c
        y = y * scale + bias
        if self.use_swish:
            y = y * jax.nn.sigmoid(y)
        return y.astype(x.dtype)


class LowPrecStatsGroupNorm(nn.Module):
    """GroupNorm(32, eps 1e-6) [+ swish] with statistics accumulated
    ENTIRELY in the input dtype — no f32 convert feeding the reduce.

    flax's ``nn.GroupNorm`` always upcasts to fp32 for the moment
    computation, which shows up in the device trace as the
    ``convert_reduce_fusion`` dominating 49% of the 64² step (BASELINE.md).
    This variant keeps the reduction in bf16 (two-pass mean / centered
    variance for bf16-safe numerics — the one-pass E[x²]−E[x]² form
    catastrophically cancels at 8 mantissa bits).  Param names/shapes match
    ``nn.GroupNorm`` so checkpoints convert either way.
    """

    use_swish: bool = True
    groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        g = self.groups
        cg = c // g
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        xg = x.reshape(b, hh * ww, g, cg)
        mean = jnp.mean(xg, axis=(1, 3), keepdims=True, dtype=x.dtype)
        d = xg - mean
        var = jnp.mean(d * d, axis=(1, 3), keepdims=True, dtype=x.dtype)
        inv = jax.lax.rsqrt(var.astype(jnp.float32) + self.eps).astype(
            x.dtype
        )
        y = (d * inv).reshape(b, hh, ww, c)
        y = y * scale.astype(x.dtype) + bias.astype(x.dtype)
        if self.use_swish:
            y = y * jax.nn.sigmoid(y)
        return y


def norm_swish(x, name: str, norm_dtype=None, fused=False):
    """swish(GroupNorm(x)) — XLA reference pair, Pallas kernels, MXU-dot
    statistics, or all-bf16 statistics, per ``fused``."""
    if fused == "dot":
        return DotStatsGroupNorm(use_swish=True, name=name)(x)
    if fused == "bf16stats":
        return LowPrecStatsGroupNorm(use_swish=True, name=name)(x)
    if fused == "tview":
        return TViewStatsGroupNorm(use_swish=True, name=name)(x)
    if fused:
        return FusedGroupNorm(use_swish=True, impl=_fused_impl(fused),
                              name=name)(x)
    return nn.swish(group_norm(name, norm_dtype)(x))


class _ConvParams(nn.Module):
    """Parameter holder with ``nn.Conv``'s exact tree ({kernel, bias}, HWIO,
    same initializers) for the fused-conv path: the Pallas kernel consumes
    raw weights, but checkpoints must load interchangeably with the
    standard path."""

    in_features: int
    features: int
    ksize: tuple = (3, 3)
    kernel_scale: float = 1.0

    @nn.compact
    def __call__(self):
        kh, kw = self.ksize
        k = self.param(
            "kernel", vs_init(self.kernel_scale),
            (kh, kw, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _GNParams(nn.Module):
    """``nn.GroupNorm``-shaped {scale, bias} holder (fused path)."""

    features: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return s, b


class _DenseParams(nn.Module):
    """``nn.Dense``-shaped {kernel, bias} holder (fused path)."""

    in_features: int
    features: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", vs_init(), (self.in_features, self.features)
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class ResidualBlock(nn.Module):
    """norm-swish-conv + temb add + norm-swish-(dropout)-conv0 + shortcut
    (reference models.py:58-113)."""

    out_ch: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype | None = None
    fused_norm: bool | str = False

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True, x_moments=None):
        if self.fused_norm == "conv":
            return self._fused(x, temb, deterministic, x_moments)
        in_ch = x.shape[-1]
        h = norm_swish(x, "norm1", self.norm_dtype, self.fused_norm)
        h = nn.Conv(
            self.out_ch, (3, 3), padding=1, kernel_init=vs_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="conv1",
        )(h)
        h = h + nn.Dense(
            self.out_ch, kernel_init=vs_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="temb_proj",
        )(nn.swish(temb))[:, None, None, :]
        h = norm_swish(h, "norm2", self.norm_dtype, self.fused_norm)
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Conv(
            self.out_ch, (3, 3), padding=1, kernel_init=vs_init(0.0),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="conv2",
        )(h)
        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), padding=0, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="shortcut",
            )(x)
        return x + h

    def _fused(self, x, temb, deterministic, x_moments):
        """Whole block as two fused conv kernels (ops/fused_conv_gn.py):
        each GroupNorm's normalize+swish rides its conv's prologue using
        the moments the *previous* kernel's epilogue emitted — no separate
        statistics pass touches HBM.  Forward/inference only."""
        from pnpflow_tpu.ops.fused_conv_gn import (
            channel_moments, conv3x3_gn, gn_prologue)

        assert deterministic or self.dropout == 0.0, (
            "fused_norm='conv' is a forward-only inference path"
        )
        in_ch = x.shape[-1]
        hw = x.shape[1] * x.shape[2]
        if x_moments is None:
            x_moments = channel_moments(x)

        s1 = _GNParams(in_ch, name="norm1")()
        k1, b1 = _ConvParams(in_ch, self.out_ch, name="conv1")()
        tk, tb = _DenseParams(
            temb.shape[-1], self.out_ch, name="temb_proj")()
        s2 = _GNParams(self.out_ch, name="norm2")()
        k2, b2 = _ConvParams(
            self.out_ch, self.out_ch, kernel_scale=0.0, name="conv2")()

        dt = self.dtype
        tv = nn.swish(temb) @ tk.astype(dt) + tb.astype(dt)  # (N, out_ch)
        a1, c1 = gn_prologue(x_moments, hw, *s1)
        h, mh = conv3x3_gn(
            x, k1.astype(dt), b1, prologue=(a1, c1), sample_bias=tv,
        )
        a2, c2 = gn_prologue(mh, hw, *s2)
        if in_ch != self.out_ch:
            ks, bs = _ConvParams(
                in_ch, self.out_ch, ksize=(1, 1), name="shortcut")()
            xres = jnp.einsum(
                "nhwc,co->nhwo", x, ks[0, 0].astype(dt)) + bs.astype(dt)
        else:
            xres = x
        out, mo = conv3x3_gn(
            h, k2.astype(dt), b2, prologue=(a2, c2), residual=xres,
        )
        return out, mo


class SelfAttention(nn.Module):
    """Single-head self-attention over the (H*W, C) token grid
    (reference models.py:116-162): q/k/v 1x1 convs, softmax(q k^T / sqrt(C)),
    zero-init output projection, residual add."""

    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype | None = None
    fused_norm: bool | str = False

    @nn.compact
    def __call__(self, x, temb=None):
        b, hh, ww, c = x.shape
        if self.fused_norm == "dot":
            h = DotStatsGroupNorm(use_swish=False, name="norm")(x)
        elif self.fused_norm == "bf16stats":
            h = LowPrecStatsGroupNorm(use_swish=False, name="norm")(x)
        elif self.fused_norm == "tview":
            h = TViewStatsGroupNorm(use_swish=False, name="norm")(x)
        elif self.fused_norm:
            h = FusedGroupNorm(use_swish=False,
                               impl=_fused_impl(self.fused_norm),
                               name="norm")(x)
        else:
            h = group_norm("norm", self.norm_dtype)(x)

        def conv1x1(name, scale=1.0):
            return nn.Conv(
                c, (1, 1), padding=0, kernel_init=vs_init(scale),
                bias_init=nn.initializers.zeros, dtype=self.dtype, name=name,
            )

        q = conv1x1("attn_q")(h).reshape(b, hh * ww, c)
        k = conv1x1("attn_k")(h).reshape(b, hh * ww, c)
        v = conv1x1("attn_v")(h).reshape(b, hh * ww, c)

        attn = jnp.einsum(
            "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
        ) * (int(c) ** -0.5)
        attn = jax.nn.softmax(attn, axis=-1).astype(v.dtype)
        h = jnp.einsum(
            "bij,bjc->bic", attn, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        h = h.reshape(b, hh, ww, c)
        h = conv1x1("proj_out", scale=0.0)(h)
        return x + h


class Downsample(nn.Module):
    """3x3 stride-2 conv (with_conv=True path, reference models.py:50-55);
    torch padding=1 == jax padding ((1,1),(1,1))."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            x.shape[-1], (3, 3), strides=(2, 2), padding=1,
            kernel_init=vs_init(), bias_init=nn.initializers.zeros,
            dtype=self.dtype, name="conv",
        )(x)


class Upsample(nn.Module):
    """nearest 2x upsample + 3x3 conv (reference models.py:41-47)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(
            c, (3, 3), padding=1, kernel_init=vs_init(),
            bias_init=nn.initializers.zeros, dtype=self.dtype, name="conv",
        )(x)


class VelocityUNet(nn.Module):
    """Flow-matching velocity field v(x, t) (reference models.py:302-495)."""

    input_channels: int = 3
    input_height: int = 128
    ch: int = 32
    output_channels: int | None = None
    ch_mult: Sequence[int] = (1, 2, 4, 8)
    num_res_blocks: int = 6
    attn_resolutions: Sequence[int] = (16, 8)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    dtype: jnp.dtype = jnp.float32
    norm_dtype: jnp.dtype | None = None
    fused_norm: bool | str = False

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        assert x.ndim == 4 and x.shape[-1] == self.input_channels, (
            "expected NHWC input, got {}".format(x.shape)
        )
        out_ch = self.output_channels or self.input_channels
        num_resolutions = len(self.ch_mult)
        temb_ch = self.ch * 4
        fc = self.fused_norm == "conv"
        if fc:
            from pnpflow_tpu.ops.fused_conv_gn import (
                channel_moments, concat_moments, conv3x3_gn, gn_prologue)

        x = x.astype(self.dtype)
        temb = TimestepEmbedding(
            embedding_dim=self.ch, hidden_dim=temb_ch, output_dim=temb_ch,
            dtype=self.dtype, name="temb_net",
        )(t)

        # Down path.  In fused-conv mode every activation travels with the
        # per-channel moments its producing kernel emitted, so no GroupNorm
        # ever re-reads a tensor from HBM for statistics; `ms` mirrors `hs`.
        if fc:
            kb, bb = _ConvParams(
                self.input_channels, self.ch, name="begin_conv")()
            h0, m0 = conv3x3_gn(x, kb.astype(self.dtype), bb)
            hs, ms = [h0], [m0]
        else:
            hs = [
                nn.Conv(
                    self.ch, (3, 3), padding=1, kernel_init=vs_init(),
                    bias_init=nn.initializers.zeros, dtype=self.dtype,
                    name="begin_conv",
                )(x)
            ]
            ms = [None]
        in_ht = self.input_height
        for i_level in range(num_resolutions):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks):
                h = ResidualBlock(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    norm_dtype=self.norm_dtype, fused_norm=self.fused_norm,
                    name=f"down_{i_level}_block_{i_block}",
                )(hs[-1], temb, deterministic, x_moments=ms[-1])
                m = None
                if fc:
                    h, m = h
                if h.shape[1] in self.attn_resolutions:
                    h = SelfAttention(
                        dtype=self.dtype, norm_dtype=self.norm_dtype,
                        fused_norm=False if fc else self.fused_norm,
                        name=f"down_{i_level}_attn_{i_block}",
                    )(h)
                    if fc:
                        m = channel_moments(h)
                hs.append(h)
                ms.append(m)
            if i_level != num_resolutions - 1:
                d = Downsample(
                    dtype=self.dtype, name=f"down_{i_level}_downsample"
                )(hs[-1])
                hs.append(d)
                ms.append(channel_moments(d) if fc else None)
                in_ht //= 2

        # Middle
        h, m = hs[-1], ms[-1]
        h = ResidualBlock(
            h.shape[-1], dropout=self.dropout, dtype=self.dtype,
            norm_dtype=self.norm_dtype, fused_norm=self.fused_norm,
            name="mid_block_0",
        )(h, temb, deterministic, x_moments=m)
        if fc:
            h, m = h
        h = SelfAttention(
            dtype=self.dtype, norm_dtype=self.norm_dtype,
            fused_norm=False if fc else self.fused_norm, name="mid_attn",
        )(h)
        if fc:
            m = channel_moments(h)
        h = ResidualBlock(
            h.shape[-1], dropout=self.dropout, dtype=self.dtype,
            norm_dtype=self.norm_dtype, fused_norm=self.fused_norm,
            name="mid_block_1",
        )(h, temb, deterministic, x_moments=m)
        if fc:
            h, m = h

        # Up path
        for i_level in reversed(range(num_resolutions)):
            block_out = self.ch * self.ch_mult[i_level]
            for i_block in range(self.num_res_blocks + 1):
                skip = hs.pop()
                skip_m = ms.pop()
                hin = jnp.concatenate([h, skip], axis=-1)
                min_ = concat_moments(m, skip_m) if fc else None
                h = ResidualBlock(
                    block_out, dropout=self.dropout, dtype=self.dtype,
                    norm_dtype=self.norm_dtype, fused_norm=self.fused_norm,
                    name=f"up_{i_level}_block_{i_block}",
                )(hin, temb, deterministic, x_moments=min_)
                if fc:
                    h, m = h
                if h.shape[1] in self.attn_resolutions:
                    h = SelfAttention(
                        dtype=self.dtype, norm_dtype=self.norm_dtype,
                        fused_norm=False if fc else self.fused_norm,
                        name=f"up_{i_level}_attn_{i_block}",
                    )(h)
                    if fc:
                        m = channel_moments(h)
            if i_level != 0:
                h = Upsample(dtype=self.dtype, name=f"up_{i_level}_upsample")(h)
                if fc:
                    m = channel_moments(h)
        assert not hs

        # End
        if fc:
            se, be = _GNParams(h.shape[-1], name="end_norm")()
            a, c = gn_prologue(m, h.shape[1] * h.shape[2], se, be)
            hf = h.astype(jnp.float32) * a[:, None, None, :] \
                + c[:, None, None, :]
            h = (hf * jax.nn.sigmoid(hf)).astype(self.dtype)
            ke, bee = _ConvParams(
                h.shape[-1], out_ch, kernel_scale=0.0, name="end_conv")()
            h = jax.lax.conv_general_dilated(
                h, ke.astype(self.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + bee.astype(self.dtype)
        else:
            h = norm_swish(h, "end_norm", self.norm_dtype, self.fused_norm)
            h = nn.Conv(
                out_ch, (3, 3), padding=1, kernel_init=vs_init(0.0),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="end_conv",
            )(h)
        return h.astype(jnp.float32)


def make_velocity_unet(args, dtype=jnp.float32) -> VelocityUNet:
    """The configuration used for all 'ot' / 'indep' / 'gradient_step' models
    (reference utils.py:170-180)."""
    return VelocityUNet(
        input_channels=args.num_channels,
        input_height=args.dim_image,
        ch=32,
        ch_mult=(1, 2, 4, 8),
        num_res_blocks=6,
        attn_resolutions=(16, 8),
        dtype=dtype,
    )
