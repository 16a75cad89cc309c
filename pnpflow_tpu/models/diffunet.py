"""Guided-diffusion UNet ("DiffUNet") in Flax (NHWC) — the pnp_diff prior.

The reference delegates pnp_diff to ``deepinv.models.DiffUNet()``
(pnpflow/methods/pnp_diff.py:60-62), the OpenAI guided-diffusion 256x256
unconditional UNet (the DiffPIR ``diffusion_ffhq_10m`` checkpoint family).
We cannot depend on deepinv, so this is a native architecture-equivalent
rebuild with that checkpoint's configuration:

  model_channels 128, channel_mult (1, 1, 2, 2, 4, 4), 1 res block/level,
  attention at 16x16/8x8 ds (num_head_channels 64), scale-shift GroupNorm
  conditioning, resblock up/down sampling, out_channels 6 (learned sigma —
  the epsilon prediction is the first 3 channels).

A converted torch checkpoint loads from
``{output_root}/model/diffusion_unet.npz``; otherwise callers fall back to
random init with a warning (zero-egress environment).
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10000.0):
    """OpenAI guided-diffusion sinusoidal embedding: cat(cos, sin) with
    freqs exp(-ln(P) * i / half)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


def _gn32(name: str):
    return nn.GroupNorm(num_groups=32, epsilon=1e-5, name=name)


def _conv(features, name, kernel=(3, 3), zero=False, padding=1):
    init = nn.initializers.zeros if zero else nn.initializers.lecun_normal()
    return nn.Conv(
        features, kernel, padding=padding, kernel_init=init,
        bias_init=nn.initializers.zeros, name=name,
    )


class ResBlock(nn.Module):
    """Guided-diffusion ResBlock with scale-shift-norm conditioning and
    optional in-block up/down sampling."""

    out_ch: int
    up: bool = False
    down: bool = False
    use_scale_shift_norm: bool = True
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True):
        in_ch = x.shape[-1]

        def resample(z):
            b, h, w, c = z.shape
            if self.up:
                return jax.image.resize(z, (b, h * 2, w * 2, c), "nearest")
            if self.down:
                return nn.avg_pool(z, (2, 2), (2, 2))
            return z

        h = nn.silu(_gn32("in_norm")(x))
        h = resample(h)
        x = resample(x)
        h = _conv(self.out_ch, "in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
            name="emb_dense",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = _gn32("out_norm")(h) * (
                1.0 + scale[:, None, None, :]
            ) + shift[:, None, None, :]
            h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = nn.silu(_gn32("out_norm")(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv(self.out_ch, "out_conv", zero=True)(h)

        if in_ch != self.out_ch:
            x = nn.Conv(
                self.out_ch, (1, 1), padding=0, name="skip_conv"
            )(x)
        return x + h


class AttentionBlock(nn.Module):
    """Multi-head attention over the spatial grid (guided-diffusion)."""

    num_head_channels: int = 64

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        heads = max(c // self.num_head_channels, 1)
        hd = c // heads
        h = _gn32("norm")(x).reshape(b, hh * ww, c)
        qkv = nn.Dense(3 * c, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split_heads(z):
            return z.reshape(b, hh * ww, heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        w = jnp.einsum(
            "bhic,bhjc->bhij", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(hd)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        o = jnp.einsum(
            "bhij,bhjc->bhic", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, hh * ww, c)
        o = nn.Dense(c, kernel_init=nn.initializers.zeros, name="proj")(o)
        return x + o.reshape(b, hh, ww, c)


class DiffUNet(nn.Module):
    """OpenAI guided-diffusion UNet (ffhq_10m / DiffPIR configuration)."""

    in_channels: int = 3
    out_channels: int = 6
    model_channels: int = 128
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    num_res_blocks: int = 1
    attention_ds: Sequence[int] = (16, 8)  # downsample ratios with attention
    num_head_channels: int = 64
    dropout: float = 0.0
    resblock_updown: bool = True

    @nn.compact
    def __call__(self, x, t, deterministic: bool = True):
        mc = self.model_channels
        emb = nn.Dense(4 * mc, name="time_dense_0")(
            timestep_embedding(t, mc)
        )
        emb = nn.Dense(4 * mc, name="time_dense_1")(nn.silu(emb))

        ds = 1
        hs = [_conv(mc, "in_conv")(x)]
        ch = mc
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = ResBlock(
                    out_ch=mc * mult, dropout=self.dropout,
                    name=f"down_{level}_res_{i}",
                )(hs[-1], emb, deterministic)
                ch = mc * mult
                if ds in self.attention_ds:
                    h = AttentionBlock(
                        num_head_channels=self.num_head_channels,
                        name=f"down_{level}_attn_{i}",
                    )(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = ResBlock(
                    out_ch=ch, down=True, dropout=self.dropout,
                    name=f"down_{level}_downsample",
                )(hs[-1], emb, deterministic)
                hs.append(h)
                ds *= 2

        h = ResBlock(out_ch=ch, dropout=self.dropout, name="mid_res_0")(
            hs[-1], emb, deterministic
        )
        h = AttentionBlock(
            num_head_channels=self.num_head_channels, name="mid_attn"
        )(h)
        h = ResBlock(out_ch=ch, dropout=self.dropout, name="mid_res_1")(
            h, emb, deterministic
        )

        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = ResBlock(
                    out_ch=mc * mult, dropout=self.dropout,
                    name=f"up_{level}_res_{i}",
                )(jnp.concatenate([h, hs.pop()], axis=-1), emb, deterministic)
                if ds in self.attention_ds:
                    h = AttentionBlock(
                        num_head_channels=self.num_head_channels,
                        name=f"up_{level}_attn_{i}",
                    )(h)
            if level != 0:
                h = ResBlock(
                    out_ch=mc * mult, up=True, dropout=self.dropout,
                    name=f"up_{level}_upsample",
                )(h, emb, deterministic)
                ds //= 2
        assert not hs

        h = nn.silu(_gn32("out_norm")(h))
        return _conv(self.out_channels, "out_conv", zero=True)(h)


def make_diffunet(args, dtype=jnp.float32) -> DiffUNet:
    del dtype  # diffusion prior runs fp32 by default
    return DiffUNet(in_channels=args.num_channels)
