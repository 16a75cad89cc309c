"""DDPM score/noise network (NHWC Flax).

Re-designed from the reference's torch DDPM
(/root/reference/pnpflow/image_generation/models/ddpm.py:39-181; block zoo
layers.py:515-662): sinusoidal conditioning, ResnetBlockDDPM (NIN
shortcut), NIN-based attention, nearest-up / strided-down resampling with
the DDPM 'SAME'-emulating pad, near-zero-init final conv, and the
NCSN-style ``scale_by_sigma`` output division.

A registry alternative in the reference (`ddpm` — no shipped PnP-Flow
config selects it); provided for model-zoo completeness, TPU-first: NHWC,
einsum attention on the MXU, fp32 params with a ``dtype`` compute knob.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pnpflow_tpu.models.ncsn_layers import get_act
from pnpflow_tpu.models.ncsnpp import NIN
from pnpflow_tpu.models.unet import sinusoidal_embedding, vs_init


def _gn32(name: str):
    """GroupNorm(32, eps 1e-6) — DDPM's norm (reference layers.py:625)."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6, name=name)


def _conv3(features, init_scale=1.0, stride=1, padding=1, name=None,
           dtype=jnp.float32):
    """ddpm_conv3x3: fan_avg-uniform init, zero bias (layers.py:118-124)."""
    return nn.Conv(
        features, (3, 3), strides=(stride, stride), padding=padding,
        kernel_init=vs_init(init_scale), bias_init=nn.initializers.zeros,
        dtype=dtype, name=name,
    )


class ResnetBlockDDPM(nn.Module):
    """GN-act-conv + temb bias + GN-act-dropout-conv0, NIN/conv shortcut
    (reference layers.py:619-662)."""

    act: Callable
    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = self.act(_gn32("GroupNorm_0")(x))
        h = _conv3(out_ch, dtype=self.dtype, name="Conv_0")(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="Dense_0",
            )(self.act(temb))[:, None, None, :]
        h = self.act(_gn32("GroupNorm_1")(h))
        if self.dropout > 0.0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = _conv3(out_ch, init_scale=0.0, dtype=self.dtype, name="Conv_1")(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = _conv3(out_ch, dtype=self.dtype, name="Conv_2")(x)
            else:
                x = NIN(out_ch, name="NIN_0")(x)
        return x + h


class AttnBlockDDPM(nn.Module):
    """NIN attention with plain GroupNorm(32) (reference layers.py:558-581;
    differs from NCSN++'s AttnBlockpp only in group count and no
    skip-rescale)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn32("GroupNorm_0")(x)
        q = NIN(c, name="NIN_0")(h).reshape(b, hh * ww, c)
        k = NIN(c, name="NIN_1")(h).reshape(b, hh * ww, c)
        v = NIN(c, name="NIN_2")(h).reshape(b, hh * ww, c)
        w = jnp.einsum(
            "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
        ) * (int(c) ** -0.5)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        h = jnp.einsum(
            "bij,bjc->bic", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype).reshape(b, hh, ww, c)
        return x + NIN(c, init_scale=0.0, name="NIN_3")(h)


class UpsampleDDPM(nn.Module):
    """Nearest 2x, optional conv (reference layers.py:584-596)."""

    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        if self.with_conv:
            h = _conv3(x.shape[-1], dtype=self.dtype, name="Conv_0")(h)
        return h


class DownsampleDDPM(nn.Module):
    """Stride-2 conv with (0,1)x(0,1) pad ('SAME' emulation,
    reference layers.py:599-616) or 2x2 avg pool."""

    with_conv: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            h = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return _conv3(x.shape[-1], stride=2, padding=0,
                          dtype=self.dtype, name="Conv_0")(h)
        s = jax.lax.reduce_window(
            x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
        )
        return s / 4.0


class DDPM(nn.Module):
    """The DDPM U-Net (reference ddpm.py:39-181).

    ``__call__(x, labels)``: ``labels`` are integer timesteps / noise-scale
    indices; with ``scale_by_sigma`` the output is divided by
    ``sigmas[labels]`` (NCSN loss convention, ddpm.py:174-179).
    """

    nf: int = 128
    ch_mult: Sequence[int] = (1, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.1
    resamp_with_conv: bool = True
    conditional: bool = True
    image_size: int = 32
    channels: int = 3
    centered: bool = True
    scale_by_sigma: bool = False
    nonlinearity: str = "swish"
    sigmas: Sequence[float] = (50.0, 0.01)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, labels, deterministic: bool = True):
        act = get_act(self.nonlinearity)
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_res = [self.image_size // (2 ** i)
                   for i in range(num_resolutions)]

        if self.conditional:
            temb = sinusoidal_embedding(labels.astype(jnp.float32), nf)
            temb = nn.Dense(nf * 4, kernel_init=vs_init(),
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name="Dense_0")(temb)
            temb = nn.Dense(nf * 4, kernel_init=vs_init(),
                            bias_init=nn.initializers.zeros,
                            dtype=self.dtype, name="Dense_1")(act(temb))
        else:
            temb = None

        h = x if self.centered else 2.0 * x - 1.0

        block = lambda out_ch, name: ResnetBlockDDPM(
            act=act, out_ch=out_ch, dropout=self.dropout, dtype=self.dtype,
            name=name,
        )

        hs = [_conv3(nf, dtype=self.dtype, name="conv_in")(h)]
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                h = block(nf * self.ch_mult[i_level],
                          f"down_{i_level}_block_{i_block}")(
                    hs[-1], temb, deterministic
                )
                if all_res[i_level] in self.attn_resolutions:
                    h = AttnBlockDDPM(
                        dtype=self.dtype,
                        name=f"down_{i_level}_attn_{i_block}",
                    )(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                hs.append(DownsampleDDPM(
                    self.resamp_with_conv, dtype=self.dtype,
                    name=f"down_{i_level}_downsample",
                )(hs[-1]))

        h = hs[-1]
        h = block(None, "mid_block_0")(h, temb, deterministic)
        h = AttnBlockDDPM(dtype=self.dtype, name="mid_attn")(h)
        h = block(None, "mid_block_1")(h, temb, deterministic)

        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = block(nf * self.ch_mult[i_level],
                          f"up_{i_level}_block_{i_block}")(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    deterministic,
                )
            if all_res[i_level] in self.attn_resolutions:
                h = AttnBlockDDPM(dtype=self.dtype,
                                  name=f"up_{i_level}_attn")(h)
            if i_level != 0:
                h = UpsampleDDPM(self.resamp_with_conv, dtype=self.dtype,
                                 name=f"up_{i_level}_upsample")(h)
        assert not hs

        h = act(_gn32("norm_out")(h))
        h = _conv3(self.channels, init_scale=0.0, dtype=self.dtype,
                   name="conv_out")(h)

        if self.scale_by_sigma:
            sig = jnp.asarray(np.asarray(self.sigmas, np.float32))
            h = h / sig[labels][:, None, None, None]
        return h
