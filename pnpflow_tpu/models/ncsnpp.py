"""NCSN++ score/velocity network in Flax (NHWC) — the 'rectified' backbone.

Architecture-equivalent rebuild of the vendored RectifiedFlow NCSN++
(pnpflow/image_generation/models/ncsnpp.py:35-383, layerspp.py:30-274,
up_or_down_sampling.py) for CelebA-HQ / AFHQ-Cat 256x256: Gaussian-Fourier
log-t embedding, BigGAN residual blocks with FIR up/downsampling, NIN-based
attention at 16x16, progressive input_skip / output_skip pyramids with 'sum'
combine, skip_rescale (x+h)/sqrt(2), scale_by_sigma output division.

The FIR resampling rides the TPU-native upfirdn2d (ops/upfirdn.py) — one
``conv_general_dilated`` per resample instead of the reference's CUDA
kernel.

Parameter naming: submodules are named ``m{i}`` in the exact order the
reference appends them to ``all_modules`` (construction order == forward
consumption order, ncsnpp.py:233-378), so the torch->flax checkpoint
converter is a positional index map.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from pnpflow_tpu.models.unet import vs_init
from pnpflow_tpu.ops.upfirdn import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)


def _gn(ch: int, name: str, dtype=jnp.float32):
    # dtype must be threaded explicitly: flax promotes to the fp32 param
    # dtype otherwise, silently turning a "bf16" forward into fp32 compute
    return nn.GroupNorm(
        num_groups=min(ch // 4, 32), epsilon=1e-6, dtype=dtype, name=name
    )


def conv3x3(features: int, name: str, init_scale: float = 1.0,
            dtype=jnp.float32):
    return nn.Conv(
        features, (3, 3), padding=1, kernel_init=vs_init(init_scale),
        bias_init=nn.initializers.zeros, dtype=dtype, name=name,
    )


def conv1x1(features: int, name: str, init_scale: float = 1.0,
            dtype=jnp.float32):
    return nn.Conv(
        features, (1, 1), padding=0, kernel_init=vs_init(init_scale),
        bias_init=nn.initializers.zeros, dtype=dtype, name=name,
    )


class NIN(nn.Module):
    """1x1 einsum dense (reference layers.py:546-556)."""

    features: int
    init_scale: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W", vs_init(self.init_scale), (x.shape[-1], self.features)
        )
        b = self.param("b", nn.initializers.zeros, (self.features,))
        return x @ w.astype(self.dtype) + b.astype(self.dtype)


class GaussianFourierProjection(nn.Module):
    """sin/cos of 2*pi*scale-normal projections of log t
    (layerspp.py:32-41); W is fixed (non-trainable in the reference)."""

    embedding_size: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        proj = x[:, None] * w[None, :] * 2.0 * math.pi
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class AttnBlockpp(nn.Module):
    """NIN-based single-head attention (layerspp.py:62-91)."""

    init_scale: float = 0.0
    skip_rescale: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = _gn(c, "GroupNorm_0", self.dtype)(x)
        q = NIN(c, dtype=self.dtype, name="NIN_0")(h)
        k = NIN(c, dtype=self.dtype, name="NIN_1")(h)
        v = NIN(c, dtype=self.dtype, name="NIN_2")(h)
        q = q.reshape(b, hh * ww, c)
        k = k.reshape(b, hh * ww, c)
        v = v.reshape(b, hh * ww, c)
        w = jnp.einsum(
            "bic,bjc->bij", q, k, preferred_element_type=jnp.float32
        ) * (int(c) ** -0.5)
        w = jax.nn.softmax(w, axis=-1).astype(v.dtype)
        h = jnp.einsum(
            "bij,bjc->bic", w, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
        h = h.reshape(b, hh, ww, c)
        h = NIN(c, init_scale=self.init_scale, dtype=self.dtype,
                name="NIN_3")(h)
        out = x + h
        # math.sqrt gives a weak-typed python float: np.float64 scalars
        # promote bf16 activations to fp32 (jax promotion rules)
        return out / math.sqrt(2.0) if self.skip_rescale else out


class Upsample(nn.Module):
    """FIR / nearest upsample, optionally fused with a 3x3 conv
    (layerspp.py:94-124)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out_ch = self.out_ch or c
        if not self.fir:
            b, h, w, _ = x.shape
            y = jax.image.resize(x, (b, h * 2, w * 2, c), "nearest")
            if self.with_conv:
                y = conv3x3(out_ch, "Conv_0", dtype=self.dtype)(y)
            return y
        if not self.with_conv:
            return upsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("Conv2d_0_weight", vs_init(), (3, 3, c, out_ch))
        b = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        y = upsample_conv_2d(x, w, k=self.fir_kernel, factor=2)
        return y + b[None, None, None, :].astype(y.dtype)


class Downsample(nn.Module):
    """FIR / avg-pool downsample, optionally fused with a 3x3 conv
    (layerspp.py:127-155)."""

    out_ch: int | None = None
    with_conv: bool = False
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        out_ch = self.out_ch or c
        if not self.fir:
            if self.with_conv:
                y = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding=0,
                    kernel_init=vs_init(), dtype=self.dtype, name="Conv_0",
                )(y)
            return nn.avg_pool(x, (2, 2), (2, 2))
        if not self.with_conv:
            return downsample_2d(x, self.fir_kernel, factor=2)
        w = self.param("Conv2d_0_weight", vs_init(), (3, 3, c, out_ch))
        b = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        y = conv_downsample_2d(x, w, k=self.fir_kernel, factor=2)
        return y + b[None, None, None, :].astype(y.dtype)


class ResnetBlockBigGAN(nn.Module):
    """BigGAN residual block with in-block FIR resampling
    (layerspp.py:212-274)."""

    out_ch: int | None = None
    up: bool = False
    down: bool = False
    dropout: float = 0.0
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = nn.swish(_gn(in_ch, "GroupNorm_0", self.dtype)(x))

        if self.up:
            if self.fir:
                h = upsample_2d(h, self.fir_kernel, factor=2)
                x = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_upsample_2d(h)
                x = naive_upsample_2d(x)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, self.fir_kernel, factor=2)
                x = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_downsample_2d(h)
                x = naive_downsample_2d(x)

        h = conv3x3(out_ch, "Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="Dense_0",
            )(nn.swish(temb))[:, None, None, :]
        h = nn.swish(_gn(out_ch, "GroupNorm_1", self.dtype)(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(out_ch, "Conv_1", init_scale=self.init_scale,
                    dtype=self.dtype)(h)
        if in_ch != out_ch or self.up or self.down:
            x = conv1x1(out_ch, "Conv_2", dtype=self.dtype)(x)
        out = x + h
        # math.sqrt gives a weak-typed python float: np.float64 scalars
        # promote bf16 activations to fp32 (jax promotion rules)
        return out / math.sqrt(2.0) if self.skip_rescale else out


class ResnetBlockDDPM(nn.Module):
    """DDPM residual block, ``resblock_type='ddpm'`` (layerspp.py:166-209).

    No in-block resampling: level transitions under this block type use
    standalone ``Upsample``/``Downsample`` modules (reference
    ncsnpp.py:158-159, 218-219).  Channel-changing shortcut is a NIN (the
    reference NCSNpp never passes ``conv_shortcut=True``, ncsnpp.py:115-121).
    """

    out_ch: int | None = None
    conv_shortcut: bool = False
    dropout: float = 0.0
    skip_rescale: bool = True
    init_scale: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, deterministic: bool = True):
        in_ch = x.shape[-1]
        out_ch = self.out_ch or in_ch
        h = nn.swish(_gn(in_ch, "GroupNorm_0", self.dtype)(x))
        h = conv3x3(out_ch, "Conv_0", dtype=self.dtype)(h)
        if temb is not None:
            h = h + nn.Dense(
                out_ch, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name="Dense_0",
            )(nn.swish(temb))[:, None, None, :]
        h = nn.swish(_gn(out_ch, "GroupNorm_1", self.dtype)(h))
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = conv3x3(out_ch, "Conv_1", init_scale=self.init_scale,
                    dtype=self.dtype)(h)
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, "Conv_2", dtype=self.dtype)(x)
            else:
                x = NIN(out_ch, dtype=self.dtype, name="NIN_0")(x)
        out = x + h
        # math.sqrt gives a weak-typed python float: np.float64 scalars
        # promote bf16 activations to fp32 (jax promotion rules)
        return out / math.sqrt(2.0) if self.skip_rescale else out


class Combine(nn.Module):
    """Progressive-input combiner (layerspp.py:44-58)."""

    out_ch: int
    method: str = "sum"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        h = conv1x1(self.out_ch, "Conv_0", dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        return h + y


class NCSNpp(nn.Module):
    """NCSN++ (reference ncsnpp.py:35-383), biggan/fourier/output_skip
    configuration surface."""

    image_size: int = 256
    num_channels: int = 3
    nf: int = 128
    ch_mult: Sequence[int] = (1, 1, 2, 2, 2, 2, 2)
    num_res_blocks: int = 2
    attn_resolutions: Sequence[int] = (16,)
    dropout: float = 0.0
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Sequence[int] = (1, 3, 3, 1)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    embedding_type: str = "fourier"
    fourier_scale: float = 16.0
    init_scale: float = 0.0
    scale_by_sigma: bool = True
    # SMLD noise table for the positional-embedding branch (reference
    # ncsnpp.py:42,246 + models/utils.py:52-60) and the [0,1]-data
    # rescale flag (ncsnpp.py:259-261)
    sigma_min: float = 0.01
    sigma_max: float = 50.0
    num_scales: int = 1000
    centered: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, time_cond, deterministic: bool = True):
        nf = self.nf
        num_resolutions = len(self.ch_mult)
        all_res = [self.image_size // (2**i) for i in range(num_resolutions)]
        fk = self.fir_kernel
        counter = [0]

        def next_name():
            name = "m{}".format(counter[0])
            counter[0] += 1
            return name

        ddpm_blocks = self.resblock_type == "ddpm"

        def res_block(h, temb, out_ch=None, up=False, down=False):
            if ddpm_blocks:
                # level transitions are standalone resample modules under
                # 'ddpm' (reference ncsnpp.py:158-159, 218-219)
                assert not (up or down)
                return ResnetBlockDDPM(
                    out_ch=out_ch, dropout=self.dropout,
                    skip_rescale=self.skip_rescale,
                    init_scale=self.init_scale, dtype=self.dtype,
                    name=next_name(),
                )(h, temb, deterministic)
            return ResnetBlockBigGAN(
                out_ch=out_ch, up=up, down=down, dropout=self.dropout,
                fir=self.fir, fir_kernel=fk, skip_rescale=self.skip_rescale,
                init_scale=self.init_scale, dtype=self.dtype,
                name=next_name(),
            )(h, temb, deterministic)

        def attn_block(h):
            return AttnBlockpp(
                init_scale=self.init_scale, skip_rescale=self.skip_rescale,
                dtype=self.dtype, name=next_name(),
            )(h)

        x = x.astype(self.dtype)

        # --- t embedding
        if self.embedding_type == "fourier":
            used_sigmas = time_cond
            temb = GaussianFourierProjection(
                embedding_size=nf, scale=self.fourier_scale, name=next_name()
            )(jnp.log(time_cond))
        else:
            from pnpflow_tpu.models.unet import sinusoidal_embedding

            # geometric noise table indexed by the integer time label
            # (reference ncsnpp.py:246, models/utils.py:59-60); host
            # numpy so the constant folds at trace time
            sigmas = jnp.asarray(
                np.exp(
                    np.linspace(
                        np.log(self.sigma_max), np.log(self.sigma_min),
                        self.num_scales,
                    )
                ),
                dtype=jnp.float32,
            )
            used_sigmas = sigmas[time_cond.astype(jnp.int32)]
            temb = sinusoidal_embedding(time_cond, nf)

        if self.conditional:
            temb = nn.Dense(
                nf * 4, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name=next_name(),
            )(temb)
            temb = nn.Dense(
                nf * 4, kernel_init=vs_init(),
                bias_init=nn.initializers.zeros, dtype=self.dtype,
                name=next_name(),
            )(nn.swish(temb))
        else:
            temb = None

        if not self.centered:
            # input data rides [0, 1] -> [-1, 1] (reference ncsnpp.py:259-261)
            x = 2.0 * x - 1.0

        # --- down path
        input_pyramid = x if self.progressive_input != "none" else None
        hs = [conv3x3(nf, next_name(), dtype=self.dtype)(x)]
        for i_level in range(num_resolutions):
            for i_block in range(self.num_res_blocks):
                h = res_block(hs[-1], temb, out_ch=nf * self.ch_mult[i_level])
                if all_res[i_level] in self.attn_resolutions:
                    h = attn_block(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                if ddpm_blocks:
                    h = Downsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=fk, dtype=self.dtype, name=next_name(),
                    )(hs[-1])
                else:
                    h = res_block(hs[-1], temb, down=True)
                if self.progressive_input == "input_skip":
                    input_pyramid = downsample_2d(input_pyramid, fk, factor=2)
                    h = Combine(
                        out_ch=h.shape[-1], method=self.progressive_combine,
                        dtype=self.dtype, name=next_name(),
                    )(input_pyramid, h)
                hs.append(h)

        # --- middle
        h = hs[-1]
        h = res_block(h, temb)
        h = attn_block(h)
        h = res_block(h, temb)

        # --- up path with output_skip pyramid
        pyramid = None
        for i_level in reversed(range(num_resolutions)):
            for i_block in range(self.num_res_blocks + 1):
                h = res_block(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb,
                    out_ch=nf * self.ch_mult[i_level],
                )
            if all_res[i_level] in self.attn_resolutions:
                h = attn_block(h)

            if self.progressive != "none":
                if i_level == num_resolutions - 1:
                    if self.progressive == "output_skip":
                        p = nn.swish(
                            _gn(h.shape[-1], next_name(), self.dtype)(h)
                        )
                        pyramid = conv3x3(
                            self.num_channels, next_name(),
                            init_scale=self.init_scale, dtype=self.dtype,
                        )(p)
                else:
                    if self.progressive == "output_skip":
                        pyramid = upsample_2d(pyramid, fk, factor=2)
                        p = nn.swish(
                            _gn(h.shape[-1], next_name(), self.dtype)(h)
                        )
                        p = conv3x3(
                            self.num_channels, next_name(),
                            init_scale=self.init_scale, dtype=self.dtype,
                        )(p)
                        pyramid = pyramid + p

            if i_level != 0:
                if ddpm_blocks:
                    h = Upsample(
                        with_conv=self.resamp_with_conv, fir=self.fir,
                        fir_kernel=fk, dtype=self.dtype, name=next_name(),
                    )(h)
                else:
                    h = res_block(h, temb, up=True)

        assert not hs

        if self.progressive == "output_skip":
            h = pyramid
        else:
            h = nn.swish(_gn(h.shape[-1], next_name(), self.dtype)(h))
            h = conv3x3(
                self.num_channels, next_name(), init_scale=self.init_scale,
                dtype=self.dtype,
            )(h)

        if self.scale_by_sigma:
            h = h / used_sigmas[:, None, None, None].astype(h.dtype)
        return h.astype(jnp.float32)


def make_ncsnpp(args, dtype=jnp.float32) -> NCSNpp:
    """The live rectified-flow configuration (CelebA-HQ / AFHQ-Cat 256²,
    configs/rectified_flow/celeba_hq_pytorch_rf_gaussian.py:44-67)."""
    return NCSNpp(
        image_size=args.dim_image,
        num_channels=args.num_channels,
        dtype=dtype,
    )


def make_ncsnpp_from_config(config, dtype=jnp.float32) -> NCSNpp:
    """Build NCSN++ from a reference-shaped config tree (model.* keys of
    the shipped RF configs, e.g. config/rf_configs.py).  Both resblock
    types are supported: 'biggan' (every shipped RF config) and 'ddpm'
    (reference layerspp.py:166-209 + ncsnpp.py:115-121)."""
    m, d = config.model, config.data
    return NCSNpp(
        image_size=d.image_size,
        num_channels=d.num_channels,
        nf=m.nf,
        ch_mult=tuple(m.ch_mult),
        num_res_blocks=m.num_res_blocks,
        attn_resolutions=tuple(m.attn_resolutions),
        dropout=m.dropout,
        resamp_with_conv=m.resamp_with_conv,
        conditional=m.conditional,
        fir=m.fir,
        fir_kernel=tuple(m.fir_kernel),
        skip_rescale=m.skip_rescale,
        resblock_type=getattr(m, "resblock_type", "biggan"),
        progressive=m.progressive,
        progressive_input=m.progressive_input,
        progressive_combine=m.progressive_combine,
        embedding_type=getattr(m, "embedding_type", "fourier"),
        fourier_scale=m.fourier_scale,
        init_scale=m.init_scale,
        scale_by_sigma=m.scale_by_sigma,
        sigma_min=getattr(m, "sigma_min", 0.01),
        sigma_max=getattr(m, "sigma_max", 50.0),
        num_scales=getattr(m, "num_scales", 1000),
        centered=getattr(d, "centered", True),
        dtype=dtype,
    )
