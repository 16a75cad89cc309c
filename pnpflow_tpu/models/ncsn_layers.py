"""RefineNet-style layer zoo for NCSNv1/v2 score models (NHWC Flax).

Re-designed from the reference's torch port of the ermongroup/ncsn(v2)
codebase (/root/reference/pnpflow/image_generation/models/layers.py:133-507):
CRP / RCU / MSF blocks, RefineBlock, the (Conditional)ResidualBlock with
down-sampling and dilation, and the pool/conv resampling helpers.

TPU-first choices:
  * NHWC; pooling via ``lax.reduce_window`` (maps to the VPU);
  * the MSF bilinear ``align_corners=True`` resize is expressed as two
    static 1-D interpolation matrices contracted on the MXU
    (``interpolate_bilinear_ac``) — ``jax.image.resize`` implements the
    half-pixel convention, which does NOT match torch
    ``F.interpolate(..., align_corners=True)`` (layers.py:248);
  * dilated 3x3 convs use ``padding=dilation``.  DELIBERATE FIX: the
    reference passes its default padding=1 with dilation 2/4
    (layers.py:464-467), which shrinks spatial dims and crashes the
    residual add — NCSNv2's dilated branch is unrunnable as shipped
    (verified on torch).  padding=dilation is the upstream ermongroup
    behavior and keeps shapes.
  * SECOND reference crash (also verified): ``ncsn_conv3x3(bias=False)``
    dies at construction (`conv.bias.data` on None, layers.py:113-114), so
    every CRP/RCU/RefineBlock — and hence all NCSNv2 models — cannot even
    be built upstream.  Forward-math parity against the reference blocks
    is still tested by patching only that constructor bug
    (tests/test_zoo_reference_parity.py).
"""

from __future__ import annotations

import functools
from typing import Callable, Sequence

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn


def get_act(name: str) -> Callable:
    """Activation factory keyed on config.model.nonlinearity
    (reference layers.py:29-41)."""
    name = name.lower()
    if name == "elu":
        return nn.elu
    if name == "relu":
        return nn.relu
    if name == "lrelu":
        return functools.partial(nn.leaky_relu, negative_slope=0.2)
    if name == "swish":
        return nn.swish
    raise NotImplementedError("activation function does not exist!")


class _NCSNConv(nn.Module):
    """3x3/1x1 conv with the exact torch-default init, scaled by
    ``init_scale`` (reference layers.py:44-51,108-115): both kernel AND
    bias draw from U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — nn.Conv's
    ``bias_init`` hook cannot see fan_in, hence the custom module (param
    names/shapes identical to nn.Conv).  padding=dilation keeps 'same'
    spatial dims under dilation (see module docstring)."""

    features: int
    kernel: int = 3
    stride: int = 1
    bias: bool = True
    dilation: int = 1
    init_scale: float = 1.0

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        scale = 1e-10 if self.init_scale == 0 else self.init_scale
        fan_in = in_ch * self.kernel * self.kernel
        bound = 1.0 / np.sqrt(fan_in)

        def uinit(key, shape, dtype=jnp.float32):
            return scale * jax.random.uniform(key, shape, dtype,
                                              -bound, bound)

        kern = self.param(
            "kernel", uinit,
            (self.kernel, self.kernel, in_ch, self.features),
        )
        pad = self.dilation if self.kernel == 3 else 0
        out = jax.lax.conv_general_dilated(
            x, kern, (self.stride, self.stride),
            [(pad, pad), (pad, pad)],
            rhs_dilation=(self.dilation, self.dilation),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.bias:
            out = out + self.param("bias", uinit, (self.features,))
        return out


def ncsn_conv(features, kernel=3, stride=1, bias=True, dilation=1,
              init_scale=1.0, name=None):
    return _NCSNConv(features, kernel, stride, bias, dilation, init_scale,
                     name=name)


def max_pool_5x5(x):
    """5x5 stride-1 max pool, pad 2 (reference layers.py:141)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )


def avg_pool_5x5(x):
    """5x5 stride-1 average pool, pad 2, count_include_pad (torch default,
    reference layers.py:143,168)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 5, 5, 1), (1, 1, 1, 1),
        [(0, 0), (2, 2), (2, 2), (0, 0)],
    )
    return s / 25.0


def avg_pool_2x2(x):
    """2x2 stride-2 mean pool (reference layers.py:367-368)."""
    s = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )
    return s / 4.0


def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """1-D linear interpolation matrix with align_corners=True semantics."""
    m = np.zeros((n_out, n_in), np.float32)
    if n_out == 1 or n_in == 1:
        m[:, 0] = 1.0
        return m
    scale = (n_in - 1) / (n_out - 1)
    for i in range(n_out):
        src = i * scale
        lo = int(np.floor(src))
        hi = min(lo + 1, n_in - 1)
        w = src - lo
        m[i, lo] += 1.0 - w
        m[i, hi] += w
    return m


def interpolate_bilinear_ac(x, out_hw):
    """NHWC bilinear resize, align_corners=True (torch F.interpolate
    parity, reference layers.py:248) as two MXU matmuls."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x
    mh = jnp.asarray(_interp_matrix(h, oh))
    mw = jnp.asarray(_interp_matrix(w, ow))
    y = jnp.einsum("Oh,bhwc->bOwc", mh, x)
    return jnp.einsum("Ow,bhwc->bhOc", mw, y)


class CRPBlock(nn.Module):
    """Chained residual pooling (reference layers.py:133-154)."""

    features: int
    n_stages: int = 2
    act: Callable = nn.relu
    maxpool: bool = True

    @nn.compact
    def __call__(self, x):
        x = self.act(x)
        pool = max_pool_5x5 if self.maxpool else avg_pool_5x5
        path = x
        for i in range(self.n_stages):
            path = pool(path)
            path = ncsn_conv(self.features, bias=False,
                             name=f"conv_{i}")(path)
            x = path + x
        return x


class CondCRPBlock(nn.Module):
    """Conditional CRP: per-stage conditional norm, avg pool
    (reference layers.py:157-180)."""

    features: int
    n_stages: int
    norm: Callable  # factory: () -> Module taking (x, y)
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, y):
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            path = self.norm(name=f"norm_{i}")(path, y)
            path = avg_pool_5x5(path)
            path = ncsn_conv(self.features, bias=False,
                             name=f"conv_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv units (reference layers.py:183-204)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False,
                              name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class CondRCUBlock(nn.Module):
    """Conditional RCU (reference layers.py:207-231)."""

    features: int
    n_blocks: int
    n_stages: int
    norm: Callable
    act: Callable = nn.relu

    @nn.compact
    def __call__(self, x, y):
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                x = self.norm(name=f"norm_{i}_{j}")(x, y)
                x = self.act(x)
                x = ncsn_conv(self.features, bias=False,
                              name=f"conv_{i}_{j}")(x)
            x = x + residual
        return x


class MSFBlock(nn.Module):
    """Multi-scale fusion: per-input conv + align-corners bilinear resize,
    summed (reference layers.py:234-250)."""

    features: int

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape):
        out = None
        for i, x in enumerate(xs):
            h = ncsn_conv(self.features, bias=True, name=f"conv_{i}")(x)
            h = interpolate_bilinear_ac(h, shape)
            out = h if out is None else out + h
        return out


class CondMSFBlock(nn.Module):
    """Conditional MSF (reference layers.py:253-274)."""

    features: int
    norm: Callable

    @nn.compact
    def __call__(self, xs, y, shape):
        out = None
        for i, x in enumerate(xs):
            h = self.norm(name=f"norm_{i}")(x, y)
            h = ncsn_conv(self.features, bias=True, name=f"conv_{i}")(h)
            h = interpolate_bilinear_ac(h, shape)
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block: per-path RCU adapters -> MSF fuse -> CRP -> output
    RCU (reference layers.py:277-310)."""

    features: int
    act: Callable = nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape):
        hs = [
            RCUBlock(x.shape[-1], 2, 2, self.act, name=f"adapt_{i}")(x)
            for i, x in enumerate(xs)
        ]
        if len(xs) > 1:
            h = MSFBlock(self.features, name="msf")(hs, output_shape)
        else:
            h = hs[0]
        h = CRPBlock(self.features, 2, self.act, self.maxpool,
                     name="crp")(h)
        return RCUBlock(self.features, 3 if self.end else 1, 2, self.act,
                        name="output")(h)


class CondRefineBlock(nn.Module):
    """Conditional RefineNet block (reference layers.py:313-348)."""

    features: int
    norm: Callable
    act: Callable = nn.relu
    start: bool = False
    end: bool = False

    @nn.compact
    def __call__(self, xs, y, output_shape):
        hs = [
            CondRCUBlock(x.shape[-1], 2, 2, self.norm, self.act,
                         name=f"adapt_{i}")(x, y)
            for i, x in enumerate(xs)
        ]
        if len(xs) > 1:
            h = CondMSFBlock(self.features, self.norm, name="msf")(
                hs, y, output_shape
            )
        else:
            h = hs[0]
        h = CondCRPBlock(self.features, 2, self.norm, self.act,
                         name="crp")(h, y)
        return CondRCUBlock(self.features, 3 if self.end else 1, 2,
                            self.norm, self.act, name="output")(h, y)


class ConvMeanPool(nn.Module):
    """conv (k//2 'same') then 2x2 mean pool; optional (1,0,1,0) pre-pad
    (reference layers.py:351-369)."""

    features: int
    kernel: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x):
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
        h = ncsn_conv(self.features, self.kernel, bias=self.biases,
                      name="conv")(x)
        return avg_pool_2x2(h)


class MeanPoolConv(nn.Module):
    """2x2 mean pool then conv (reference layers.py:372-381)."""

    features: int
    kernel: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        return ncsn_conv(self.features, self.kernel, bias=self.biases,
                         name="conv")(avg_pool_2x2(x))


class UpsampleConv(nn.Module):
    """cat-4 + PixelShuffle(2) upsample then conv (layers.py:384-394).

    NOT nearest upsampling for C > 1: PixelShuffle reads output channel c's
    2x2 quadrant (i, j) from cat channel 4c+2i+j, and the cat of four
    copies makes that x[(4c+2i+j) mod C] — a deterministic channel shuffle
    (verified against the torch original).  Reproduced faithfully."""

    features: int
    kernel: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        quads = []
        for i in range(2):
            row = []
            for j in range(2):
                idx = (4 * np.arange(c) + 2 * i + j) % c
                row.append(x[..., idx])
            quads.append(jnp.stack(row, axis=3))     # (b, h, w, 2, c)
        up = jnp.stack(quads, axis=2)                # (b, h, 2, w, 2, c)
        up = up.reshape(b, 2 * h, 2 * w, c)
        return ncsn_conv(self.features, self.kernel, bias=self.biases,
                         name="conv")(up)


class ResidualBlock(nn.Module):
    """NCSNv2 pre-activation residual block with optional down-sampling and
    dilation (reference layers.py:453-507; see module docstring for the
    dilation-padding fix)."""

    features: int
    resample: str | None = None  # None | 'down'
    act: Callable = nn.elu
    norm: Callable = None  # factory: (name=) -> Module taking (x)
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        norm = self.norm

        h = norm(name="norm1")(x)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv(in_ch, dilation=self.dilation,
                              name="conv1")(h)
                h = norm(name="norm2")(h)
                h = self.act(h)
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv2")(h)
                shortcut = ncsn_conv(self.features, dilation=self.dilation,
                                     name="shortcut")(x)
            else:
                h = ncsn_conv(in_ch, name="conv1")(h)
                h = norm(name="norm2")(h)
                h = self.act(h)
                h = ConvMeanPool(self.features, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.features, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            if self.dilation > 1:
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv1")(h)
                h = norm(name="norm2")(h)
                h = self.act(h)
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv2")(h)
                if self.features != in_ch:
                    shortcut = ncsn_conv(self.features,
                                         dilation=self.dilation,
                                         name="shortcut")(x)
                else:
                    shortcut = x
            else:
                h = ncsn_conv(self.features, name="conv1")(h)
                h = norm(name="norm2")(h)
                h = self.act(h)
                h = ncsn_conv(self.features, name="conv2")(h)
                if self.features != in_ch:
                    shortcut = ncsn_conv(self.features, 1,
                                         name="shortcut")(x)
                else:
                    shortcut = x
        else:
            raise ValueError("invalid resample value")
        return shortcut + h


class ConditionalResidualBlock(nn.Module):
    """Class-conditional variant (reference layers.py:397-450)."""

    features: int
    resample: str | None = None
    act: Callable = nn.elu
    norm: Callable = None  # factory -> Module taking (x, y)
    adjust_padding: bool = False
    dilation: int = 1

    @nn.compact
    def __call__(self, x, y):
        in_ch = x.shape[-1]
        norm = self.norm

        h = norm(name="norm1")(x, y)
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv(in_ch, dilation=self.dilation,
                              name="conv1")(h)
                h = norm(name="norm2")(h, y)
                h = self.act(h)
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv2")(h)
                shortcut = ncsn_conv(self.features, dilation=self.dilation,
                                     name="shortcut")(x)
            else:
                h = ncsn_conv(in_ch, name="conv1")(h)
                h = norm(name="norm2")(h, y)
                h = self.act(h)
                h = ConvMeanPool(self.features, 3,
                                 adjust_padding=self.adjust_padding,
                                 name="conv2")(h)
                shortcut = ConvMeanPool(self.features, 1,
                                        adjust_padding=self.adjust_padding,
                                        name="shortcut")(x)
        elif self.resample is None:
            if self.dilation > 1:
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv1")(h)
                h = norm(name="norm2")(h, y)
                h = self.act(h)
                h = ncsn_conv(self.features, dilation=self.dilation,
                              name="conv2")(h)
                if self.features != in_ch:
                    shortcut = ncsn_conv(self.features,
                                         dilation=self.dilation,
                                         name="shortcut")(x)
                else:
                    shortcut = x
            else:
                h = ncsn_conv(self.features, name="conv1")(h)
                h = norm(name="norm2")(h, y)
                h = self.act(h)
                h = ncsn_conv(self.features, name="conv2")(h)
                if self.features != in_ch:
                    # reference uses a full Conv2d (3x3 default via
                    # nn.Conv2d ctor) here; 1x1 matches ncsn_conv1x1
                    shortcut = ncsn_conv(self.features, 1,
                                         name="shortcut")(x)
                else:
                    shortcut = x
        else:
            raise ValueError("invalid resample value")
        return shortcut + h
