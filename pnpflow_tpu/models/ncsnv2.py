"""NCSNv1/v2 score networks (NHWC Flax).

Re-designed from the reference's torch models
(/root/reference/pnpflow/image_generation/models/ncsnv2.py:43-415): the
64px NCSNv2, the class-conditional NCSN, and the 128px/256px variants —
RefineNet decoders over a dilated residual encoder, InstanceNorm++
normalization, noise-scale-indexed output scaling.

These are registry alternatives in the reference (`ncsnv2_64`, `ncsn`,
`ncsnv2_128`, `ncsnv2_256` — no shipped PnP-Flow config selects them);
they are provided for model-zoo completeness, built TPU-first (NHWC, MXU
bilinear fusion, reduce_window pooling) on pnpflow_tpu.models.ncsn_layers.

Note: the reference's dilated blocks crash as shipped (padding bug,
layers.py:464-467, verified); this port fixes padding=dilation, so the
64px/128px/256px dilated paths actually run here.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

from pnpflow_tpu.models import ncsn_layers as L
from pnpflow_tpu.models.normalization import get_normalization


def get_sigmas(sigma_max: float, sigma_min: float, num_scales: int):
    """Geometric noise ladder as float32 module constants (delegates to
    the single implementation in models/zoo.py)."""
    from pnpflow_tpu.models.zoo import geometric_sigmas

    return geometric_sigmas(sigma_max, sigma_min, num_scales).astype(
        np.float32
    )


class NCSNv2(nn.Module):
    """64px NCSNv2 (reference ncsnv2.py:43-132)."""

    nf: int = 128
    channels: int = 3
    image_size: int = 64
    centered: bool = False
    normalization: str = "InstanceNorm++"
    nonlinearity: str = "elu"
    sigmas: Sequence[float] = (50.0, 1.0)  # pass get_sigmas(...) for real use

    @nn.compact
    def __call__(self, x, y):
        act = L.get_act(self.nonlinearity)
        norm = get_normalization(self.normalization)
        nf = self.nf
        h = x if self.centered else 2.0 * x - 1.0

        out = L.ncsn_conv(nf, name="begin_conv")(h)

        def res_pair(h, feats, resample=None, dilation=1,
                     adjust_padding=False, tag=""):
            h = L.ResidualBlock(
                feats, resample=resample, act=act, norm=norm,
                dilation=dilation, adjust_padding=adjust_padding,
                name=f"res{tag}_0",
            )(h)
            return L.ResidualBlock(
                feats, resample=None, act=act, norm=norm,
                dilation=dilation, name=f"res{tag}_1",
            )(h)

        layer1 = res_pair(out, nf, tag="1")
        layer2 = res_pair(layer1, 2 * nf, resample="down", tag="2")
        layer3 = res_pair(layer2, 2 * nf, resample="down", dilation=2,
                          tag="3")
        layer4 = res_pair(layer3, 2 * nf, resample="down", dilation=4,
                          adjust_padding=(self.image_size == 28), tag="4")

        ref1 = L.RefineBlock(2 * nf, act, start=True, name="refine1")(
            [layer4], layer4.shape[1:3]
        )
        ref2 = L.RefineBlock(2 * nf, act, name="refine2")(
            [layer3, ref1], layer3.shape[1:3]
        )
        ref3 = L.RefineBlock(nf, act, name="refine3")(
            [layer2, ref2], layer2.shape[1:3]
        )
        out = L.RefineBlock(nf, act, end=True, name="refine4")(
            [layer1, ref3], layer1.shape[1:3]
        )

        out = norm(name="normalizer")(out)
        out = act(out)
        out = L.ncsn_conv(self.channels, name="end_conv")(out)

        sig = jnp.asarray(np.asarray(self.sigmas, np.float32))
        return out / sig[y][:, None, None, None]


class NCSN(nn.Module):
    """Class-conditional NCSNv1 (reference ncsnv2.py:135-218)."""

    nf: int = 128
    channels: int = 3
    image_size: int = 32
    num_scales: int = 10
    centered: bool = False
    normalization: str = "InstanceNorm++"
    nonlinearity: str = "elu"

    @nn.compact
    def __call__(self, x, y):
        act = L.get_act(self.nonlinearity)
        norm = get_normalization(
            self.normalization, conditional=True, num_classes=self.num_scales
        )
        nf = self.nf
        h = x if self.centered else 2.0 * x - 1.0

        out = L.ncsn_conv(nf, name="begin_conv")(h)

        def res_pair(h, feats, resample=None, dilation=1,
                     adjust_padding=False, tag=""):
            h = L.ConditionalResidualBlock(
                feats, resample=resample, act=act, norm=norm,
                dilation=dilation, adjust_padding=adjust_padding,
                name=f"res{tag}_0",
            )(h, y)
            return L.ConditionalResidualBlock(
                feats, resample=None, act=act, norm=norm,
                dilation=dilation, name=f"res{tag}_1",
            )(h, y)

        layer1 = res_pair(out, nf, tag="1")
        layer2 = res_pair(layer1, 2 * nf, resample="down", tag="2")
        layer3 = res_pair(layer2, 2 * nf, resample="down", dilation=2,
                          tag="3")
        layer4 = res_pair(layer3, 2 * nf, resample="down", dilation=4,
                          adjust_padding=(self.image_size == 28), tag="4")

        ref1 = L.CondRefineBlock(2 * nf, norm, act, start=True,
                                 name="refine1")([layer4], y,
                                                 layer4.shape[1:3])
        ref2 = L.CondRefineBlock(2 * nf, norm, act, name="refine2")(
            [layer3, ref1], y, layer3.shape[1:3]
        )
        ref3 = L.CondRefineBlock(nf, norm, act, name="refine3")(
            [layer2, ref2], y, layer2.shape[1:3]
        )
        out = L.CondRefineBlock(nf, norm, act, end=True, name="refine4")(
            [layer1, ref3], y, layer1.shape[1:3]
        )

        out = norm(name="normalizer")(out, y)
        out = act(out)
        return L.ncsn_conv(self.channels, name="end_conv")(out)


class NCSNv2_128(nn.Module):
    """128px NCSNv2 (reference ncsnv2.py:221-312)."""

    nf: int = 128
    channels: int = 3
    centered: bool = False
    normalization: str = "InstanceNorm++"
    nonlinearity: str = "elu"
    sigmas: Sequence[float] = (190.0, 0.01)

    @nn.compact
    def __call__(self, x, y):
        act = L.get_act(self.nonlinearity)
        norm = get_normalization(self.normalization)
        nf = self.nf
        h = x if self.centered else 2.0 * x - 1.0

        out = L.ncsn_conv(nf, name="begin_conv")(h)

        def res_pair(h, feats, resample=None, dilation=1, tag=""):
            h = L.ResidualBlock(feats, resample=resample, act=act,
                                norm=norm, dilation=dilation,
                                name=f"res{tag}_0")(h)
            return L.ResidualBlock(feats, resample=None, act=act,
                                   norm=norm, dilation=dilation,
                                   name=f"res{tag}_1")(h)

        layer1 = res_pair(out, nf, tag="1")
        layer2 = res_pair(layer1, 2 * nf, resample="down", tag="2")
        layer3 = res_pair(layer2, 2 * nf, resample="down", tag="3")
        layer4 = res_pair(layer3, 4 * nf, resample="down", dilation=2,
                          tag="4")
        layer5 = res_pair(layer4, 4 * nf, resample="down", dilation=4,
                          tag="5")

        ref1 = L.RefineBlock(4 * nf, act, start=True, name="refine1")(
            [layer5], layer5.shape[1:3]
        )
        ref2 = L.RefineBlock(2 * nf, act, name="refine2")(
            [layer4, ref1], layer4.shape[1:3]
        )
        ref3 = L.RefineBlock(2 * nf, act, name="refine3")(
            [layer3, ref2], layer3.shape[1:3]
        )
        ref4 = L.RefineBlock(nf, act, name="refine4")(
            [layer2, ref3], layer2.shape[1:3]
        )
        out = L.RefineBlock(nf, act, end=True, name="refine5")(
            [layer1, ref4], layer1.shape[1:3]
        )

        out = norm(name="normalizer")(out)
        out = act(out)
        out = L.ncsn_conv(self.channels, name="end_conv")(out)
        sig = jnp.asarray(np.asarray(self.sigmas, np.float32))
        return out / sig[y][:, None, None, None]


class NCSNv2_256(nn.Module):
    """256px NCSNv2 (reference ncsnv2.py:315-415)."""

    nf: int = 128
    channels: int = 3
    centered: bool = False
    normalization: str = "InstanceNorm++"
    nonlinearity: str = "elu"
    sigmas: Sequence[float] = (348.0, 0.01)

    @nn.compact
    def __call__(self, x, y):
        act = L.get_act(self.nonlinearity)
        norm = get_normalization(self.normalization)
        nf = self.nf
        h = x if self.centered else 2.0 * x - 1.0

        out = L.ncsn_conv(nf, name="begin_conv")(h)

        def res_pair(h, feats, resample=None, dilation=1, tag=""):
            h = L.ResidualBlock(feats, resample=resample, act=act,
                                norm=norm, dilation=dilation,
                                name=f"res{tag}_0")(h)
            return L.ResidualBlock(feats, resample=None, act=act,
                                   norm=norm, dilation=dilation,
                                   name=f"res{tag}_1")(h)

        layer1 = res_pair(out, nf, tag="1")
        layer2 = res_pair(layer1, 2 * nf, resample="down", tag="2")
        layer3 = res_pair(layer2, 2 * nf, resample="down", tag="3")
        layer31 = res_pair(layer3, 2 * nf, resample="down", tag="31")
        layer4 = res_pair(layer31, 4 * nf, resample="down", dilation=2,
                          tag="4")
        layer5 = res_pair(layer4, 4 * nf, resample="down", dilation=4,
                          tag="5")

        ref1 = L.RefineBlock(4 * nf, act, start=True, name="refine1")(
            [layer5], layer5.shape[1:3]
        )
        ref2 = L.RefineBlock(2 * nf, act, name="refine2")(
            [layer4, ref1], layer4.shape[1:3]
        )
        ref31 = L.RefineBlock(2 * nf, act, name="refine31")(
            [layer31, ref2], layer31.shape[1:3]
        )
        ref3 = L.RefineBlock(2 * nf, act, name="refine3")(
            [layer3, ref31], layer3.shape[1:3]
        )
        ref4 = L.RefineBlock(nf, act, name="refine4")(
            [layer2, ref3], layer2.shape[1:3]
        )
        out = L.RefineBlock(nf, act, end=True, name="refine5")(
            [layer1, ref4], layer1.shape[1:3]
        )

        out = norm(name="normalizer")(out)
        out = act(out)
        out = L.ncsn_conv(self.channels, name="end_conv")(out)
        sig = jnp.asarray(np.asarray(self.sigmas, np.float32))
        return out / sig[y][:, None, None, None]


def get_network(image_size: int):
    """Size-keyed class selection (reference ncsnv2.py:31-40)."""
    if image_size < 96:
        return NCSNv2
    if 96 <= image_size <= 128:
        return NCSNv2_128
    if 128 < image_size <= 256:
        return NCSNv2_256
    raise NotImplementedError(
        "No network suitable for {}px implemented yet.".format(image_size)
    )
