"""Normalization zoo for the score-model families (NHWC Flax).

Re-designed from the reference's torch zoo
(/root/reference/pnpflow/image_generation/models/normalization.py:22-215):
InstanceNorm / InstanceNorm++ / VarianceNorm / GroupNorm and their
class-conditional variants, plus the ``get_normalization`` factory keyed on
``config.model.normalization``.

TPU notes: all statistics are plain reductions over the (H, W) minor axes
of NHWC tensors — XLA fuses them with the surrounding elementwise work, so
no custom kernels are warranted here (these families are registry
alternatives, not the hot path).  Conditional variants take integer class
labels and read per-class affine parameters from an embedding table
(reference normalization.py:43-107), which lowers to a gather.

Parity notes (verified against torch semantics):
  * torch ``InstanceNorm2d(affine=False)`` uses eps 1e-5 and biased
    variance — mirrored here.
  * ``InstanceNorm2dPlus`` standardizes the per-channel means across the
    channel axis with an *unbiased* variance (torch.var default,
    normalization.py:171-174) — mirrored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def instance_norm(x, eps: float = 1e-5):
    """torch InstanceNorm2d(affine=False): per-(sample, channel) over HW."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class InstanceNorm2d(nn.Module):
    """Parameter-free instance norm (torch affine=False default)."""

    @nn.compact
    def __call__(self, x):
        return instance_norm(x)


class VarianceNorm2d(nn.Module):
    """x / sqrt(var_hw + 1e-5), scaled by a per-channel alpha ~ N(1, 0.02)
    (reference normalization.py:110-123)."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param(
            "alpha",
            lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,),
        )
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        return alpha * x * jax.lax.rsqrt(v + 1e-5)


class NoneNorm2d(nn.Module):
    """Identity (reference normalization.py:149-154)."""

    @nn.compact
    def __call__(self, x):
        return x


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (reference normalization.py:157-183).

    IN(x) plus a re-injected, channel-standardized copy of the per-channel
    means (restores the mean information plain IN erases), then a
    per-channel affine.
    """

    bias: bool = True

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        init_n102 = lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s)
        alpha = self.param("alpha", init_n102, (c,))
        gamma = self.param("gamma", init_n102, (c,))
        means = jnp.mean(x, axis=(1, 2))                    # (B, C)
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)  # unbiased
        means = (means - m) * jax.lax.rsqrt(v + 1e-5)
        h = instance_norm(x) + means[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta
        return out


class _ClassEmbed(nn.Module):
    """Per-class parameter table; rows gathered by integer label."""

    num_classes: int
    width: int
    init: str = "uniform"  # 'uniform' U[0,1] or 'normal' N(1, 0.02)

    @nn.compact
    def __call__(self, y):
        if self.init == "normal":
            init = lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s)
        elif self.init == "zeros":
            init = nn.initializers.zeros
        elif self.init == "uniform_zeros":
            # reference bias=True tables: scale half U[0,1], bias half 0
            # (normalization.py:75-77,132-134)
            def init(k, s):
                half = s[1] // 2
                table = jnp.zeros(s)
                return table.at[:, :half].set(
                    jax.random.uniform(k, (s[0], half))
                )
        else:
            init = lambda k, s: jax.random.uniform(k, s)
        table = self.param("embed", init, (self.num_classes, self.width))
        return table[y]


class ConditionalInstanceNorm2dPlus(nn.Module):
    """Class-conditional InstanceNorm++ (reference normalization.py:186-215):
    gamma/alpha ~ N(1, 0.02) and beta = 0 read per class label."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True, ddof=1)
        means = (means - m) * jax.lax.rsqrt(v + 1e-5)
        h = instance_norm(x)

        if self.bias:
            ga = _ClassEmbed(self.num_classes, 2 * c, "normal",
                             name="embed_ga")(y)
            beta = _ClassEmbed(self.num_classes, c, "zeros",
                               name="embed_beta")(y)
            gamma, alpha = ga[:, :c], ga[:, c:]
            h = h + means[:, None, None, :] * alpha[:, None, None, :]
            return (gamma[:, None, None, :] * h
                    + beta[:, None, None, :])
        ga = _ClassEmbed(self.num_classes, 2 * c, "normal",
                         name="embed_ga")(y)
        gamma, alpha = ga[:, :c], ga[:, c:]
        h = h + means[:, None, None, :] * alpha[:, None, None, :]
        return gamma[:, None, None, :] * h


class ConditionalInstanceNorm2d(nn.Module):
    """IN + per-class affine (reference normalization.py:68-90)."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        h = instance_norm(x)
        if self.bias:
            gb = _ClassEmbed(self.num_classes, 2 * c, "uniform_zeros",
                             name="embed")(y)
            gamma, beta = gb[:, :c], gb[:, c:]
            return (gamma[:, None, None, :] * h + beta[:, None, None, :])
        gamma = _ClassEmbed(self.num_classes, c, "uniform", name="embed")(y)
        return gamma[:, None, None, :] * h


class ConditionalVarianceNorm2d(nn.Module):
    """Variance norm with per-class gain (reference normalization.py:93-107)."""

    num_classes: int
    bias: bool = False

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        gamma = _ClassEmbed(self.num_classes, c, "normal", name="embed")(y)
        v = jnp.var(x, axis=(1, 2), keepdims=True)
        h = x * jax.lax.rsqrt(v + 1e-5)
        return gamma[:, None, None, :] * h


class ConditionalNoneNorm2d(nn.Module):
    """Per-class affine only, no normalization (normalization.py:126-146)."""

    num_classes: int
    bias: bool = True

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        if self.bias:
            gb = _ClassEmbed(self.num_classes, 2 * c, "uniform_zeros",
                             name="embed")(y)
            gamma, beta = gb[:, :c], gb[:, c:]
            return gamma[:, None, None, :] * x + beta[:, None, None, :]
        gamma = _ClassEmbed(self.num_classes, c, "uniform", name="embed")(y)
        return gamma[:, None, None, :] * x


class GroupNorm32(nn.Module):
    """GroupNorm factory entry (matches nn.GroupNorm torch defaults)."""

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=32, epsilon=1e-5, name="gn")(x)


def get_normalization(name: str, conditional: bool = False,
                      num_classes: int | None = None):
    """Factory keyed on config.model.normalization
    (reference normalization.py:22-40)."""
    if conditional:
        if name == "InstanceNorm++":
            import functools

            return functools.partial(
                ConditionalInstanceNorm2dPlus, num_classes=num_classes
            )
        raise NotImplementedError(
            "{} not implemented for conditional".format(name)
        )
    if name == "InstanceNorm":
        return InstanceNorm2d
    if name == "InstanceNorm++":
        return InstanceNorm2dPlus
    if name == "VarianceNorm":
        return VarianceNorm2d
    if name == "GroupNorm":
        return GroupNorm32
    raise ValueError("Unknown normalization: {}".format(name))
