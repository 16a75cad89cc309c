"""Fused conv3x3 + GroupNorm-epilogue kernel (ops/fused_conv_gn.py).

Covers: kernel-vs-XLA numerics (interpret mode on CPU) across prologue /
sample-bias / residual combinations and channel widths; gn_prologue
equivalence with flax GroupNorm+swish; moment assembly across channel
concat; and the model-level guarantee that ``VelocityUNet(fused_norm=
"conv")`` has the identical parameter tree to the standard path and the
identical forward output — so trained checkpoints serve through the fused
path unchanged.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from pnpflow_tpu.ops.fused_conv_gn import (
    channel_moments,
    concat_moments,
    conv3x3_gn,
    conv3x3_gn_reference,
    fits_vmem,
    gn_prologue,
)


def _rand(rng, *shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize("c,co", [(32, 32), (32, 64), (64, 64), (128, 64)])
def test_kernel_matches_xla(c, co):
    rng = np.random.default_rng(0)
    x = _rand(rng, 2, 8, 8, c)
    w = _rand(rng, 3, 3, c, co) * 0.1
    b = _rand(rng, co) * 0.1
    y1, m1 = conv3x3_gn(x, w, b, interpret=True)
    y2, m2 = conv3x3_gn_reference(x, w, b)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-4
    assert float(jnp.max(jnp.abs(m1 - m2))) < 5e-2


def test_kernel_full_epilogue():
    """prologue + temb sample-bias + residual, moments of the final sum."""
    rng = np.random.default_rng(1)
    n, h, w_, c, co = 3, 8, 8, 32, 32
    x = _rand(rng, n, h, w_, c)
    w = _rand(rng, 3, 3, c, co) * 0.1
    b = _rand(rng, co) * 0.1
    sb = _rand(rng, n, co)
    res = _rand(rng, n, h, w_, co)
    scale, bias = _rand(rng, c), _rand(rng, c)
    pro = gn_prologue(channel_moments(x), h * w_, scale, bias, 8)
    kw = dict(prologue=pro, sample_bias=sb, residual=res)
    y1, m1 = conv3x3_gn(x, w, b, interpret=True, **kw)
    y2, m2 = conv3x3_gn_reference(x, w, b, **kw)
    assert float(jnp.max(jnp.abs(y1 - y2))) < 1e-4
    assert float(jnp.max(jnp.abs(m1 - m2))) < 5e-2


def test_kernel_bf16_out():
    rng = np.random.default_rng(2)
    x = _rand(rng, 2, 8, 8, 32).astype(jnp.bfloat16)
    w = (_rand(rng, 3, 3, 32, 32) * 0.1).astype(jnp.bfloat16)
    b = _rand(rng, 32) * 0.1
    y1, m1 = conv3x3_gn(x, w, b, interpret=True)
    y2, m2 = conv3x3_gn_reference(x, w, b)
    assert y1.dtype == jnp.bfloat16
    # moments are f32 accumulations of the SAME bf16-written tensor
    assert float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                 - y2.astype(jnp.float32)))) < 5e-2
    assert float(jnp.max(jnp.abs(m1 - m2))) < 1.0


def test_gn_prologue_matches_flax():
    rng = np.random.default_rng(3)
    x = _rand(rng, 2, 8, 8, 64)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    p = gn.init(jax.random.PRNGKey(0), x)
    p = jax.tree.map(
        lambda v: jnp.asarray(
            np.random.default_rng(7).normal(size=v.shape), jnp.float32), p)
    ref = nn.swish(gn.apply(p, x))
    a, b = gn_prologue(
        channel_moments(x), 64, p["params"]["scale"], p["params"]["bias"], 32)
    xf = x * a[:, None, None, :] + b[:, None, None, :]
    got = xf * jax.nn.sigmoid(xf)
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-5


def test_concat_moments_assemble():
    """Moments of a channel concat = concat of per-part channel moments;
    gn_prologue over the concat matches direct GroupNorm of the concat —
    the property that keeps the decoder's skip-concats statistics-free."""
    rng = np.random.default_rng(4)
    u = _rand(rng, 2, 8, 8, 32)
    v = _rand(rng, 2, 8, 8, 96)
    cat = jnp.concatenate([u, v], axis=-1)
    m = concat_moments(channel_moments(u), channel_moments(v))
    assert float(jnp.max(jnp.abs(m - channel_moments(cat)))) < 1e-3
    scale, bias = _rand(rng, 128), _rand(rng, 128)
    a, b = gn_prologue(m, 64, scale, bias, 32)
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    ref = gn.apply({"params": {"scale": scale, "bias": bias}}, cat)
    got = cat * a[:, None, None, :] + b[:, None, None, :]
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-4


def test_fits_vmem_gate():
    assert fits_vmem(64, 64, 64, 64, has_residual=True)      # bench worst case
    assert not fits_vmem(256, 256, 128, 128, has_residual=True)


def test_fused_unet_param_tree_and_output():
    """fused_norm='conv' loads standard checkpoints and reproduces the
    standard forward (fp32, tiny config, interpret mode on CPU)."""
    from pnpflow_tpu.models.unet import VelocityUNet

    kw = dict(input_channels=3, input_height=16, ch=32, ch_mult=(1, 2),
              num_res_blocks=2, attn_resolutions=(8,))
    m_std = VelocityUNet(**kw)
    m_fc = VelocityUNet(**kw, fused_norm="conv")
    x = _rand(np.random.default_rng(5), 2, 16, 16, 3)
    t = jnp.asarray([0.3, 0.7], jnp.float32)
    p = m_std.init(jax.random.PRNGKey(0), x, t)
    p_fc = m_fc.init(jax.random.PRNGKey(0), x, t)

    import jax.tree_util as jtu
    tree = {jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(p)}
    tree_fc = {
        jtu.keystr(k): v.shape for k, v in jtu.tree_leaves_with_path(p_fc)}
    assert tree == tree_fc

    y = m_std.apply(p, x, t)
    y_fc = m_fc.apply(p, x, t)
    rel = float(jnp.max(jnp.abs(y - y_fc))) / float(jnp.max(jnp.abs(y)))
    assert rel < 1e-4


def test_non_tpu_default_routes_to_xla_reference(monkeypatch):
    """With interpret unspecified on a non-TPU backend, conv3x3_gn must take
    the XLA mirror — not silently run the orders-of-magnitude slower Pallas
    interpreter (round-4 advisor finding)."""
    import pnpflow_tpu.ops.fused_conv_gn as m

    if jax.default_backend() == "tpu":
        pytest.skip("non-TPU routing test")

    def boom(*a, **k):
        raise AssertionError("Pallas path taken on a non-TPU backend")

    monkeypatch.setattr(m, "_conv3x3_gn_impl", boom)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 16, 32)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(32,)).astype(np.float32))
    y, mom = m.conv3x3_gn(x, w, b)
    y2, mom2 = m.conv3x3_gn_reference(x, w, b)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mom), np.asarray(mom2), rtol=1e-6)
