"""Velocity U-Net tests: shapes, init discipline, and op-level parity of the
building blocks against torch.nn.functional (the converter's correctness
hinges on conv/dense/groupnorm/upsample semantics matching exactly)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.models.unet import VelocityUNet, sinusoidal_embedding

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def small_unet(dim=32, ch=32, rb=2):
    return VelocityUNet(
        input_channels=3, input_height=dim, ch=ch, ch_mult=(1, 2),
        num_res_blocks=rb, attn_resolutions=(16,),
    )


def test_forward_shape_and_dtype():
    model = small_unet()
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.full((2,), 0.3)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert out.dtype == jnp.float32


def test_zero_init_final_convs():
    """end_conv and residual conv2 use init_scale=0, which the reference
    maps to gain 1e-10 (models.py:211-216: ``gain=1e-10 if scale == 0``) =>
    output at init is near-zero, not exactly zero."""
    model = small_unet()
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3))
    t = jnp.full((2,), 0.5)
    params = model.init(jax.random.PRNGKey(0), x, t)
    out = model.apply(params, x, t)
    assert float(jnp.abs(out).max()) < 1e-3
    assert float(jnp.abs(params["params"]["end_conv"]["kernel"]).max()) < 1e-4


def test_sinusoidal_embedding_matches_reference_formula():
    """Reference models.py:253-279 (tensor2tensor convention)."""
    t = np.array([0.0, 0.5, 1.0], dtype=np.float32)
    dim = 32
    half = dim // 2
    emb_scale = np.exp(np.arange(half) * (-np.log(10000.0) / (half - 1)))
    args = t[:, None] * emb_scale[None, :]
    expected = np.concatenate([np.sin(args), np.cos(args)], axis=1)
    ours = np.asarray(sinusoidal_embedding(jnp.asarray(t), dim))
    assert np.allclose(ours, expected, atol=1e-6)


def test_conv_padding_parity_with_torch():
    """flax Conv padding=1 (stride 1 and 2) must equal torch Conv2d
    semantics — the converter depends on it."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 4)).astype(np.float32)
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)  # HWIO

    for stride in (1, 2):
        ours = jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (stride, stride),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
        wt = torch.from_numpy(np.transpose(w, (3, 2, 0, 1)))  # OIHW
        ref = F.conv2d(xt, wt, stride=stride, padding=1)
        ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
        assert np.allclose(np.asarray(ours), ref, atol=1e-4), stride


def test_groupnorm_parity_with_torch():
    import flax.linen as nn

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
    scale = rng.normal(size=(64,)).astype(np.float32)
    bias = rng.normal(size=(64,)).astype(np.float32)

    gn = nn.GroupNorm(num_groups=32, epsilon=1e-6)
    params = {"params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}}
    ours = np.asarray(gn.apply(params, jnp.asarray(x)))

    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.group_norm(
        xt, 32, torch.from_numpy(scale), torch.from_numpy(bias), eps=1e-6
    )
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref, atol=1e-4)


def test_nearest_upsample_parity_with_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 5, 5, 3)).astype(np.float32)
    ours = np.asarray(
        jax.image.resize(jnp.asarray(x), (1, 10, 10, 3), method="nearest")
    )
    xt = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    ref = F.interpolate(xt, scale_factor=2, mode="nearest")
    ref = np.transpose(ref.numpy(), (0, 2, 3, 1))
    assert np.allclose(ours, ref)


def test_attention_applied_only_at_configured_resolutions():
    model = small_unet(dim=32)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,))
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    names = set(params.keys())
    # 32 -> 16 after one downsample: attention exists at level 1 only
    assert any(n.startswith("down_1_attn") for n in names)
    assert not any(n.startswith("down_0_attn") for n in names)
    assert "mid_attn" in names


def test_converter_roundtrip_consumes_all_keys():
    """Build a torch-style state dict with the reference's key naming for a
    small config, convert, and check the flax tree is complete."""
    from pnpflow_tpu.utils.torch_convert import convert_unet_state_dict

    model = small_unet(dim=32, ch=32, rb=1)
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))["params"]

    # construct a fake torch state dict shaped like the reference layout
    rng = np.random.default_rng(3)
    sd = {}

    def conv_t(flax_kernel):
        return rng.normal(size=np.transpose(flax_kernel, (3, 2, 0, 1)).shape
                          ).astype(np.float32)

    def add_res(prefix, fp):
        sd[prefix + ".norm1.weight"] = rng.normal(size=fp["norm1"]["scale"].shape).astype(np.float32)
        sd[prefix + ".norm1.bias"] = rng.normal(size=fp["norm1"]["bias"].shape).astype(np.float32)
        sd[prefix + ".conv1.weight"] = conv_t(fp["conv1"]["kernel"])
        sd[prefix + ".conv1.bias"] = rng.normal(size=fp["conv1"]["bias"].shape).astype(np.float32)
        sd[prefix + ".temb_proj.weight"] = rng.normal(
            size=np.transpose(fp["temb_proj"]["kernel"], (1, 0)).shape
        ).astype(np.float32)
        sd[prefix + ".temb_proj.bias"] = rng.normal(size=fp["temb_proj"]["bias"].shape).astype(np.float32)
        sd[prefix + ".norm2.weight"] = rng.normal(size=fp["norm2"]["scale"].shape).astype(np.float32)
        sd[prefix + ".norm2.bias"] = rng.normal(size=fp["norm2"]["bias"].shape).astype(np.float32)
        sd[prefix + ".conv2.weight"] = conv_t(fp["conv2"]["kernel"])
        sd[prefix + ".conv2.bias"] = rng.normal(size=fp["conv2"]["bias"].shape).astype(np.float32)
        if "shortcut" in fp:
            sd[prefix + ".shortcut.weight"] = conv_t(fp["shortcut"]["kernel"])
            sd[prefix + ".shortcut.bias"] = rng.normal(size=fp["shortcut"]["bias"].shape).astype(np.float32)

    def add_attn(prefix, fp):
        sd[prefix + ".norm.weight"] = rng.normal(size=fp["norm"]["scale"].shape).astype(np.float32)
        sd[prefix + ".norm.bias"] = rng.normal(size=fp["norm"]["bias"].shape).astype(np.float32)
        for q in ("attn_q", "attn_k", "attn_v", "proj_out"):
            sd[prefix + f".{q}.weight"] = conv_t(fp[q]["kernel"])
            sd[prefix + f".{q}.bias"] = rng.normal(size=fp[q]["bias"].shape).astype(np.float32)

    sd["begin_conv.weight"] = conv_t(params["begin_conv"]["kernel"])
    sd["begin_conv.bias"] = rng.normal(size=params["begin_conv"]["bias"].shape).astype(np.float32)
    sd["temb_net.main.0.weight"] = rng.normal(
        size=np.transpose(params["temb_net"]["dense_0"]["kernel"], (1, 0)).shape
    ).astype(np.float32)
    sd["temb_net.main.0.bias"] = rng.normal(size=params["temb_net"]["dense_0"]["bias"].shape).astype(np.float32)
    sd["temb_net.main.2.weight"] = rng.normal(
        size=np.transpose(params["temb_net"]["dense_1"]["kernel"], (1, 0)).shape
    ).astype(np.float32)
    sd["temb_net.main.2.bias"] = rng.normal(size=params["temb_net"]["dense_1"]["bias"].shape).astype(np.float32)

    # levels: ch_mult (1,2); rb=1; attention at level 1 (16x16)
    add_res("down_modules.0.0a_0a_block", params["down_0_block_0"])
    sd["down_modules.0.0b_downsample.weight"] = conv_t(
        params["down_0_downsample"]["conv"]["kernel"]
    )
    sd["down_modules.0.0b_downsample.bias"] = rng.normal(
        size=params["down_0_downsample"]["conv"]["bias"].shape
    ).astype(np.float32)
    add_res("down_modules.1.1a_0a_block", params["down_1_block_0"])
    add_attn("down_modules.1.1a_0b_attn", params["down_1_attn_0"])
    add_res("mid_modules.0", params["mid_block_0"])
    add_attn("mid_modules.1", params["mid_attn"])
    add_res("mid_modules.2", params["mid_block_1"])
    add_res("up_modules.0.1a_0a_block", params["up_1_block_0"])
    add_attn("up_modules.0.1a_0b_attn", params["up_1_attn_0"])
    add_res("up_modules.0.1a_1a_block", params["up_1_block_1"])
    add_attn("up_modules.0.1a_1b_attn", params["up_1_attn_1"])
    sd["up_modules.0.1b_upsample.up_conv.weight"] = conv_t(
        params["up_1_upsample"]["conv"]["kernel"]
    )
    sd["up_modules.0.1b_upsample.up_conv.bias"] = rng.normal(
        size=params["up_1_upsample"]["conv"]["bias"].shape
    ).astype(np.float32)
    add_res("up_modules.1.0a_0a_block", params["up_0_block_0"])
    add_res("up_modules.1.0a_1a_block", params["up_0_block_1"])
    sd["end_conv.0.weight"] = rng.normal(size=params["end_norm"]["scale"].shape).astype(np.float32)
    sd["end_conv.0.bias"] = rng.normal(size=params["end_norm"]["bias"].shape).astype(np.float32)
    sd["end_conv.2.weight"] = conv_t(params["end_conv"]["kernel"])
    sd["end_conv.2.bias"] = rng.normal(size=params["end_conv"]["bias"].shape).astype(np.float32)

    converted = convert_unet_state_dict(sd)["params"]

    # identical tree structure and shapes
    flat_ours = jax.tree_util.tree_leaves_with_path(params)
    flat_conv = jax.tree_util.tree_leaves_with_path(converted)
    paths_ours = {jax.tree_util.keystr(p): v.shape for p, v in flat_ours}
    paths_conv = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_conv}
    assert paths_ours == paths_conv

    # forward runs with converted weights
    model2 = small_unet(dim=32, ch=32, rb=1)
    out = model2.apply(
        {"params": converted},
        jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3)),
        jnp.full((1,), 0.25),
    )
    assert out.shape == (1, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
