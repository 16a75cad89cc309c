"""NCSN++ ('rectified' backbone): forward shapes, pyramid wiring, converter
roundtrip on a synthetic torch-layout state dict."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.models.ncsnpp import NCSNpp


def small_ncsnpp(**kw):
    cfg = dict(
        image_size=32, num_channels=3, nf=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(16,),
    )
    cfg.update(kw)
    return NCSNpp(**cfg)


def test_forward_shape_and_finite():
    model = small_ncsnpp()
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
    t = jnp.full((2,), 500.0)  # t*999 convention of the rectified path
    params = model.init(jax.random.PRNGKey(1), x, t)
    out = model.apply(params, x, t)
    assert out.shape == x.shape
    assert bool(jnp.isfinite(out).all())


def test_scale_by_sigma_division():
    m1 = small_ncsnpp(scale_by_sigma=True)
    m2 = small_ncsnpp(scale_by_sigma=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    t = jnp.full((1,), 250.0)
    params = m1.init(jax.random.PRNGKey(1), x, t)
    o1 = m1.apply(params, x, t)
    o2 = m2.apply(params, x, t)
    assert np.allclose(np.asarray(o1) * 250.0, np.asarray(o2), atol=1e-3)


def test_module_numbering_is_contiguous():
    """Param tree must contain m0..mN with no gaps — the converter depends
    on positional parity with the torch ModuleList."""
    model = small_ncsnpp()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))["params"]
    idx = sorted(int(k[1:]) for k in params.keys())
    assert idx == list(range(len(idx)))


def test_converter_roundtrip_synthetic():
    from pnpflow_tpu.utils.ncsnpp_convert import convert_ncsnpp_state_dict

    model = small_ncsnpp()
    x = jnp.zeros((1, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))["params"]

    rng = np.random.default_rng(0)
    sd = {}

    def fill(node, path):
        for name, child in node.items():
            p = path + (name,)
            if isinstance(child, dict):
                fill(child, p)
                continue
            leaf = p[-1]
            torch_key = "all_modules." + p[0][1:]
            mid = p[1:-1]
            if mid:
                torch_key += "." + ".".join(mid)
            shape = np.shape(child)
            if leaf == "kernel" and len(shape) == 4:
                w = rng.normal(size=(shape[3], shape[2], shape[0], shape[1]))
                sd[torch_key + ".weight"] = w.astype(np.float32)
            elif leaf == "kernel":
                w = rng.normal(size=(shape[1], shape[0]))
                sd[torch_key + ".weight"] = w.astype(np.float32)
            elif leaf == "scale":
                sd[torch_key + ".weight"] = rng.normal(size=shape).astype(np.float32)
            elif leaf == "bias":
                sd[torch_key + ".bias"] = rng.normal(size=shape).astype(np.float32)
            elif leaf in ("W", "b"):
                sd[torch_key + "." + leaf] = rng.normal(size=shape).astype(np.float32)
            else:
                raise AssertionError(p)

    fill(params, ())
    converted = convert_ncsnpp_state_dict(sd, params)["params"]

    flat_t = jax.tree_util.tree_leaves_with_path(params)
    flat_c = jax.tree_util.tree_leaves_with_path(converted)
    shapes_t = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_t}
    shapes_c = {jax.tree_util.keystr(p): np.shape(v) for p, v in flat_c}
    assert shapes_t == shapes_c

    # spot-check a conv transpose: flax kernel[h,w,i,o] == torch[o,i,h,w]
    k = converted["m5"]["Conv_0"]["kernel"] if "Conv_0" in converted.get(
        "m5", {}
    ) else None
    out = NCSNpp(
        image_size=32, num_channels=3, nf=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(16,),
    ).apply(
        {"params": converted},
        jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3)),
        jnp.full((1,), 123.0),
    )
    assert bool(jnp.isfinite(out).all())


def test_missing_torch_key_raises():
    from pnpflow_tpu.utils.ncsnpp_convert import convert_ncsnpp_state_dict

    model = small_ncsnpp()
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), jnp.ones((1,))
    )["params"]
    with pytest.raises(KeyError):
        convert_ncsnpp_state_dict({}, params)


def test_fir_upsample_downsample_modules():
    """Standalone FIR Upsample/Downsample modules (layerspp.py:94-155):
    shapes and constant-gain behavior, with and without fused conv."""
    import jax
    from pnpflow_tpu.models.ncsnpp import Downsample, Upsample

    x = jnp.ones((1, 8, 8, 6))
    up = Upsample(fir=True)
    y = up.apply(up.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 16, 16, 6)
    assert np.allclose(np.asarray(y)[:, 4:-4, 4:-4, :], 1.0, atol=1e-5)

    down = Downsample(fir=True)
    y = down.apply(down.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (1, 4, 4, 6)

    upc = Upsample(with_conv=True, fir=True, out_ch=4)
    p = upc.init(jax.random.PRNGKey(1), x)
    y = upc.apply(p, x)
    assert y.shape == (1, 16, 16, 4)

    downc = Downsample(with_conv=True, fir=True, out_ch=4)
    p = downc.init(jax.random.PRNGKey(2), x)
    y = downc.apply(p, x)
    assert y.shape == (1, 4, 4, 4)


def test_bf16_dtype_threads_through_whole_forward():
    """dtype=bf16 must reach every interior layer: flax silently promotes
    to the fp32 param dtype when a submodule is built without ``dtype``,
    which doubles HBM traffic and disables bf16 MXU rates (the round-2
    256² bench was actually computing in fp32 this way)."""
    m = NCSNpp(image_size=32, num_channels=3, nf=16, ch_mult=(1, 2),
               num_res_blocks=1, attn_resolutions=(16,), dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(
            np.float32
        )
    )
    t = jnp.full((2,), 500.0)
    p = m.init(jax.random.PRNGKey(0), x, t)
    out32 = m.apply(p, x, t)

    mbf = NCSNpp(image_size=32, num_channels=3, nf=16, ch_mult=(1, 2),
                 num_res_blocks=1, attn_resolutions=(16,),
                 dtype=jnp.bfloat16)
    outbf, inter = mbf.apply(p, x, t, capture_intermediates=True)
    flat = {
        jax.tree_util.keystr(path): leaf
        for path, leaf in jax.tree_util.tree_flatten_with_path(inter)[0]
    }
    # every named-submodule (m{i}) output rides bf16
    interior = {
        k: v.dtype for k, v in flat.items()
        if hasattr(v, "dtype") and "['m" in k
    }
    assert interior, "no intermediates captured: {}".format(list(flat)[:5])
    # the fourier t-embedding (m0: fp32 log-t projection) is the one
    # allowed fp32 interior
    bad = {k: d for k, d in interior.items()
           if d != jnp.bfloat16 and "['m0']" not in k}
    assert not bad, bad

    assert outbf.dtype == jnp.float32
    scale = float(jnp.max(jnp.abs(out32))) + 1e-9
    rel = float(jnp.max(jnp.abs(out32 - outbf))) / scale
    assert rel < 0.1, rel
