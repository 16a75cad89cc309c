"""Model registry: build/load/save resolution and mismatch robustness."""

import os
import warnings

import numpy as np
import jax.numpy as jnp
import pytest

from pnpflow_tpu.models.registry import (
    build_model_bundle,
    checkpoint_paths,
    define_model,
    init_params,
    load_params,
    model_fingerprint,
    save_params,
)
from pnpflow_tpu.utils.config import CfgNode


def _args(tmp_path, dim=16, model="ot"):
    return CfgNode(
        dict(dataset="synthetic", model=model, dim_image=dim,
             num_channels=1, seed=0, output_root=str(tmp_path) + "/")
    )


def test_random_init_warns(tmp_path):
    args = _args(tmp_path)
    module = define_model(args)
    with pytest.warns(UserWarning, match="random init"):
        load_params(module, args)


def test_msgpack_roundtrip(tmp_path):
    args = _args(tmp_path)
    module = define_model(args)
    params = init_params(module, args, seed=3)
    save_params(params, checkpoint_paths(args)["msgpack"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # must NOT warn now
        loaded = load_params(module, args)
    import jax

    a = jax.tree_util.tree_leaves(params)[0]
    b = jax.tree_util.tree_leaves(loaded)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_mismatched_checkpoint_falls_back(tmp_path):
    """A checkpoint trained at a different dim_image must not crash eval —
    warn and fall back to random init (require=False)."""
    args16 = _args(tmp_path, dim=16)
    m16 = define_model(args16)
    save_params(init_params(m16, args16), checkpoint_paths(args16)["msgpack"])

    args64 = _args(tmp_path, dim=64)  # attn levels differ at dim 64
    m64 = define_model(args64)
    with pytest.warns(UserWarning, match="does not match"):
        params = load_params(m64, args64)
    out = m64.apply(params, jnp.zeros((1, 64, 64, 1)), jnp.zeros((1,)))
    assert out.shape == (1, 64, 64, 1)

    with pytest.raises(ValueError):
        load_params(m64, args64, require=True)


def test_cross_resolution_fingerprint_rejected(tmp_path):
    """A fully convolutional U-Net has byte-identical parameter shapes at
    every resolution, so structural restore alone would silently load a
    64²-trained checkpoint into a 16² model.  The architecture fingerprint
    embedded at save time must reject it loudly."""
    # dims 48 and 24 both have NO attention level (no 16/8 feature map), so
    # their parameter trees are byte-compatible — the silent case
    args48 = _args(tmp_path, dim=48)
    m48 = define_model(args48)
    save_params(
        init_params(m48, args48), checkpoint_paths(args48)["msgpack"],
        fingerprint=model_fingerprint(m48, args48),
    )

    # same dataset/model → the dim-24 run resolves the very same file
    args24 = _args(tmp_path, dim=24)
    m24 = define_model(args24)
    with pytest.warns(UserWarning, match="different\\s+architecture"):
        load_params(m24, args24)
    with pytest.raises(ValueError, match="different\\s+architecture"):
        load_params(m24, args24, require=True)

    # the matching-geometry model loads it cleanly, no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        load_params(m48, args48)


def test_fingerprint_fields():
    args = _args("/tmp", dim=64)
    fp = model_fingerprint(define_model(args), args)
    assert fp["model"] == "ot" and fp["dim_image"] == 64
    assert fp["ch"] == 32 and fp["ch_mult"] == [1, 2, 4, 8]
    assert fp["num_res_blocks"] == 6 and fp["attn_resolutions"] == [16, 8]


def test_bundle_rectified_scales_t(tmp_path):
    """kind='rectified' folds the t*999 scaling into apply
    (reference pnp_flow.py:23-27)."""
    calls = {}

    class FakeModule:
        def apply(self, p, x, t):
            calls["t"] = t
            return x

    from pnpflow_tpu.solvers.base import ModelBundle

    module = FakeModule()

    def apply(p, x, t):
        return module.apply(p, x, t * 999.0)

    b = ModelBundle(apply=apply, params=None, kind="rectified")
    b.forward(jnp.zeros((1, 4, 4, 1)), jnp.full((1,), 0.5))
    assert float(calls["t"][0]) == pytest.approx(499.5)


def test_bundle_rectified_floors_t_at_reference_eps(tmp_path, monkeypatch):
    """The rectified adapter floors t at the reference's RF integration
    epsilon (sde_lib.py:45 / sampling.py:44, eps=1e-3) before the *999
    scaling: pnp_flow's first iteration feeds t=0 (pnp_flow.py:107-108),
    where fourier(log(t*999)) and the scale_by_sigma division are NaN in
    the torch reference as well — the floor is the reference's own
    stability contract applied to the one point it leaves undefined."""
    import pnpflow_tpu.models.ncsnpp as ncsnpp_mod

    seen = {}

    class FakeModule:
        def init(self, key, x, t):
            return {"params": {}}

        def apply(self, p, x, t):
            seen["t"] = t
            return x

    monkeypatch.setattr(
        ncsnpp_mod, "make_ncsnpp", lambda args, dtype: FakeModule()
    )
    args = _args(tmp_path, dim=8, model="rectified")
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        b = build_model_bundle(args)

    x = jnp.zeros((2, 8, 8, 1))
    b.apply(b.params, x, jnp.zeros((2,)))
    assert float(seen["t"][0]) == pytest.approx(0.999)  # floored, not 0
    b.apply(b.params, x, jnp.full((2,), 0.5))
    assert float(seen["t"][0]) == pytest.approx(499.5)  # unchanged above eps


def test_load_torch_checkpoint_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    from pnpflow_tpu.utils.torch_convert import load_torch_checkpoint

    sd = {"a.weight": torch.ones(2, 3), "a.bias": torch.zeros(2)}
    p = tmp_path / "ckpt.pt"
    torch.save(sd, p)
    out = load_torch_checkpoint(str(p))
    assert set(out) == {"a.weight", "a.bias"}
    assert out["a.weight"].shape == (2, 3)

    # trainer-style dict with model_state_dict key
    torch.save({"model_state_dict": sd, "optimizer_state_dict": {}}, p)
    out = load_torch_checkpoint(str(p))
    assert "a.bias" in out


def test_remat_bundle_matches_and_differentiates(tmp_path):
    """--opts remat True wraps the bundle apply in jax.checkpoint: same
    outputs and same gradients as the plain bundle (memory-only change)."""
    import jax
    import warnings as _w

    args = _args(tmp_path, dim=16)
    with _w.catch_warnings():
        _w.simplefilter("ignore")
        plain = build_model_bundle(args)
        args_r = _args(tmp_path, dim=16)
        args_r.remat = True
        remat = build_model_bundle(args_r, params=plain.params)

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 1)).astype(
            np.float32
        )
    )
    t = jnp.full((2,), 0.3)

    def loss(bundle_apply, params):
        return jnp.sum(bundle_apply(params, x, t) ** 2)

    lp, gp = jax.value_and_grad(lambda p: loss(plain.apply, p))(plain.params)
    lr, gr = jax.value_and_grad(lambda p: loss(remat.apply, p))(remat.params)
    np.testing.assert_allclose(float(lp), float(lr), rtol=1e-6)
    fp = jax.tree_util.tree_leaves(gp)[0]
    fr = jax.tree_util.tree_leaves(gr)[0]
    np.testing.assert_allclose(np.asarray(fp), np.asarray(fr), rtol=1e-5,
                               atol=1e-7)


def test_define_model_bf16_threads_norm_dtype(tmp_path):
    """dtype=bf16 selects bf16 norms too (the measured-fastest headline
    configuration, BASELINE.md batch sweep); fp32 keeps fp32 norms."""
    from pnpflow_tpu.models.registry import define_model

    args = _args(tmp_path, dim=16)
    m16 = define_model(args, dtype=jnp.bfloat16)
    assert m16.dtype == jnp.bfloat16 and m16.norm_dtype == jnp.bfloat16
    m32 = define_model(args, dtype=jnp.float32)
    assert m32.dtype == jnp.float32 and m32.norm_dtype is None
