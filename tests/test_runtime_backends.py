"""Production runtime backends: grain input pipeline + orbax checkpointing.

Both are opt-in (`data_backend grain`, `ckpt_backend orbax`); these tests
assert they are drop-in equivalent to the default thread/msgpack paths.
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest


def _fake_image_dir(tmp_path, n=10, size=32):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    paths = []
    for i in range(n):
        arr = rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8)
        p = d / f"img_{i:03d}.png"
        Image.fromarray(arr).save(p)
        paths.append(str(p))
    return paths


def _transform(img):
    return (np.asarray(img, np.float32) / 255.0) * 2.0 - 1.0


def test_grain_loader_matches_thread_loader(tmp_path):
    pytest.importorskip("grain")
    from pnpflow_tpu.data.datasets import _FileDataset
    from pnpflow_tpu.data.grain_loader import GrainFileLoader

    paths = _fake_image_dir(tmp_path)
    ref = _FileDataset(paths, 4, _transform, shuffle=False)
    # worker_count=0 keeps the test hermetic (no subprocess spawn in CI)
    got = GrainFileLoader(paths, 4, _transform, shuffle=False,
                          num_workers=0)
    assert len(ref) == len(got)
    for (a, la), (b, lb) in zip(ref, got):
        np.testing.assert_allclose(a, b, atol=1e-6)
        assert la.shape == lb.shape


def test_grain_loader_drop_last_and_missing_files(tmp_path):
    pytest.importorskip("grain")
    from pnpflow_tpu.data.grain_loader import GrainFileLoader

    paths = _fake_image_dir(tmp_path) + [str(tmp_path / "missing.png")]
    with pytest.warns(UserWarning, match="missing.png"):
        loader = GrainFileLoader(paths, 4, _transform, drop_last=True,
                                 num_workers=0)
    batches = list(loader)
    assert len(batches) == 2          # 10 real files, drop the ragged 2
    assert all(b[0].shape[0] == 4 for b in batches)


def test_grain_loader_shuffles_deterministically(tmp_path):
    pytest.importorskip("grain")
    from pnpflow_tpu.data.grain_loader import GrainFileLoader

    paths = _fake_image_dir(tmp_path)
    a = GrainFileLoader(paths, 10, _transform, shuffle=True, seed=3,
                        num_workers=0)
    b = GrainFileLoader(paths, 10, _transform, shuffle=True, seed=3,
                        num_workers=0)
    (xa, _), = list(a)
    (xb, _), = list(b)
    np.testing.assert_allclose(xa, xb)
    # next epoch reshuffles
    (xa2, _), = list(a)
    assert not np.allclose(xa, xa2)


def test_dataloaders_grain_backend_wiring(tmp_path):
    pytest.importorskip("grain")
    from pnpflow_tpu.data.datasets import DataLoaders
    from pnpflow_tpu.data.grain_loader import GrainFileLoader

    test_dir = tmp_path / "celebahq" / "test"
    test_dir.mkdir(parents=True)
    from PIL import Image

    rng = np.random.default_rng(1)
    for i in range(4):
        arr = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        Image.fromarray(arr).save(test_dir / f"{i}.png")

    loaders = DataLoaders("celebahq", 2, 2, root=str(tmp_path),
                          backend="grain", num_workers=0).load_data()
    assert isinstance(loaders["test"], GrainFileLoader)
    x, y = next(iter(loaders["test"]))
    assert x.shape == (2, 256, 256, 3)
    assert float(x.min()) >= -1.0 and float(x.max()) <= 1.0


# ---------------------------------------------------------------------------
# orbax


def _tiny_state():
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.adam(1e-3)
    return {
        "params": params,
        "opt_state": tx.init(params),
        "ema": params,
        "step": jnp.int32(7),
    }


def test_orbax_save_restore_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from pnpflow_tpu.training.checkpoint import OrbaxCheckpointer

    ck = OrbaxCheckpointer(str(tmp_path / "ck"))
    state = _tiny_state()
    ck.save(state, epochs_done=3)
    ck.wait_until_finished()

    template = jax.tree_util.tree_map(jnp.zeros_like, state)
    restored, epochs_done, resumed = ck.restore_latest(template)
    assert resumed and epochs_done == 3
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]),
                               np.arange(6.0).reshape(2, 3))
    assert int(restored["step"]) == 7
    ck.close()


def test_orbax_restore_empty_dir(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from pnpflow_tpu.training.checkpoint import OrbaxCheckpointer

    ck = OrbaxCheckpointer(str(tmp_path / "ck2"))
    state = _tiny_state()
    out, epochs, resumed = ck.restore_latest(state)
    assert not resumed and epochs == 0 and out is state
    ck.close()


@pytest.mark.slow
def test_trainer_orbax_backend_resume(tmp_path):
    """FlowMatchingTrainer with ckpt_backend=orbax: preemption save then
    resume restores epochs_done and state (mirrors the msgpack resume
    test in test_training.py)."""
    pytest.importorskip("orbax.checkpoint")
    from pnpflow_tpu.training.flow_matching import FlowMatchingTrainer
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(dict(
        dataset="synthetic", model="indep", dim_image=8, num_channels=1,
        lr=1e-3, num_epoch=1, batch_size_train=8, output_root=str(tmp_path),
        ckpt_backend="orbax", ot_method="sinkhorn",
    ))
    tr = FlowMatchingTrainer(args)
    state = tr.init_state()
    state["step"] = jnp.int32(5)
    tr.save_preemption(state, epochs_done=2)
    tr._orbax.wait_until_finished()

    tr2 = FlowMatchingTrainer(args)
    template = tr2.init_state()
    restored, epochs_done, resumed = tr2.restore_state(template)
    assert resumed and epochs_done == 2
    assert int(restored["step"]) == 5


import jax  # noqa: E402  (used by tree_map above)


def test_commit_tree_preserves_values_and_structure():
    """commit_tree returns a device-created copy, bit-identical, same tree.

    The laundering matters only on remoted TPU backends (see
    utils/jax_setup.py:commit_tree); on CPU it must still be a faithful
    identity so the call is safe everywhere build_model_bundle runs.
    """
    from pnpflow_tpu.utils.jax_setup import commit_tree

    tree = {
        "w": np.arange(12, dtype=np.float32).reshape(3, 4),
        "nested": {"b": jnp.ones((5,), jnp.bfloat16), "s": np.float32(2.5)},
    }
    out = commit_tree(tree)
    assert set(out) == {"w", "nested"}
    np.testing.assert_array_equal(np.asarray(out["w"]), tree["w"])
    np.testing.assert_array_equal(
        np.asarray(out["nested"]["b"], np.float32), np.ones((5,), np.float32)
    )
    assert float(out["nested"]["s"]) == 2.5
    # outputs are jax Arrays resident on the default device
    assert out["w"].devices() == {jax.devices()[0]}


def test_default_compiler_options_cpu_and_env(monkeypatch):
    """On the CPU test mesh the TPU-only default must be suppressed
    (libtpu options are rejected by other backends); the env override
    parses k=v lists and the empty string restores compiler defaults."""
    from pnpflow_tpu.utils.jax_setup import default_compiler_options

    monkeypatch.delenv("PNPFLOW_COMPILER_OPTS", raising=False)
    assert default_compiler_options() is None  # cpu platform

    monkeypatch.setenv("PNPFLOW_COMPILER_OPTS", "a=b,c=d=e")
    assert default_compiler_options() == {"a": "b", "c": "d=e"}

    monkeypatch.setenv("PNPFLOW_COMPILER_OPTS", "")
    assert default_compiler_options() is None
