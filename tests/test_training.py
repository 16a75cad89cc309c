"""Trainer tests: FM train step descends, EMA tracks, resume restores;
gradient-step denoiser pieces behave."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pnpflow_tpu.models.unet import VelocityUNet
from pnpflow_tpu.training.flow_matching import (
    euler_sample,
    make_fm_loss,
    make_fm_train_step,
)

DIM = 16


@pytest.fixture(scope="module")
def tiny():
    m = VelocityUNet(
        input_channels=1, input_height=DIM, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(8,),
    )
    params = m.init(
        jax.random.PRNGKey(0), jnp.zeros((1, DIM, DIM, 1)), jnp.zeros((1,))
    )
    return m, params


def _state(params, tx):
    return {
        "params": params,
        "opt_state": tx.init(params),
        "ema": jax.tree_util.tree_map(jnp.copy, params),
        "step": jnp.zeros((), jnp.int32),
    }


@pytest.mark.slow
def test_fm_train_step_descends(tiny):
    m, params = tiny
    tx = optax.adam(1e-3)
    step = make_fm_train_step(m.apply, tx, coupling="indep")
    state = _state(params, tx)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (16, DIM, DIM, 1)) * 0.5
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        key, sub = jax.random.split(key)
        state, loss = step(state, x1, sub)
        losses.append(float(loss))
    assert int(state["step"]) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


@pytest.mark.slow
def test_fm_train_step_ot_couplings(tiny):
    m, params = tiny
    tx = optax.adam(1e-3)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (8, DIM, DIM, 1))
    for ot_method in ("exact", "sinkhorn"):
        step = make_fm_train_step(
            m.apply, tx, coupling="ot", ot_method=ot_method
        )
        state = _state(params, tx)
        state, loss = step(state, x1, jax.random.PRNGKey(3))
        assert np.isfinite(float(loss)), ot_method


def test_fm_loss_zero_model_is_target_norm(tiny):
    """With v == 0 the FM loss is E||x1 - x0||^2 / B-normalized sum."""
    m, params = tiny
    loss_fn = make_fm_loss(lambda p, x, t: jnp.zeros_like(x))
    x0 = jnp.zeros((4, DIM, DIM, 1))
    x1 = jnp.ones((4, DIM, DIM, 1))
    t = jnp.full((4,), 0.5)
    val = float(loss_fn(None, x0, x1, t))
    assert np.isclose(val, DIM * DIM, atol=1e-4)  # sum 1s / B = H*W


def test_ema_tracks_params(tiny):
    m, params = tiny
    tx = optax.adam(1e-2)
    step = make_fm_train_step(m.apply, tx, coupling="indep", ema_decay=0.5)
    state = _state(params, tx)
    x1 = jax.random.normal(jax.random.PRNGKey(1), (8, DIM, DIM, 1))
    for i in range(5):
        state, _ = step(state, x1, jax.random.PRNGKey(i))
    # ema must differ from both init and current params but be finite
    p = jax.tree_util.tree_leaves(state["params"])[0]
    e = jax.tree_util.tree_leaves(state["ema"])[0]
    assert np.isfinite(np.asarray(e)).all()
    assert not np.allclose(np.asarray(p), np.asarray(e))


@pytest.mark.slow
def test_trainer_roundtrip_save_resume(tmp_path, tiny):
    from pnpflow_tpu.training.flow_matching import FlowMatchingTrainer
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(
        {
            "dataset": "synthetic",
            "model": "indep",
            "dim_image": DIM,
            "num_channels": 1,
            "lr": 1e-3,
            "num_epoch": 1,
            "seed": 0,
            "output_root": str(tmp_path),
            "batch_size_train": 8,
        }
    )
    tr = FlowMatchingTrainer(args)
    state = tr.init_state()
    state["step"] = jnp.asarray(7, jnp.int32)
    tr.save_state(state, epoch=0, epochs_done=3)
    restored, epochs_done, ok = tr.restore_state(tr.init_state())
    assert ok
    assert int(restored["step"]) == 7
    assert epochs_done == 3
    assert os.path.exists(os.path.join(tr.model_dir, "model_0.msgpack"))

    # a corrupted/incompatible resume file is ignored, not fatal
    with open(tr._state_path(), "wb") as f:
        f.write(b"not-a-msgpack")
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("ignore")
        try:
            _, epochs_done, ok = tr.restore_state(tr.init_state())
        except Exception:
            ok = False
    assert not ok


def test_preemption_point_every_epoch_by_default(tmp_path, tiny, monkeypatch):
    """The resume point must advance after EVERY epoch by default: a
    coarser cadence makes timeout-killed runs replay whole epochs on
    resume (round-4 finding: three runs each redid epochs 1-4 because the
    old default of 10 never triggered inside the run budget)."""
    from pnpflow_tpu.training.flow_matching import FlowMatchingTrainer
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(
        {
            "dataset": "synthetic",
            "model": "indep",
            "dim_image": DIM,
            "num_channels": 1,
            "lr": 1e-3,
            "num_epoch": 3,
            "seed": 0,
            "output_root": str(tmp_path),
            "batch_size_train": 8,
            "save_every": 100,  # keep the heavyweight save_state out
        }
    )
    tr = FlowMatchingTrainer(args, model=tiny[0])
    # the loop's step must be ONE compiled program, not an eager python fn
    # (round-4 finding: the unjitted step cost a tunnel round-trip PER OP)
    assert hasattr(tr.train_step, "lower")
    seen = []
    monkeypatch.setattr(
        tr, "save_preemption",
        lambda state, epochs_done=0: seen.append(epochs_done),
    )
    x = np.zeros((8, DIM, DIM, 1), np.float32)
    tr.train({"train": [(x, 0)]})
    # a resume point advances past EVERY epoch (save_state at epoch 0 and
    # at the end also route through save_preemption, so counts may exceed 1)
    assert {1, 2, 3} <= set(seen), seen


def _cadence_trainer(tmp_path, tiny, monkeypatch, num_epoch, **extra):
    from pnpflow_tpu.training.flow_matching import FlowMatchingTrainer
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(
        {
            "dataset": "synthetic",
            "model": "indep",
            "dim_image": DIM,
            "num_channels": 1,
            "lr": 1e-3,
            "num_epoch": num_epoch,
            "seed": 0,
            "output_root": str(tmp_path),
            "batch_size_train": 8,
            "save_every": 100,
            **extra,
        }
    )
    tr = FlowMatchingTrainer(args, model=tiny[0])
    seen = []
    monkeypatch.setattr(
        tr, "save_preemption",
        lambda state, epochs_done=0: seen.append(epochs_done),
    )
    # keep the heavyweight epoch-0 save_state/plot/FID out of the count
    monkeypatch.setattr(tr, "save_state", lambda *a, **k: None)
    monkeypatch.setattr(tr, "_save_sample_plot", lambda *a, **k: None)
    monkeypatch.setattr(tr, "_fid_checkpoint", lambda *a, **k: None)
    return tr, seen


def test_preemption_adaptive_cadence_throttles_slow_writes(
    tmp_path, tiny, monkeypatch
):
    """The default ("auto") resume-point cadence must skip writes while the
    accumulated epoch compute is below the measured cost of one write —
    otherwise a 28 s tunnel write after every 1.5 s epoch makes checkpoint
    IO dominate wall time ~20x (round-4 advisor finding)."""
    tr, seen = _cadence_trainer(tmp_path, tiny, monkeypatch, num_epoch=3)
    # pretend the last resume write took an hour: millisecond epochs must
    # never accumulate enough compute to justify another write
    tr._resume_write_s = 3600.0
    tr._compute_since_write = 0.0
    x = np.zeros((8, DIM, DIM, 1), np.float32)
    tr.train({"train": [(x, 0)]})
    assert seen == [], seen


def test_preemption_fixed_cadence_honored(tmp_path, tiny, monkeypatch):
    """An integer --opts preempt_every forces the fixed every-N cadence."""
    tr, seen = _cadence_trainer(
        tmp_path, tiny, monkeypatch, num_epoch=4, preempt_every=2
    )
    x = np.zeros((8, DIM, DIM, 1), np.float32)
    tr.train({"train": [(x, 0)]})
    assert seen == [2, 4], seen


def test_euler_sample_shapes(tiny):
    m, params = tiny
    out = euler_sample(
        m.apply, params, jax.random.PRNGKey(0), (3, DIM, DIM, 1), steps=4
    )
    assert out.shape == (3, DIM, DIM, 1)
    assert bool(jnp.isfinite(out).all())


# ---------------------------------------------------------------------------
# gradient-step denoiser


def test_calculate_grad_linear_model():
    """For N(x) = A x (A sym), Dg = x - N - J^T(x-N) = (I-A)x - A(I-A)x."""
    from pnpflow_tpu.training.denoiser import make_calculate_grad

    a = 0.25

    def apply(params, x, sigma_vec):
        return a * x

    calc = make_calculate_grad(apply)
    x = jnp.ones((2, 4, 4, 1))
    Dg, N = calc(None, x, jnp.zeros((2,)))
    expected = (1 - a) * x - a * (1 - a) * x
    assert np.allclose(np.asarray(Dg), np.asarray(expected), atol=1e-6)


def test_denoiser_forward_identity_for_zero_net():
    from pnpflow_tpu.training.denoiser import make_denoiser_forward

    fwd = make_denoiser_forward(lambda p, x, s: jnp.zeros_like(x))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 1))
    x_hat, Dg = fwd(None, x, jnp.zeros((2,)))
    # N=0 => Dg = x - 0 - 0 = x => D(x) = 0
    assert np.allclose(np.asarray(x_hat), 0.0, atol=1e-6)


def test_power_iteration_spectral_norm():
    from pnpflow_tpu.training.denoiser import power_iteration

    scale = 3.0
    op = lambda v: scale * v
    lam = power_iteration(op, jnp.ones((2, 4, 4, 1)), jax.random.PRNGKey(0))
    assert np.allclose(np.asarray(lam), scale, atol=1e-3)


def test_jacobian_spectral_norm_linear():
    from pnpflow_tpu.training.denoiser import make_jacobian_spectral_norm

    a = 0.25

    def apply(params, x, sigma_vec):
        return a * x

    # Dg = (I - A - A(I-A)) x with A = a I -> factor (1-a)^2... compute:
    expected = abs(1 - a - a * (1 - a))
    jn = make_jacobian_spectral_norm(apply)
    lam = jn(None, jnp.ones((1, 4, 4, 1)), jnp.zeros((1,)),
             jax.random.PRNGKey(0), steps=20)
    assert np.allclose(np.asarray(lam), expected, atol=1e-3)


@pytest.mark.slow
def test_denoiser_train_step_descends(tmp_path):
    from pnpflow_tpu.training.denoiser import GradientStepTrainer
    from pnpflow_tpu.utils.config import CfgNode

    args = CfgNode(
        {
            "dataset": "synthetic",
            "model": "gradient_step",
            "dim_image": DIM,
            "num_channels": 1,
            "lr": 1e-3,
            "num_epoch": 1,
            "seed": 0,
            "output_root": str(tmp_path),
            "batch_size_train": 8,
        }
    )
    tr = GradientStepTrainer(args)
    state = tr.init_state()
    y = jax.random.normal(jax.random.PRNGKey(1), (8, DIM, DIM, 1)) * 0.3
    losses = []
    for i in range(10):
        state, loss, psnr = tr.train_step(
            state, y, 0.1, jax.random.PRNGKey(i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_sharded_train_step_matches_single_device(tiny):
    """Data-parallel sharded training step must produce the same update as
    the unsharded run (same key, deterministic sinkhorn coupling)."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from pnpflow_tpu.parallel.mesh import make_mesh

    m, params = tiny
    tx = optax.adam(1e-3)
    step = make_fm_train_step(m.apply, tx, coupling="ot",
                              ot_method="sinkhorn")
    x1 = jax.random.normal(jax.random.PRNGKey(5), (8, DIM, DIM, 1))
    key = jax.random.PRNGKey(6)

    state_ref = _state(params, tx)
    state_ref, loss_ref = step(state_ref, x1, key)

    mesh = make_mesh()
    repl = NamedSharding(mesh, P())
    dp = NamedSharding(mesh, P("data", None, None, None))
    state_sh = jax.device_put(_state(params, tx), repl)
    sharded_step = jax.jit(step, in_shardings=(repl, dp, repl),
                           out_shardings=(repl, repl))
    state_sh, loss_sh = sharded_step(
        state_sh, jax.device_put(x1, dp), jax.device_put(key, repl)
    )
    assert abs(float(loss_ref) - float(loss_sh)) < 1e-3
    a = jax.tree_util.tree_leaves(state_ref["params"])[0]
    b = jax.tree_util.tree_leaves(state_sh["params"])[0]
    assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_stochastic_euler_reduces_to_plain_euler(tiny):
    """sigma_var = 0 must reproduce deterministic Euler over t in [eps, 1]
    (vendored sampling.py:69-105)."""
    from pnpflow_tpu.training.flow_matching import euler_sample_stochastic

    m, params = tiny
    key = jax.random.PRNGKey(9)
    a = euler_sample_stochastic(
        m.apply, params, key, (2, DIM, DIM, 1), steps=8, sigma_var=0.0
    )
    # manual euler over the same shifted grid with the same init noise
    k0, _ = jax.random.split(key)
    x = jax.random.normal(k0, (2, DIM, DIM, 1))
    eps = 1e-3
    dt = 1.0 / 8
    for i in range(8):
        num_t = i / 8 * (1 - eps) + eps
        t = jnp.full((2,), num_t)
        x = x + dt * m.apply(params, x, t)
    assert np.allclose(np.asarray(a), np.asarray(x), atol=1e-5)


def test_stochastic_euler_sigma_changes_samples(tiny):
    from pnpflow_tpu.training.flow_matching import euler_sample_stochastic

    m, params = tiny
    key = jax.random.PRNGKey(9)
    a = euler_sample_stochastic(
        m.apply, params, key, (2, DIM, DIM, 1), steps=8, sigma_var=0.0
    )
    b = euler_sample_stochastic(
        m.apply, params, key, (2, DIM, DIM, 1), steps=8, sigma_var=0.5
    )
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert bool(jnp.isfinite(b).all())
