"""End-to-end mini pnp_flow runs on synthetic data, plus sharding
consistency: a data-parallel sharded batch must match the single-device
result (the rebuild's multi-chip guarantee)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pnpflow_tpu.models.unet import VelocityUNet
from pnpflow_tpu.ops.degradations import GaussianDeblurring, BoxInpainting
from pnpflow_tpu.solvers.base import ModelBundle
from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver, PnPFlow
from pnpflow_tpu.utils.config import CfgNode

DIM = 32


@pytest.fixture(scope="module")
def bundle():
    model = VelocityUNet(
        input_channels=3, input_height=DIM, ch=32, ch_mult=(1, 2),
        num_res_blocks=1, attn_resolutions=(16,),
    )
    x = jnp.zeros((1, DIM, DIM, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
    return ModelBundle(apply=model.apply, params=params, kind="ot")


def test_pnp_flow_scan_improves_psnr(bundle):
    """With a zero-output (init) model the denoiser D(z~,t)=z~ shrinks toward
    the interpolation; the data-fidelity steps must still pull x toward the
    measurement so PSNR improves over the init."""
    op = GaussianDeblurring(1.0, 9, "fft", 3, DIM)
    clean = jnp.asarray(
        np.tanh(
            np.random.default_rng(0).normal(size=(2, DIM, DIM, 3)) * 0.3
        ).astype(np.float32)
    )
    y = op.H(clean) + 0.05 * jax.random.normal(jax.random.PRNGKey(0), clean.shape)
    solve = make_pnp_flow_solver(
        bundle.apply, op.H, op.H_adj,
        steps=20, num_samples=2, lr_pnp=1.0, gamma_style="alpha_1_minus_t",
        alpha=1.0, noise_type="gaussian", sigma_noise=0.05,
    )
    x0 = op.H_adj(jnp.ones_like(y))
    x = solve(bundle.params, y, x0, jax.random.PRNGKey(1),
              jnp.asarray(0, dtype=jnp.int32), 20)
    assert x.shape == clean.shape
    assert bool(jnp.isfinite(x).all())
    mse0 = float(jnp.mean((x0 - clean) ** 2))
    mse = float(jnp.mean((x - clean) ** 2))
    assert mse < mse0


def test_sharded_batch_matches_single_device(bundle):
    """Data-parallel execution over the 8-device CPU mesh must agree with the
    unsharded run (same program, sharded batch)."""
    from pnpflow_tpu.parallel.mesh import make_mesh, shard_batch, replicate

    op = BoxInpainting(6, DIM)
    solve = make_pnp_flow_solver(
        bundle.apply, op.H, op.H_adj,
        steps=5, num_samples=2, lr_pnp=1.0, gamma_style="alpha_1_minus_t",
        alpha=1.0, noise_type="gaussian", sigma_noise=0.05,
    )
    y = jax.random.normal(jax.random.PRNGKey(2), (8, DIM, DIM, 3))
    x0 = op.H_adj(jnp.ones_like(y))
    key = jax.random.PRNGKey(3)
    start = jnp.asarray(0, dtype=jnp.int32)

    ref = solve(bundle.params, y, x0, key, start, 5)

    mesh = make_mesh()
    y_s = shard_batch(np.asarray(y), mesh)
    x0_s = shard_batch(np.asarray(x0), mesh)
    params_r = replicate(bundle.params, mesh)
    out = solve(params_r, y_s, x0_s, key, start, 5)
    # NOTE: MC noise is drawn per (sample, batch-element) from the same key,
    # so the program is identical; only the layout differs.
    assert np.allclose(np.asarray(ref), np.asarray(out), atol=1e-5)


def test_laplace_noise_path(bundle):
    op = BoxInpainting(6, DIM)
    solve = make_pnp_flow_solver(
        bundle.apply, op.H, op.H_adj,
        steps=3, num_samples=1, lr_pnp=1.0, gamma_style="constant",
        alpha=1.0, noise_type="laplace", sigma_noise=0.3,
    )
    y = jax.random.normal(jax.random.PRNGKey(4), (2, DIM, DIM, 3))
    x0 = op.H_adj(jnp.ones_like(y))
    x = solve(bundle.params, y, x0, jax.random.PRNGKey(5),
              jnp.asarray(0, dtype=jnp.int32), 3)
    assert bool(jnp.isfinite(x).all())


@pytest.mark.slow
def test_full_solver_class_with_reporting(tmp_path, bundle):
    """PnPFlow.run_method writes the reference's txt layout."""
    args = CfgNode(
        dict(
            steps_pnp=10, lr_pnp=1.0, gamma_style="alpha_1_minus_t",
            num_samples=2, alpha=1.0, noise_type="gaussian",
            problem="inpainting", method="pnp_flow", eval_split="test",
            max_batch=2, batch_size_ip=2, save_results=True,
            compute_time=True, compute_memory=True, output_root=str(tmp_path),
            dataset="synthetic", model="ot",
            dict_cfg_method={"steps_pnp": 10, "lr_pnp": 1.0},
            save_path=str(tmp_path / "results"),
        )
    )
    os.makedirs(args.save_path, exist_ok=True)
    op = BoxInpainting(6, DIM)

    rng = np.random.default_rng(0)
    batches = [
        (rng.normal(size=(2, DIM, DIM, 3)).astype(np.float32), np.zeros(2))
        for _ in range(2)
    ]
    loaders = {"test": batches}

    solver = PnPFlow(bundle, args)
    solver.run_method(loaders, op, 0.05)

    ip_dir = os.path.join(args.save_path, "steps_pnp=10", "lr_pnp=1.0")
    for fname in [
        "psnr_rec_batch0.txt", "psnr_noisy_batch1.txt", "ssim_rec_batch0.txt",
        "psnr_rec_average.txt", "ssim_rec_average.txt",
        "time_stats.txt", "memory_stats.txt",
        "time_average.txt", "max_memory_average.txt",
    ]:
        assert os.path.exists(os.path.join(ip_dir, fname)), fname
    for fname in ["final_psnr.txt", "final_ssim.txt"]:
        assert os.path.exists(os.path.join(args.save_path, fname)), fname
    # final table header row names the method hyperparameters
    with open(os.path.join(args.save_path, "final_psnr.txt")) as f:
        header = f.readline().split()
    assert header == ["psnr_rec", "psnr_noisy", "steps_pnp", "lr_pnp"]
    # memory stat lines must say which measurement path produced them
    # (round-4 VERDICT Weak #4: the live-array fallback is a lower bound
    # and must be distinguishable from true device peak counters)
    import ast

    with open(os.path.join(ip_dir, "memory_stats.txt")) as f:
        rec = ast.literal_eval(f.readline().strip())
    assert rec["source"] in ("device_memory_stats", "live_array_fallback")


def test_solve_ip_stops_at_dataset_end(bundle):
    """max_batch beyond the split must end gracefully like the reference's
    enumerate+break loop (pnp_flow.py:70-75), not raise StopIteration."""
    args = CfgNode(
        dict(
            steps_pnp=2, lr_pnp=1.0, gamma_style="constant", num_samples=1,
            alpha=1.0, noise_type="gaussian", problem="inpainting",
            save_results=False, compute_time=False, compute_memory=False,
            max_batch=7,
        )
    )
    op = BoxInpainting(6, DIM)
    rng = np.random.default_rng(1)
    batches = [
        (rng.normal(size=(2, DIM, DIM, 3)).astype(np.float32), np.zeros(2))
        for _ in range(2)
    ]
    solver = PnPFlow(bundle, args)
    solver.solve_ip(batches, op, 0.05)
    assert args.batch == 1  # only the 2 real batches ran


@pytest.mark.slow
def test_solver_cache_invalidated_on_physics_change(bundle):
    """Reusing one solver instance with a different degradation or sigma must
    rebuild the compiled program, not silently reuse the old physics
    (library-use correctness; the CLI only ever calls it once)."""
    args = CfgNode(
        dict(
            steps_pnp=4, lr_pnp=1.0, gamma_style="alpha_1_minus_t",
            num_samples=2, alpha=1.0, noise_type="gaussian",
            problem="inpainting", save_results=False,
        )
    )
    rng = np.random.default_rng(0)
    clean = jnp.asarray(
        np.tanh(rng.normal(size=(2, DIM, DIM, 3)) * 0.3).astype(np.float32)
    )

    op_a = BoxInpainting(6, DIM)
    op_b = GaussianDeblurring(1.0, 9, "fft", 3, DIM)

    reused = PnPFlow(bundle, args)
    fresh_a = PnPFlow(bundle, args)
    fresh_b = PnPFlow(bundle, args)

    def run(solver, op, sigma):
        y = op.H(clean)  # noiseless measurement keeps this deterministic
        x, _ = solver.solve_batch(clean, y, op, sigma, batch=0)
        return np.asarray(x)

    # same instance: physics A, then physics B, then A at a different sigma
    out_a = run(reused, op_a, 0.05)
    out_b = run(reused, op_b, 0.05)
    out_a2 = run(reused, op_a, 0.2)

    np.testing.assert_allclose(out_a, run(fresh_a, op_a, 0.05), rtol=1e-6)
    np.testing.assert_allclose(out_b, run(fresh_b, op_b, 0.05), rtol=1e-6)
    fresh_a2 = PnPFlow(bundle, args)
    np.testing.assert_allclose(out_a2, run(fresh_a2, op_a, 0.2), rtol=1e-6)


def test_multihost_helpers_single_process():
    """init_distributed is a safe no-op off-pod; slice/assembly helpers
    reduce to the single-host behavior on one process."""
    from pnpflow_tpu.parallel.mesh import (
        init_distributed,
        make_mesh,
        process_batch_slice,
        shard_batch_multihost,
    )

    assert init_distributed() is False  # single process
    mesh = make_mesh(4)
    start, size = process_batch_slice(8, mesh)
    assert (start, size) == (0, 8)
    local = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    arr = shard_batch_multihost(local, mesh, 8)
    assert arr.shape == (8, 4, 4, 3)
    np.testing.assert_allclose(np.asarray(arr), local)
