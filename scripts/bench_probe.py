"""Perf probe: isolate the headline bench's time sinks on the real TPU.

Times, at the bench protocol's shapes (64², batch 64, 5 MC samples folded
into the model batch):
  a) the pure jitted U-Net forward at batch 320 (the MFU ceiling),
  b) one full PnP step (physics + fold + forward + average),
  c) the scanned solver at a given unroll,
so solver overhead is separable from model-forward cost.  Use
BENCH_* env vars as in bench.py.  Prints one JSON line per measurement.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import pnpflow_tpu.utils.jax_setup  # noqa: F401

DIM = int(os.environ.get("BENCH_DIM", 64))
BATCH = int(os.environ.get("BENCH_BATCH", 64))
S = int(os.environ.get("BENCH_SAMPLES", 5))
UNROLL = int(os.environ.get("BENCH_UNROLL", 1))
STEPS = int(os.environ.get("BENCH_STEPS", 20))
UNET64_FWD_FLOPS = 12.431e9 * (DIM / 64) ** 2


def timed(fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))  # host read
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / reps


def main():
    from pnpflow_tpu.models.unet import VelocityUNet
    from pnpflow_tpu.ops.degradations import GaussianDeblurring
    from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver

    model = VelocityUNet(
        input_channels=3, input_height=DIM, ch=32, ch_mult=(1, 2, 4, 8),
        num_res_blocks=6, attn_resolutions=(16, 8), dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, DIM, DIM, 3)), jnp.zeros((1,))
    )

    flat_b = S * BATCH
    x_flat = jnp.asarray(
        np.random.default_rng(0).normal(size=(flat_b, DIM, DIM, 3)),
        jnp.bfloat16,
    )
    t_vec = jnp.full((flat_b,), 0.5, jnp.float32)

    fwd = jax.jit(model.apply)
    dt = timed(fwd, params, x_flat, t_vec)
    ips = BATCH / dt  # images/s at 5 fwd/image-step => per *step* batch
    mfu = (UNET64_FWD_FLOPS * flat_b / dt) / 197e12
    print(json.dumps({
        "probe": "pure_forward_b{}".format(flat_b),
        "sec": round(dt, 4),
        "mfu_v5e_bf16": round(mfu, 4),
        "equiv_images_per_sec_100steps": round(BATCH / (dt * 100), 3),
    }))

    op = GaussianDeblurring(1.0 if DIM == 128 else 1.0, 61, "fft", 3, DIM)
    solve = make_pnp_flow_solver(
        model.apply, op.H, op.H_adj, steps=100, num_samples=S, lr_pnp=1.0,
        gamma_style="alpha_1_minus_t", alpha=1.0, noise_type="gaussian",
        sigma_noise=0.05, unroll=UNROLL,
    )
    clean = jnp.asarray(
        np.tanh(np.random.default_rng(0).normal(size=(BATCH, DIM, DIM, 3)) * 0.4),
        jnp.float32,
    )
    @jax.jit
    def setup(clean, k):
        y = op.H(clean) + 0.05 * jax.random.normal(k, clean.shape)
        return y, op.H_adj(jnp.ones_like(y))

    y, x0 = setup(clean, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    start = jnp.asarray(0, jnp.int32)

    dt = timed(
        lambda: solve(params, y, x0, key, start, STEPS), reps=3
    )
    per_step = dt / STEPS
    print(json.dumps({
        "probe": "solver_steps{}_unroll{}".format(STEPS, UNROLL),
        "sec_per_step": round(per_step, 4),
        "images_per_sec_100steps": round(BATCH / (per_step * 100), 3),
        "mfu_v5e_bf16": round(
            (UNET64_FWD_FLOPS * flat_b / per_step) / 197e12, 4
        ),
    }))


if __name__ == "__main__":
    main()
