"""Headline benchmark: images/sec/chip restored with pnp_flow (CelebA 64²).

Protocol (BASELINE.md / BASELINE.json): full pnp_flow restoration — 100 PnP
steps x 5 Monte-Carlo U-Net forwards per step (500 forwards per image, the
reference's tuned config, config/method_config/pnp_flow.yaml) — on 64x64x3
images with the standard velocity U-Net (ch=32, mult (1,2,4,8), 6 res blocks,
attn@16/8; reference utils.py:170-180), Gaussian FFT deblurring physics.

The whole restoration is ONE jitted lax.scan resident in HBM; the 5 MC
samples are folded into the batch dimension so the MXU sees S*B-image
batches.  Compute dtype bf16 (params fp32), the TPU fast path.

Baseline: the reference publishes no numbers (SURVEY.md §6).  The A100
PyTorch baseline used for ``vs_baseline`` is an analytic estimate, recorded
here so it is reproducible: the same 500 fp32 U-Net forwards per image at
the reference's measured per-forward FLOPs, assuming the A100 sustains 25%
of its 156 TFLOP/s TF32 peak on this small-conv research U-Net (generous —
DataParallel-free single-GPU eager PyTorch on 64² images with GroupNorm and
single-head attention typically lands below that).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

import pnpflow_tpu.utils.jax_setup  # noqa: F401  (persistent compile cache)


import os

DIM = 64
# batch 64 + bf16 GroupNorm measured fastest on v5e (9.78 -> 11.94 img/s
# over batch 32 + fp32 norm; batch 128 regresses to 10.69)
BATCH = int(os.environ.get("BENCH_BATCH", 64))
STEPS = 100
NUM_SAMPLES = 5
NORM_BF16 = os.environ.get("BENCH_NORM_BF16", "1") == "1"
UNROLL = int(os.environ.get("BENCH_UNROLL", 1))
# Alternative GroupNorm formulations.  All measured SLOWER end to end than
# XLA's own fusion (BASELINE.md): "cmin"/"1" C-minor Pallas kernel 3.0
# img/s (full-tensor transposes around every norm), "bm" batch-minor
# Pallas kernel 6.99 img/s (copies + lost fusion at the custom-call
# boundary), "dot" MXU-matmul statistics 10.79 img/s (x² materialization),
# "conv" fused Pallas conv3x3+GN-epilogue 3.59 img/s (a Pallas conv can't
# match XLA's conv emitter at these shapes).
# "0" (default): plain XLA, 11.95 img/s.
_fused_env = os.environ.get("BENCH_FUSED_NORM", "0")
FUSED_NORM = {"0": False, "1": True}.get(_fused_env, _fused_env)
# 'rbg' uses the TPU's hardware RNG for the per-step MC noise instead of
# software threefry (5*B*64*64*3 normals per scan step); the solver
# inherits whichever impl the passed key carries.
RNG_IMPL = os.environ.get("BENCH_RNG", "threefry2x32")


# One U-Net forward at batch 1, 64x64: 12.431 GFLOP (measured once via
# XLA cost_analysis of the jitted forward on CPU; 35.3M params).  Kept as a
# constant so the benchmark itself doesn't pay an extra remote compile.
UNET64_FWD_FLOPS = 12.431e9


def main():
    from pnpflow_tpu.models.unet import VelocityUNet
    from pnpflow_tpu.ops.degradations import GaussianDeblurring
    from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver

    model = VelocityUNet(
        input_channels=3, input_height=DIM, ch=32, ch_mult=(1, 2, 4, 8),
        num_res_blocks=6, attn_resolutions=(16, 8), dtype=jnp.bfloat16,
        norm_dtype=jnp.bfloat16 if NORM_BF16 else None,
        fused_norm=FUSED_NORM,
    )
    x0 = jnp.zeros((1, DIM, DIM, 3))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,)))

    op = GaussianDeblurring(1.0, 61, "fft", 3, DIM)
    solve = make_pnp_flow_solver(
        model.apply, op.H, op.H_adj,
        steps=STEPS, num_samples=NUM_SAMPLES, lr_pnp=1.0,
        gamma_style="alpha_1_minus_t", alpha=1.0,
        noise_type="gaussian", sigma_noise=0.05, unroll=UNROLL,
    )

    rng = np.random.default_rng(0)
    clean = jnp.asarray(
        np.tanh(rng.normal(size=(BATCH, DIM, DIM, 3)) * 0.4), dtype=jnp.float32
    )

    @jax.jit
    def setup(clean, key):
        y = op.H(clean) + 0.05 * jax.random.normal(key, clean.shape)
        return y, op.H_adj(jnp.ones_like(y))

    y, x_init = setup(clean, jax.random.PRNGKey(0))
    key = jax.random.key(1, impl=RNG_IMPL)
    start = jnp.asarray(0, dtype=jnp.int32)

    # TPU-backend compiler options (libtpu-only flags are rejected by the
    # client-side XLA_FLAGS parser, so they must ride the compile call),
    # override via BENCH_COMPILER_OPTS="k=v,..." (BENCH_COMPILER_OPTS=""
    # restores the compiler defaults).  Shipping default: rwb
    # (reduce-window-broadcast) fusion OFF — the round-5 flag sweep
    # measured 12.556 img/s vs 11.95 with the default fusion pipeline
    # (+5.1%, reproduced twice, the only lever of 14 A/Bs across four
    # rounds that beat the plateau): the GN moment reduces that dominate
    # the step (49% of time, BASELINE.md round-2 trace) schedule better
    # unfused from their broadcast consumers on this toolchain.
    copts = os.environ.get(
        "BENCH_COMPILER_OPTS", "xla_tpu_rwb_fusion=false"
    )
    if copts:
        opts = dict(kv.split("=", 1) for kv in copts.split(","))
        compiled = solve.lower(
            params, y, x_init, key, start, STEPS
        ).compile(compiler_options=opts)
        solve = lambda p, y, x, k, s, n_iters: compiled(p, y, x, k, s)

    # warmup / compile — use the same static step count as the timed run so
    # only ONE program is compiled (remote compiles are expensive).  Force a
    # device->host read: on a tunneled TPU, block_until_ready alone can
    # return before execution finishes.
    # NOTE: keep this call POSITIONAL and identical in form to the timed
    # calls below — binding the static arg by keyword here once created a
    # second jit cache entry, so the timed loop retraced and measured 7.9
    # instead of 11.96 img/s.
    # Timing hygiene (same rules as bench_256.py): nothing eager inside the
    # timed region — fold_in keys are precomputed and the sync reduce is
    # jitted, so each eager-op tunnel round-trip stays out of the clock.
    reps = 3
    keys = [jax.random.fold_in(key, r) for r in range(reps)]
    reduce = jax.jit(jnp.mean)

    out = solve(params, y, x_init, key, start, STEPS)
    float(reduce(out))

    t0 = time.perf_counter()
    for r in range(reps):
        # chain reps through a data dependency so they serialize
        out = solve(params, y, out, keys[r], start, STEPS)
    float(reduce(out))  # materialize on host
    dt = (time.perf_counter() - t0) / reps
    ips = BATCH / dt

    # analytic A100 fp32 baseline (see module docstring)
    a100_sustained = 0.25 * 156e12
    a100_ips = a100_sustained / (UNET64_FWD_FLOPS * STEPS * NUM_SAMPLES)

    print(json.dumps({
        "metric": "pnp_flow_celeba64_images_per_sec_per_chip",
        "value": round(ips, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(ips / a100_ips, 3),
    }))


if __name__ == "__main__":
    main()
