"""256² rectified-path restoration throughput on the real TPU.

Runs the pnp_flow solver with the live NCSN++ 256² architecture
(celeba_hq config: nf=128, ch_mult (1,1,2,2,2,2,2), biggan/FIR/
output_skip) in bf16 on Gaussian deblurring — the CelebA-HQ/AFHQ
protocol — and reports images/sec/chip.  Random-init weights: throughput
is architecture-, not weight-, dependent.

Knobs: B256 batch (default 2), STEPS256 PnP steps (default 10, scaled to
the full 100-step protocol in the report), MC256 num_samples (default 1 —
the 256² HBM budget does not fit the 64² protocol's 5 MC samples times
batch in one forward; the solver folds MC into the batch dim).

Usage: python scripts/bench_256.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pnpflow_tpu.utils.jax_setup  # noqa: F401

B = int(os.environ.get("B256", 2))
STEPS = int(os.environ.get("STEPS256", 10))
MC = int(os.environ.get("MC256", 1))
DIM = 256


def main():
    from pnpflow_tpu.models.ncsnpp import NCSNpp
    from pnpflow_tpu.ops.degradations import GaussianDeblurring
    from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver

    model = NCSNpp(image_size=DIM, num_channels=3, dtype=jnp.bfloat16)
    x0 = np.zeros((1, DIM, DIM, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x0), jnp.full((1,), 500.0)
        )
    # CRITICAL through the tunnel: params must be device-CREATED, not just
    # device_put-committed — host-committed pytrees are re-streamed
    # host->device on EVERY Execute (~0.9 s/call for these 250 MB of
    # weights; ~33 ms once laundered — scripts/probe_call_overhead.py).
    from pnpflow_tpu.utils.jax_setup import commit_tree

    params = commit_tree(params)

    # the rectified backend scales t by 999 (models/registry.py:136-143)
    def apply(p, x, t):
        return model.apply(p, x, t * 999.0)

    deg = GaussianDeblurring(sigma_blur=3.0, kernel_size=61, dim_image=DIM)
    solve = make_pnp_flow_solver(
        apply, deg.H, deg.H_adj,
        steps=100, num_samples=MC, lr_pnp=1.0,
        gamma_style="alpha_1_minus_t", alpha=1.0,
        noise_type="gaussian", sigma_noise=0.05,
    )

    rng = np.random.default_rng(0)
    clean = jnp.asarray(rng.normal(size=(B, DIM, DIM, 3)), jnp.float32)
    noise = jnp.asarray(rng.normal(size=(B, DIM, DIM, 3)), jnp.float32)

    # measurement prep must be JITTED: eager fft2 at 256² is Unimplemented
    # on the tunneled TPU backend (fails asynchronously — the error only
    # surfaces at the next host read, here the warmup's jnp.mean)
    @jax.jit
    def prep(c, n):
        y = deg.H(c) + 0.05 * n
        return y, deg.H_adj(jnp.ones_like(y))

    y, x_init = prep(clean, noise)
    key = jax.random.PRNGKey(0)

    # Timing hygiene through the tunnel (each rule measured to matter):
    #  * NO eager ops inside the timed region — an eager fold_in/mean is a
    #    remote round-trip costing seconds; precompute keys and jit the
    #    sync reduce.
    #  * force a device->host READ for the sync: block_until_ready alone
    #    can return early on this backend.
    reps = int(os.environ.get("REPS256", 3))
    keys = [jax.random.fold_in(key, r) for r in range(reps + 1)]
    reduce = jax.jit(jnp.mean)
    zero = jnp.int32(0)

    # Same per-compile backend-option hook as bench.py (libtpu-only flags
    # are rejected by the client-side XLA_FLAGS parser): both step counts
    # of the two-point fit are pre-compiled with the requested options.
    copts = os.environ.get("BENCH_COMPILER_OPTS", "")
    if copts:
        opts = dict(kv.split("=", 1) for kv in copts.split(","))
        uncompiled = solve
        compiled = {
            n: solve.lower(
                params, y, x_init, keys[0], zero, n
            ).compile(compiler_options=opts)
            for n in (STEPS, 4 * STEPS)
        }
        solve = lambda p, yy, x, k, s, n: compiled[n](p, yy, x, k, s)
        solve.lower = uncompiled.lower  # keep cost_analysis working

    def timed(n_steps, seed_off):
        out = solve(params, y, x_init, keys[0], zero, n_steps)  # warm/compile
        float(reduce(out))
        t0 = time.perf_counter()
        for r in range(reps):
            # data dependency chains the reps so they serialize
            out = solve(params, y, out, keys[r + 1], zero, n_steps)
        float(reduce(out))
        return (time.perf_counter() - t0) / reps

    # Two-point fit: per-step device time = slope between a SHORT and a
    # LONG call, so any fixed per-dispatch cost (tunnel Execute latency)
    # drops out of the reported number.  Tunnel latency SPIKES (measured
    # 1.7 s..9.5 s/Execute across days) can poison a single fit — take the
    # MIN over `trials` independent measurements of each point; min is the
    # estimator robust to one-sided latency noise.
    trials = int(os.environ.get("TRIALS256", 3))
    lo, hi = STEPS, 4 * STEPS
    t_lo = min(timed(lo, 0) for _ in range(trials))
    t_hi = min(timed(hi, reps) for _ in range(trials))
    per_step = (t_hi - t_lo) / (hi - lo)
    overhead = t_lo - per_step * lo

    # FLOP accounting from the compiled executable (XLA cost analysis of
    # the lo-step scan), so the MFU number uses the program's own count
    # rather than an analytic estimate.  v5e bf16 peak: 197 TFLOP/s.
    flops_per_step = mfu = None
    try:
        ca = solve.lower(
            params, y, x_init, keys[0], zero, lo
        ).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        total_flops = float(ca.get("flops", 0.0))
        if total_flops > 0:
            flops_per_step = total_flops / lo
            mfu = flops_per_step / per_step / 197e12
    except Exception as e:  # cost analysis is best-effort on this runtime
        print("cost_analysis unavailable:", e, file=sys.stderr)

    # PROFILE256=<dir>: capture a device trace of one hi-step solve for
    # scripts/profile_report.py (the 256² path had no trace before round 5)
    prof_dir = os.environ.get("PROFILE256")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
        out = solve(params, y, x_init, keys[0], zero, hi)
        float(reduce(out))
        jax.profiler.stop_trace()
        print("trace written to", prof_dir, file=sys.stderr)

    full_protocol = per_step * 100  # the shipped config runs 100 steps
    rec = {
        "probe": "pnp_flow_ncsnpp256_deblur_bf16",
        "batch": B, "mc_samples": MC, "steps_lo_hi": [lo, hi],
        "sec_per_step": round(per_step, 4),
        "per_call_overhead_sec": round(overhead, 4),
        "images_per_sec_100step_protocol": round(B / full_protocol, 3),
    }
    if mfu is not None:
        rec["gflops_per_step"] = round(flops_per_step / 1e9, 1)
        rec["mfu_vs_197tflops_bf16"] = round(mfu, 4)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
