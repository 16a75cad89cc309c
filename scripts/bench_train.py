"""FM training throughput on the real TPU: images/sec/chip per coupling.

Times the jitted flow-matching train step (fwd+bwd+Adam+EMA on the 35M-param
flagship U-Net, reference train_flow_matching.py:51-114) at 64² for the
three coupling modes the framework ships:

  * indep     — independent coupling, all on device
  * sinkhorn  — on-device entropic OT pairing inside the jitted step
  * exact     — host C++ LAP (Jonker-Volgenant) pairing BETWEEN steps
                (csrc/lap.cpp; the parity-exact mode) — timed end-to-end,
                host pairing + transfers included

Device-only modes time a chained ``lax.scan`` of train steps (state is the
carry — a real data dependency, so the tunnel's per-dispatch cost
amortizes); the exact mode must alternate host/device so it is timed over
sequential steps with a host read per step, reflecting real training.

Knobs: BT_BATCH (default 32 — batch 64 fp32 exceeds the v5e HBM without
remat, see verify skill), BT_DIM (image size, default 64; 128 is the
reference's celeba training geometry, train_flow_matching.py:216-249),
BT_REMAT (1 wraps the model in jax.checkpoint for tight-HBM geometries),
BT_STEPS (scan length, default 10), BT_REPS.

Usage: python scripts/bench_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import pnpflow_tpu.utils.jax_setup  # noqa: F401

BATCH = int(os.environ.get("BT_BATCH", 32))
STEPS = int(os.environ.get("BT_STEPS", 10))
REPS = int(os.environ.get("BT_REPS", 3))
DIM = int(os.environ.get("BT_DIM", 64))
REMAT = bool(int(os.environ.get("BT_REMAT", "0")))


def main():
    from pnpflow_tpu.models.unet import VelocityUNet
    from pnpflow_tpu.training.flow_matching import (
        make_fm_train_step, make_fm_train_step_precoupled)
    from pnpflow_tpu.ops.ot import host_ot_pair

    model = VelocityUNet(
        input_channels=3, input_height=DIM, ch=32, ch_mult=(1, 2, 4, 8),
        num_res_blocks=6, attn_resolutions=(16, 8),
    )
    x0 = np.zeros((1, DIM, DIM, 3), np.float32)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.asarray(x0), jnp.zeros((1,))
        )
    tx = optax.adam(1e-4)

    rng = np.random.default_rng(0)
    x1_np = rng.normal(size=(BATCH, DIM, DIM, 3)).astype(np.float32)
    x1 = jnp.asarray(x1_np)

    def apply(p, x, t):
        return model.apply(p, x, t)

    results = {}

    # --- device-only couplings: chained scan of train steps ---------------
    for coupling in ("indep", "sinkhorn"):
        step = make_fm_train_step(
            apply, tx, coupling="ot" if coupling == "sinkhorn" else "indep",
            ot_method="sinkhorn", remat=REMAT,
        )

        @jax.jit
        def run(state, x1, key):
            def body(carry, i):
                st, _ = carry
                st, loss = step(st, x1, jax.random.fold_in(key, i))
                return (st, loss), None

            (state, loss), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)), jnp.arange(STEPS)
            )
            return state, loss

        state = {
            "params": params, "opt_state": tx.init(params),
            "ema": params, "step": jnp.int32(0),
        }
        key = jax.random.PRNGKey(0)
        state, loss = run(state, x1, key)          # compile + warmup
        float(loss)
        best = float("inf")
        for r in range(REPS):
            t0 = time.perf_counter()
            state, loss = run(state, x1, jax.random.fold_in(key, r))
            float(loss)                            # host read = sound timer
            best = min(best, (time.perf_counter() - t0) / STEPS)
        results[coupling] = BATCH / best

    # --- exact host-LAP coupling: sequential steps, host pairing ----------
    step_pc = jax.jit(make_fm_train_step_precoupled(apply, tx, remat=REMAT))
    state = {
        "params": params, "opt_state": tx.init(params),
        "ema": params, "step": jnp.int32(0),
    }
    key = jax.random.PRNGKey(1)
    x0_np = rng.normal(size=(BATCH, DIM, DIM, 3)).astype(np.float32)
    i0, i1 = host_ot_pair(x0_np, x1_np, rng)
    state, loss = step_pc(
        state, jnp.asarray(x0_np[i0]), jnp.asarray(x1_np[i1]), key
    )
    float(loss)                                    # compile + warmup
    best = float("inf")
    for r in range(REPS):
        t0 = time.perf_counter()
        for s in range(STEPS):
            k = jax.random.fold_in(key, r * STEPS + s)
            x0_np = rng.normal(size=(BATCH, DIM, DIM, 3)).astype(np.float32)
            i0, i1 = host_ot_pair(x0_np, x1_np, rng)
            state, loss = step_pc(
                state, jnp.asarray(x0_np[i0]), jnp.asarray(x1_np[i1]), k
            )
        float(loss)
        best = min(best, (time.perf_counter() - t0) / STEPS)
    results["exact_host_lap"] = BATCH / best

    print(json.dumps({
        "probe": "fm_train_step_unet{}".format(DIM),
        "batch": BATCH, "steps_timed": STEPS, "remat": REMAT,
        "images_per_sec": {k: round(v, 2) for k, v in results.items()},
    }), flush=True)


if __name__ == "__main__":
    main()
