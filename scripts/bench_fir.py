"""FIR backend shootout + NCSN++ 256² throughput on the real TPU.

Times upsample_2d / downsample_2d (k = [1,3,3,1], the live NCSN++ FIR,
celeba_hq config:57) with the XLA one-conv formulation vs the Pallas VPU
kernel at the shapes the 256² rectified path actually resamples
(ncsnpp.py down/up path + input/output pyramids), then times a full
NCSN++ forward at 256² in bf16.  Prints one JSON line per measurement.

Usage: python scripts/bench_fir.py [--skip-model]
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

B = int(os.environ.get("FIR_BATCH", 4))

# (H, C, direction) resample sites in the live 256² NCSN++ (nf=128,
# ch_mult (1,1,2,2,2,2,2)): BigGAN blocks resample at every level change,
# the input pyramid downsamples 3-channel images, the output pyramid
# upsamples 3-channel images.
SITES = [
    (256, 128, "down"), (128, 128, "down"), (64, 256, "down"),
    (32, 256, "down"), (16, 256, "down"), (8, 256, "down"),
    (8, 256, "up"), (16, 256, "up"), (32, 256, "up"),
    (64, 256, "up"), (128, 128, "up"), (256, 3, "down"), (4, 3, "up"),
]


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / reps


LOOP_ITERS = int(os.environ.get("FIR_LOOP_ITERS", 200))


def timed_loop(fn, x, iters=None, reps=3):
    """Dispatch-amortized per-call time (scripts/_bench_util.py)."""
    from _bench_util import timed_loop as _tl

    return _tl(fn, (x,), iters=LOOP_ITERS if iters is None else iters,
               reps=reps)


def main():
    from pnpflow_tpu.ops import upfirdn
    from pnpflow_tpu.ops.upfirdn import downsample_2d, upsample_2d

    k = [1.0, 3.0, 3.0, 1.0]
    results = []
    for h, c, direction in SITES:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(B, h, h, c)), jnp.bfloat16
        )
        row = {"site": f"{direction}{h}x{h}x{c}"}
        for backend in ("xla", "pallas"):
            upfirdn.set_fir_backend(backend)
            fn = upsample_2d if direction == "up" else downsample_2d
            try:
                dt = timed_loop(lambda t, fn=fn: fn(t, k=k, factor=2), x)
                row[backend + "_us"] = round(dt * 1e6, 1)
            except Exception as exc:  # noqa: BLE001
                row[backend + "_us"] = "fail: {}".format(
                    str(exc).splitlines()[0][:80]
                )
        print(json.dumps(row), flush=True)
        results.append(row)
    upfirdn.set_fir_backend("xla")

    wins = sum(
        1 for r in results
        if isinstance(r.get("pallas_us"), float)
        and isinstance(r.get("xla_us"), float)
        and r["pallas_us"] < r["xla_us"]
    )
    print(json.dumps({"pallas_wins": wins, "sites": len(results)}), flush=True)

    if "--skip-model" in sys.argv:
        return

    from pnpflow_tpu.models.ncsnpp import NCSNpp

    model = NCSNpp(image_size=256, num_channels=3, dtype=jnp.bfloat16)
    x = jnp.asarray(
        np.random.default_rng(1).normal(size=(B, 256, 256, 3)), jnp.float32
    )
    t999 = jnp.full((B,), 500.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1], t999[:1])
    fwd = jax.jit(model.apply)
    dt = timed(fwd, params, x, t999, reps=3)
    print(json.dumps({
        "probe": "ncsnpp256_forward_bf16_b{}".format(B),
        "sec": round(dt, 4),
        "images_per_sec": round(B / dt, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
