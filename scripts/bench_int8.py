"""int8 vs bf16 conv throughput at the bench U-Net's shapes (real TPU).

The v5e MXU runs int8 at 2x the bf16 rate (394 vs 197 TOPS); if the
3x3 convs — ~43% of the headline bench's device time — map onto it, an
opt-in quantized inference mode is worth building.  Times a 3x3 'same'
conv at each level shape of the bench VelocityUNet (effective batch 320)
in bf16 vs int8(+int32 accum, dequant to bf16), dispatch-amortized with
an in-jit scan (same methodology as bench_fir.py).

Usage: python scripts/bench_int8.py
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

N = int(os.environ.get("INT8_BATCH", 320))
ITERS = int(os.environ.get("INT8_LOOP_ITERS", 30))

SITES = [(64, 32), (32, 64), (16, 128), (8, 256)]


def conv_bf16(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv_int8(x, w_q, w_scale, x_scale):
    """Dynamic per-tensor activation quant + per-channel weight quant."""
    xq = jnp.clip(jnp.round(x / x_scale), -127, 127).astype(jnp.int8)
    acc = jax.lax.conv_general_dilated(
        xq, w_q, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * (x_scale * w_scale)).astype(x.dtype)


def timed_loop(fn, args, iters=ITERS, reps=3):
    """Dispatch-amortized per-call time (scripts/_bench_util.py)."""
    from _bench_util import timed_loop as _tl

    return _tl(fn, args, iters=iters, reps=reps)


def main():
    rng = np.random.default_rng(0)
    for h, c in SITES:
        x = jnp.asarray(rng.normal(size=(N, h, h, c)), jnp.bfloat16)
        w = jnp.asarray(
            rng.normal(size=(3, 3, c, c)) * (1.0 / np.sqrt(9 * c)),
            jnp.bfloat16,
        )
        w_f = np.asarray(w, np.float32)
        w_scale = jnp.asarray(
            np.abs(w_f).max(axis=(0, 1, 2)) / 127.0, jnp.float32
        )
        w_q = jnp.asarray(
            np.clip(np.round(w_f / np.asarray(w_scale)), -127, 127),
            jnp.int8,
        )
        x_scale = jnp.float32(3.0 / 127.0)

        row = {"site": f"{h}x{h}x{c}xN{N}"}
        try:
            row["bf16_us"] = round(timed_loop(conv_bf16, (x, w)) * 1e6, 1)
        except Exception as exc:  # noqa: BLE001
            row["bf16_us"] = "fail: {}".format(str(exc).splitlines()[0][:80])
        try:
            row["int8_us"] = round(
                timed_loop(conv_int8, (x, w_q, w_scale, x_scale)) * 1e6, 1
            )
        except Exception as exc:  # noqa: BLE001
            row["int8_us"] = "fail: {}".format(str(exc).splitlines()[0][:80])
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
