"""GroupNorm backend shootout on the real TPU.

The headline-bench trace (BASELINE.md) attributes ~49% of device time to
the XLA GroupNorm stats/normalize passes over batch-minor activations.
This times a conv -> GroupNorm(+swish) -> conv chain — the conv producers/
consumers make XLA assign the same batch-minor activation layouts as in
the real U-Net — at the four level shapes of the bench model (effective
batch 320 = 64 images x 5 MC samples), for each norm implementation:

  xla   nn.GroupNorm + swish (the shipping default)
  bm    ops/pallas_kernels.py:groupnorm_swish_bm (batch-minor kernel)
  cmin  ops/pallas_kernels.py:groupnorm_swish (C-minor kernel; known-bad)

Dispatch overhead (~6 ms/call through the tunnel) is amortized with an
in-jit lax.scan, same methodology as scripts/bench_fir.py:timed_loop.

Usage: GN_IMPLS=xla,bm python scripts/bench_gn.py
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

N = int(os.environ.get("GN_BATCH", 320))
ITERS = int(os.environ.get("GN_LOOP_ITERS", 50))
IMPLS = os.environ.get("GN_IMPLS", "xla,bm").split(",")

# (H, C) activation shapes of the bench VelocityUNet levels
# (ch=32, ch_mult (1,2,4,8) at 64²)
SITES = [(64, 32), (32, 64), (16, 128), (8, 256)]


def make_chain(impl, c):
    import flax.linen as nn

    from pnpflow_tpu.ops.pallas_kernels import (
        groupnorm_swish,
        groupnorm_swish_bm,
    )

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16,
                        name="conv_in")(x)
            if impl == "xla":
                h = nn.GroupNorm(num_groups=32, epsilon=1e-6,
                                 dtype=jnp.bfloat16, name="gn")(h)
                h = nn.swish(h)
            else:
                scale = self.param("scale", nn.initializers.ones, (c,))
                bias = self.param("bias", nn.initializers.zeros, (c,))
                fn = groupnorm_swish_bm if impl == "bm" else groupnorm_swish
                h = fn(h, scale, bias, 32, 1e-6, True)
            return nn.Conv(c, (3, 3), padding=1, dtype=jnp.bfloat16,
                           name="conv_out")(h)

    return Chain()


def timed_loop(apply_fn, params, x, iters=ITERS, reps=3):
    """Dispatch-amortized per-call time (scripts/_bench_util.py)."""
    from _bench_util import timed_loop as _tl

    return _tl(apply_fn, (params, x), iters=iters, reps=reps,
               perturb_idx=1)


def main():
    for h, c in SITES:
        x = jnp.asarray(
            np.random.default_rng(0).normal(size=(N, h, h, c)), jnp.bfloat16
        )
        row = {"site": f"{h}x{h}x{c}xN{N}"}
        for impl in IMPLS:
            model = make_chain(impl, c)
            params = model.init(jax.random.PRNGKey(0), x)
            try:
                dt = timed_loop(model.apply, params, x)
                row[impl + "_us"] = round(dt * 1e6, 1)
            except Exception as exc:  # noqa: BLE001
                row[impl + "_us"] = "fail: {}".format(
                    str(exc).splitlines()[0][:100]
                )
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
