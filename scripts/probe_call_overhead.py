"""Probe: per-Execute overhead of compiled programs through the tunnel.

Times (a) a trivial jitted elementwise fn on the 256² batch, (b) a single
NCSN++ 256² forward, (c) the 1-step pnp_flow solve — each as N chained
calls with a host read only at the end.  Separates per-call dispatch cost
from device compute to localize the ~12 s/call overhead seen in
bench_256 (call_overhead + k*step model from the 10/40-step runs).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import pnpflow_tpu.utils.jax_setup  # noqa: F401


def timed_calls(fn, x, reps):
    out = fn(x)
    float(jax.jit(jnp.mean)(out))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(out)
    float(jax.jit(jnp.mean)(out))
    return (time.perf_counter() - t0) / reps


def main():
    from pnpflow_tpu.models.ncsnpp import NCSNpp
    from pnpflow_tpu.ops.degradations import GaussianDeblurring
    from pnpflow_tpu.solvers.pnp_flow import make_pnp_flow_solver

    DIM = 256
    B = 2
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(B, DIM, DIM, 3)), jnp.float32
    )

    triv = jax.jit(lambda v: v * 1.0001 + 0.001)
    print("trivial elementwise: %.4f s/call" % timed_calls(triv, x, 10),
          flush=True)

    model = NCSNpp(image_size=DIM, num_channels=3, dtype=jnp.bfloat16)
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, DIM, DIM, 3)),
            jnp.full((1,), 500.0),
        )
    params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    fwd = jax.jit(
        lambda v: model.apply(params, v, jnp.full((v.shape[0],), 500.0))
    )
    print("ncsnpp fwd (params CLOSED OVER, device): %.4f s/call"
          % timed_calls(fwd, x, 5), flush=True)

    fwd2 = jax.jit(
        lambda p, v: model.apply(p, v, jnp.full((v.shape[0],), 500.0))
    )

    def fwd2c(v):
        return fwd2(params, v)

    print("ncsnpp fwd (params AS ARG, device): %.4f s/call"
          % timed_calls(fwd2c, x, 5), flush=True)

    # the laundering candidate: a device-CREATED copy (jit identity output)
    # instead of a device_put-committed one — if this is fast, the fix for
    # the ~1 s/call arg re-streaming belongs in build_model_bundle
    laundered = jax.jit(lambda p: p)(params)
    jax.block_until_ready(laundered)

    def fwd2l(v):
        return fwd2(laundered, v)

    print("ncsnpp fwd (params LAUNDERED via jit identity): %.4f s/call"
          % timed_calls(fwd2l, x, 5), flush=True)

    deg = GaussianDeblurring(sigma_blur=3.0, kernel_size=61, dim_image=DIM)
    solve = make_pnp_flow_solver(
        lambda p, v, t: model.apply(p, v, t * 999.0), deg.H, deg.H_adj,
        steps=100, num_samples=1, lr_pnp=1.0, gamma_style="alpha_1_minus_t",
        alpha=1.0, noise_type="gaussian", sigma_noise=0.05,
    )

    @jax.jit
    def prep(c):
        y = deg.H(c)
        return y, deg.H_adj(jnp.ones_like(y))

    y, x0 = prep(x)
    key = jax.random.PRNGKey(0)
    zero = jnp.int32(0)

    def one(v):
        return solve(params, y, v, key, zero, 1)

    print("pnp_flow solve 1-step: %.4f s/call" % timed_calls(one, x0, 5),
          flush=True)


if __name__ == "__main__":
    main()
