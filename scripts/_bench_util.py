"""Shared dispatch-amortized timing for the scripts/bench_*.py suite.

A single dispatch through the remote-TPU tunnel costs ~6 ms — more than
most kernels under test — so per-call timing measures the tunnel, not the
op.  ``timed_loop`` runs ``iters`` sequential applications inside ONE jit
via lax.scan, chained through a scalar carry (a ~1e-30-scaled full sum:
negligible numerically, but a real data dependency so XLA cannot
dead-code or parallelize the iterations).  Every backend under comparison
pays the same extra full-tensor reduce, so A/Bs stay valid.  This is the
one implementation all benchmarks share — BASELINE.md's numbers depend on
this methodology being uniform.
"""

import time

import jax
import jax.numpy as jnp


def timed_loop(fn, args, iters: int = 50, reps: int = 3,
               perturb_idx: int = 0):
    """Best per-call seconds of ``fn(*args)`` over ``reps`` timed scans.

    ``args`` is a tuple; the carry perturbs ``args[perturb_idx]`` (the
    tensor input) to chain iterations.
    """
    args = tuple(args)

    @jax.jit
    def run(*args):
        def body(c, _):
            inner = list(args)
            inner[perturb_idx] = (
                args[perturb_idx] + c.astype(args[perturb_idx].dtype)
            )
            y = fn(*inner)
            return c + jnp.sum(y.astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    float(run(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(run(*args))
        best = min(best, time.perf_counter() - t0)
    return best / iters
