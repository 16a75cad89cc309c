"""Process-level JAX configuration: persistent compilation cache.

Remote-compile TPU runtimes pay minutes per distinct program; the
persistent cache makes every CLI invocation after the first load compiled
executables from disk.  Imported for its side effect by main.py / bench.py.
"""

from __future__ import annotations

import os

import jax


def setup(cache_dir: str | None = None):
    cache_dir = cache_dir or os.environ.get(
        "PNPFLOW_TPU_CACHE", os.path.expanduser("~/.cache/pnpflow_tpu_xla")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update(
            "jax_persistent_cache_min_entry_size_bytes", 0
        )
    except Exception:  # pragma: no cover - older jax without these flags
        pass


setup()


def commit_tree(tree, device=None):
    """Return a device-CREATED copy of ``tree`` on ``device``.

    ``jax.device_put`` alone is not enough on remoted PJRT backends (the
    tunneled TPU): a host-committed array passed as a jit argument is
    re-streamed host->device on EVERY Execute — measured at ~0.9 s/call
    for the 256² NCSN++'s 250 MB param pytree vs ~33 ms once the same
    pytree is re-created ON the device by running it through a jitted
    identity (scripts/probe_call_overhead.py).  On local runtimes the
    extra on-device copy is a one-off no-op-grade cost.
    """
    device = device or jax.devices()[0]
    tree = jax.device_put(tree, device)
    with jax.default_device(device):
        tree = jax.jit(lambda t: t)(tree)
    jax.block_until_ready(tree)
    return tree


def default_compiler_options() -> dict | None:
    """Backend compiler options for the framework's hot jits.

    The round-5 flag sweep measured ``xla_tpu_rwb_fusion=false`` at
    +5.1% on the 64² pnp_flow protocol (12.556 vs 11.95 img/s/chip,
    reproduced x3; no change at 256² — BASELINE.md), the only lever of
    14 A/Bs across five rounds to beat the plateau: the GroupNorm moment
    reduces schedule better unfused from their broadcast consumers.

    Returns None off-TPU (libtpu options are rejected by other
    backends, and the tests run on the CPU mesh).  Override with
    ``PNPFLOW_COMPILER_OPTS="k=v,..."``; the empty string disables all
    options (compiler defaults).
    """
    env = os.environ.get("PNPFLOW_COMPILER_OPTS")
    if env is not None:
        env = env.strip()
        if not env:
            return None
        return dict(kv.split("=", 1) for kv in env.split(","))
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - backend init failure
        return None
    if platform != "tpu":
        return None
    return {"xla_tpu_rwb_fusion": "false"}
