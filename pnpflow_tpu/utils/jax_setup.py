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
