"""Test configuration: force an 8-device CPU platform so multi-chip sharding
is exercised without TPU hardware (virtual device mesh).

The environment preloads jax with a TPU plugin platform at interpreter
startup, so env vars alone are too late — we must steer the (lazy) backend
selection through jax.config before any backend is initialized.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", jax.default_backend()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
