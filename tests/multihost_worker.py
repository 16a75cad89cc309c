"""Worker process for the two-process multi-host test
(tests/test_multihost.py).  Each process owns 4 virtual CPU devices; the
two processes form one 8-device jax.distributed cluster and run ONE
data-parallel FM train step through the DCN-facing helpers
(parallel/mesh.py: process_batch_slice + shard_batch_multihost).

Usage: python multihost_worker.py <pid> <nproc> <port> <outdir>
"""

import json
import os
import sys

pid, nproc, port, outdir = (
    int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
)
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax  # noqa: E402

# the environment may preload jax with a TPU plugin at interpreter startup
# (see tests/conftest.py) — env vars are too late, steer via jax.config
jax.config.update("jax_platforms", "cpu")
# multi-process CPU backend needs an explicit collectives implementation
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address="localhost:{}".format(port),
    num_processes=nproc, process_id=pid,
)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from pnpflow_tpu.parallel.mesh import (  # noqa: E402
    make_mesh,
    process_batch_slice,
    replicate,
    shard_batch_multihost,
)
from pnpflow_tpu.training.flow_matching import (  # noqa: E402
    make_fm_train_step_precoupled,
)


def apply(params, x, t):
    # linear velocity model — the train step, sharding and collectives are
    # what is under test, not the network
    return x * params["w"]


def main():
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == 4 * nproc, len(jax.devices())

    tx = optax.sgd(0.1)
    step = jax.jit(make_fm_train_step_precoupled(apply, tx))
    mesh = make_mesh()

    params = {"w": jnp.asarray(0.5)}
    state = {
        "params": params, "opt_state": tx.init(params),
        "ema": jax.tree_util.tree_map(jnp.copy, params),
        "step": jnp.zeros((), jnp.int32),
    }
    state = replicate(state, mesh)

    global_batch = 16
    start, size = process_batch_slice(global_batch, mesh)
    assert size == global_batch // nproc
    rng = np.random.default_rng(0)  # same stream; each host slices its part
    x0_full = rng.normal(size=(global_batch, 8, 8, 1)).astype(np.float32)
    x1_full = rng.normal(size=(global_batch, 8, 8, 1)).astype(np.float32)
    x0 = shard_batch_multihost(x0_full[start:start + size], mesh, global_batch)
    x1 = shard_batch_multihost(x1_full[start:start + size], mesh, global_batch)

    state, loss = step(state, x0, x1, jax.random.PRNGKey(0))
    out = {
        "pid": pid,
        "loss": float(jax.device_get(loss)),
        "w": float(jax.device_get(state["params"]["w"])),
        "step": int(jax.device_get(state["step"])),
        "n_devices": len(jax.devices()),
        "n_local": len(jax.local_devices()),
    }
    with open(os.path.join(outdir, "out_{}.json".format(pid)), "w") as f:
        json.dump(out, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
