"""Two-process multi-host exercise of the DCN-facing helpers.

Spawns 2 local processes x 4 virtual CPU devices each, forming one
8-device ``jax.distributed`` cluster, and runs ONE data-parallel FM train
step through ``process_batch_slice`` + ``shard_batch_multihost``
(parallel/mesh.py:82-102) — the path a real TPU pod uses.  Asserts both
processes agree and match a single-process run of the identical step on
the full batch.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

_HERE = os.path.dirname(os.path.abspath(__file__))


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_step(tmp_path):
    port = _free_port()
    env = {
        k: v for k, v in os.environ.items()
        if k not in ("XLA_FLAGS", "JAX_PLATFORMS")
    }
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(_HERE, "multihost_worker.py"),
             str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for p, text in zip(procs, outs):
        assert p.returncode == 0, text[-3000:]

    results = []
    for pid in range(2):
        with open(tmp_path / "out_{}.json".format(pid)) as f:
            results.append(json.load(f))

    a, b = results
    assert a["n_devices"] == b["n_devices"] == 8
    assert a["n_local"] == b["n_local"] == 4
    assert a["step"] == b["step"] == 1
    # replicated state: both processes hold identical post-step values
    assert a["loss"] == pytest.approx(b["loss"], rel=1e-6)
    assert a["w"] == pytest.approx(b["w"], rel=1e-6)

    # single-process ground truth of the same step on the full batch
    import jax
    import jax.numpy as jnp
    import optax

    from pnpflow_tpu.training.flow_matching import (
        make_fm_train_step_precoupled,
    )

    def apply(params, x, t):
        return x * params["w"]

    tx = optax.sgd(0.1)
    step = jax.jit(make_fm_train_step_precoupled(apply, tx))
    params = {"w": jnp.asarray(0.5)}
    state = {
        "params": params, "opt_state": tx.init(params),
        "ema": jax.tree_util.tree_map(jnp.copy, params),
        "step": jnp.zeros((), jnp.int32),
    }
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(16, 8, 8, 1)).astype(np.float32))
    x1 = jnp.asarray(rng.normal(size=(16, 8, 8, 1)).astype(np.float32))
    state, loss = step(state, x0, x1, jax.random.PRNGKey(0))
    assert a["loss"] == pytest.approx(float(loss), rel=1e-5)
    assert a["w"] == pytest.approx(float(state["params"]["w"]), rel=1e-5)
