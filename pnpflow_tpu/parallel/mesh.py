"""Device mesh and sharding helpers.

The reference's only multi-device construct is ``torch.nn.DataParallel``
(image_generation/models/utils.py:102).  The TPU-native equivalent is a
``jax.sharding.Mesh`` over the ICI with batch-dim ``NamedSharding``s:
``jit`` then emits the XLA collectives (psum for data-parallel gradients,
all-gather for metric features) — no hand-written communication layer.

Axes:
  data   — batch sharding (data parallel / sample parallel)
  model  — optional tensor sharding of wide layers (unused by default; the
           largest supported model fits comfortably on one chip)

Multi-host: ``init_distributed()`` brings up ``jax.distributed`` from the
standard TPU pod environment (or explicit coordinator args); meshes built
afterwards span every process's chips, with the data axis ordered so that
each host's addressable devices hold a contiguous batch slice (batch
gradient psum rides ICI within a slice, DCN only across slices).
"""

from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_DISTRIBUTED = {"initialized": False}


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-host pod (idempotent).

    With no arguments, relies on the TPU pod metadata (jax autodetects on
    Cloud TPU); explicit args support DCN clusters without metadata.
    Returns True when running multi-process after the call.  Safe no-op on
    a single host with no coordinator configured.
    """
    if _DISTRIBUTED["initialized"]:
        return jax.process_count() > 1
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    # pod autodetect only when the worker list actually names other hosts
    # (single-worker runtimes set TPU_WORKER_HOSTNAMES=localhost)
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_worker = "," in hosts
    if explicit or multi_worker:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=num_processes,
            process_id=process_id,
        )
        # latch ONLY on a real initialize: a no-arg call on an
        # unconfigured host must not block a later call that brings
        # explicit coordinator args
        _DISTRIBUTED["initialized"] = True
    return jax.process_count() > 1


def make_mesh(n_devices: int | None = None, axis_names=("data",),
              shape=None) -> Mesh:
    """Build a mesh over ``n_devices`` devices (all global devices by
    default — every process's chips once init_distributed has run).

    ``shape`` (tuple) splits devices over multiple axes, e.g. (4, 2) with
    axis_names ('data', 'model').  Devices keep jax.devices() order, which
    groups each process's chips contiguously: sharding the batch over
    'data' therefore keeps each host's slice on its own chips (ICI-local
    reductions, DCN only for the cross-host combine).
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def process_batch_slice(global_batch: int, mesh: Mesh) -> tuple[int, int]:
    """(start, size) of this process's slice of a 'data'-sharded batch.

    Host data pipelines feed only the local slice; jax.make_array_from
    _process_local_data assembles the global array.  Single-process: the
    whole batch.
    """
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    per = global_batch // n_proc
    return jax.process_index() * per, per


def shard_batch_multihost(local_batch_np, mesh: Mesh, global_batch: int):
    """Assemble a globally 'data'-sharded array from per-process host data
    (the multi-host replacement for shard_batch)."""
    sharding = data_parallel_sharding(mesh, np.ndim(local_batch_np))
    global_shape = (global_batch,) + tuple(np.shape(local_batch_np))[1:]
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_batch_np), global_shape
    )


def data_parallel_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, data_parallel_sharding(mesh, np.ndim(x)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    tree = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, sharding), tree
    )
    # Re-create the buffers ON device (jit identity preserves the input
    # sharding): on remoted PJRT backends, device_put-committed arrays
    # passed as jit arguments are re-streamed host->device on every
    # Execute (~0.9 s/call for a 250 MB pytree — see
    # utils/jax_setup.py:commit_tree and scripts/probe_call_overhead.py).
    # Weights are replicated once and reused across many calls, so they
    # must be device-created.
    return jax.jit(lambda t: t)(tree)
