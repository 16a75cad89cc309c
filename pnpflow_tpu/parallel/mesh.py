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
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_names=("data",),
              shape=None) -> Mesh:
    """Build a mesh over the first ``n_devices`` local devices.

    ``shape`` (tuple) splits devices over multiple axes, e.g. (4, 2) with
    axis_names ('data', 'model').
    """
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.array(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def data_parallel_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, data_parallel_sharding(mesh, np.ndim(x)))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), tree)
