"""Device mesh and sharding helpers — the data-parallel layer.

The reference has no distributed training of any kind (SURVEY.md §2.7); at
this model scale the one warranted strategy is data parallelism over scenes.
Design: a 1-D ``jax.sharding.Mesh`` over the ``data`` axis; batches shard
their leading scene axis, parameters and optimizer state are replicated. The
jitted train steps are unchanged — GSPMD propagates the input shardings and
inserts the gradient all-reduce (``psum`` over ICI on a TPU slice)
automatically, because the loss sums over the sharded scene axis.

Sequence/tensor/pipeline parallelism are deliberately absent: sequences are
20 steps, hiddens ≤ 48, graphs ≤ ~64 nodes (SURVEY.md §5.7) — the scene axis
is the only axis that scales.
"""

from __future__ import annotations


import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: int = 0, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Scenes sharded across the data axis (leading dim)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_arrays(arrays, mesh: Mesh):
    """Place a pytree of batch arrays with the scene axis sharded. The scene
    dim must divide the mesh size (DenseLoader pads every batch to a fixed
    batch_size, so pick batch_size % num_devices == 0)."""
    return jax.device_put(arrays, batch_sharding(mesh))


def replicate_state(state, mesh: Mesh):
    return jax.device_put(state, replicated_sharding(mesh))
