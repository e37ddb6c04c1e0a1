"""Device mesh and sharding helpers.

The reference scales with single-process ``nn.DataParallel`` over 4 CUDA GPUs
(reference ``train_2d.py:75``, ``train_3d.py:54``, GPU selection via
``CUDA_VISIBLE_DEVICES`` in ``main.py:44``).  The TPU-native equivalent is a
``jax.sharding.Mesh`` with the batch sharded over a ``data`` axis: one jitted
train step with replicated parameters, XLA inserting the gradient ``psum`` over
ICI automatically.  The mesh keeps two further axes reserved so the same step
function scales to model sharding and spatial (halo-exchanged volume) sharding
without API changes:

* ``data``    — batch dimension (DP; the only axis the reference exercises)
* ``model``   — channel/tensor sharding (TP; reserved)
* ``spatial`` — volume-depth sharding (the CP/SP analog for 3D CNNs; reserved)

Across pod slices the same collectives ride DCN — nothing here is
single-slice-specific.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"
SPATIAL_AXIS = "spatial"


def local_device_count() -> int:
    return jax.local_device_count()


def create_mesh(
    axes: Sequence[str] = (DATA_AXIS,),
    shape: Sequence[int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a device mesh.

    Args:
      axes: mesh axis names, e.g. ``('data',)`` or ``('data', 'model')``.
      shape: per-axis sizes.  Defaults to all devices on the first axis and 1
        on the rest.
      devices: explicit device list (defaults to ``jax.devices()``).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (n,) + (1,) * (len(axes) - 1)
    if math.prod(shape) != n:
        raise ValueError(f"mesh shape {shape} does not cover {n} devices")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, ndim: int = 1, axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dimension over ``axis``."""
    spec = P(axis, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_not_shardable(local_bsz: int, data_size: int,
                        world: int = 1) -> bool:
    """True when a batch cannot be sharded over the ``data`` axis.

    Divisibility is a GLOBAL-batch property: under multihost each process
    holds ``local_bsz`` rows of a ``local_bsz * world`` global batch, so
    the check must scale by the process count — dividing the LOCAL batch
    by the global device count would flag every valid multihost batch as
    ragged (e.g. 2 hosts × 2 devices, global b=4: local 2 % 4 != 0 even
    though the global 4 % 4 == 0).
    """
    return data_size > 1 and (local_bsz * world) % data_size != 0


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the leading dim sharded on ``data``.

    Every leaf must have a leading batch dimension divisible by the ``data``
    axis size.  Multi-host (DCN) runs: each process passes its *local* batch
    shard and the leaves are assembled into global arrays
    (``jax.make_array_from_process_local_data``) — single-host runs take the
    plain ``device_put`` path.
    """
    multihost = jax.process_count() > 1

    def _put(x):
        x = np.asarray(x)
        sharding = batch_sharding(mesh, x.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sharding, x)
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(_put, batch)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Initialize multi-host JAX (one process per host; collectives ride ICI
    within a slice and DCN across slices — same ``psum``, no code changes).

    On Cloud TPU all three arguments auto-detect from the metadata server;
    pass them explicitly elsewhere.  The reference has no multi-node story at
    all (single-process ``nn.DataParallel``, reference ``train_2d.py:75``) —
    this is the scale-out path the mesh abstraction was designed for:
    ``create_mesh`` already builds over the *global* ``jax.devices()``.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
