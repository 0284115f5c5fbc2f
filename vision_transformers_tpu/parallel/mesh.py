"""Device-mesh construction and sharding helpers.

The reference scales by pure data parallelism over NCCL (DDP wrap,
reference train.py:102-107; launcher train.py:394-396).  The TPU-native
equivalent is a named `jax.sharding.Mesh` plus sharded jit: the batch is
sharded over the ``data`` axis, parameters are replicated (and may later be
sharded over the ``model`` axis), and XLA inserts all-reduces over ICI where
the math requires them — DDP, ``dist.reduce_dict`` (train.py:364) and the
DINO center all-reduce (loss.py:147) all disappear into the partitioner.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_batch_size",
]

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_device: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``n_device == 0`` means all visible devices.  ``model_parallel`` devices
    are placed adjacent (innermost) so tensor-parallel collectives ride the
    fastest ICI links; the remaining factor becomes the data axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_device:
        devices = devices[:n_device]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding over the data axis (everything else replicated)."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Assemble a global, data-sharded batch from this process's local rows.

    Single-process: a plain ``device_put`` with the sharded layout.
    Multi-process: each process holds only its ``global_batch /
    process_count`` rows (the reference's per-rank ``batch // world_size``
    split, factory.py:264); ``jax.make_array_from_process_local_data``
    stitches them into one global jax.Array without any cross-host copy of
    image data.
    """
    sh = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)),
        batch,
    )


def local_batch_size(global_batch: int, mesh: Mesh) -> int:
    """Per-process batch (reference splits batch // world_size, factory.py:264)."""
    n_data = mesh.shape[DATA_AXIS]
    n_proc = jax.process_count()
    if global_batch % n_data != 0:
        raise ValueError(f"batch {global_batch} not divisible by data axis {n_data}")
    if global_batch % n_proc != 0:
        raise ValueError(f"batch {global_batch} not divisible by process count {n_proc}")
    return global_batch // n_proc
