"""Device mesh + sharding helpers — the framework's first-class parallelism.

The reference trains on exactly one device (``all_config.py:70``); its only
"scale" mechanism is the B·T frame-flattening trick. Here data parallelism
over a ``jax.sharding.Mesh`` is built in from the start: batches shard over
the ``data`` axis, parameters replicate (or shard over ``model`` for the
tensor-parallel paths), and XLA inserts the ICI collectives.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "put_sharded",
    "shard_batch",
    "host_to_device",
    "activate_mesh",
    "ambient_mesh",
]

_ACTIVE = threading.local()


@contextlib.contextmanager
def activate_mesh(mesh: Mesh):
    """Enter ``mesh`` for the enclosed computation: the legacy ``with mesh:``
    context (bare-PartitionSpec sharding constraints resolve axis names at
    trace time) plus our own carrier that ``ambient_mesh`` reads — no
    ``jax._src`` internals involved."""
    prev = getattr(_ACTIVE, "mesh", None)
    _ACTIVE.mesh = mesh
    try:
        with mesh:
            yield mesh
    finally:
        _ACTIVE.mesh = prev


def ambient_mesh() -> Optional[Mesh]:
    """The mesh entered via ``activate_mesh`` (None outside any context).

    Models use this to apply sharding constraints only when an axis actually
    divides. Tracing happens on the calling thread, so a thread-local is the
    right carrier."""
    return getattr(_ACTIVE, "mesh", None)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data: int = -1,
    model: int = 1,
) -> Mesh:
    """Create a (data, model) mesh. ``data=-1`` absorbs remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        if n % model:
            raise ValueError(f"{n} devices not divisible by model={model}")
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-leading arrays shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_sharded(x, sharding: NamedSharding):
    """Place one batch-leading array under ``sharding``, multi-process aware.

    Single process: plain ``device_put``. Multi-process (one Python process
    per TPU host): each host holds only ITS rows of the global batch
    (``multihost.process_shard`` data loading), so the global array must be
    assembled from per-process local shards — ``device_put`` with a global
    sharding would silently slice each host's local array as if it were the
    whole global batch."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch, mesh: Mesh):
    """Device-put a pytree of batch-leading arrays, sharded over data."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: put_sharded(x, s), batch)


def host_to_device(tree, mesh: Optional[Mesh] = None):
    """Replicated device_put of a pytree (params etc.)."""
    if mesh is None:
        return jax.device_put(tree)
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
