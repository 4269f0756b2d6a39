"""Device mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(hp=None, devices=None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    ``hp.mesh_data_parallel`` = -1 means "all devices / model_parallel".
    Defaults to pure data parallelism, which is the reference's strategy
    (DataParallel over GPUs) expressed as SPMD sharding.
    """
    devices = devices if devices is not None else jax.devices()
    if hp is not None and not getattr(hp, "parallelization", True):
        # reference semantics: parallelization=False disables DataParallel
        # (train.py:255-256) — here it pins the mesh to a single device
        devices = devices[:1]
    n = len(devices)
    model = getattr(hp, "mesh_model_parallel", 1) if hp is not None else 1
    data = getattr(hp, "mesh_data_parallel", -1) if hp is not None else -1
    if data == -1:
        data = n // model
    assert data * model == n, (
        f"mesh {data}x{model} does not match {n} devices"
    )
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the ``data`` mesh axis."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
    """Full replication (parameters, small state)."""
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every array in a batch pytree with its batch axis sharded over
    ``data`` (the SPMD equivalent of DataParallel's scatter)."""
    sharding = batch_sharding(mesh)

    def put(x):
        if x is None:
            return None
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)
