"""Device mesh and sharding helpers.

TPU-native replacement for the reference's DDP/NCCL layer (SURVEY.md §2.9):
a 1-D `data` mesh over all chips; batches are sharded over it and parameters
replicated. XLA inserts the gradient all-reduce (psum over ICI) — there is
no hand-written comms code, unlike the reference's `torch.distributed`
bootstrap (`ff-raft/train.py:128-132`). A second, currently-size-1 `model`
axis is reserved for spatial/tensor sharding of the correlation volume at
very large frame sizes (SURVEY.md §5.7).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, model_axis: int = 1) -> Mesh:
    """1-D (or 2-D with a reserved model axis) mesh over the given devices."""
    devices = list(devices) if devices is not None else jax.devices()
    n = len(devices)
    assert n % model_axis == 0, (n, model_axis)
    arr = np.array(devices).reshape(n // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def shard_batch(mesh: Mesh):
    """NamedSharding that splits the leading (batch) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh):
    """NamedSharding that fully replicates (parameters, opt state)."""
    return NamedSharding(mesh, P())


def put_batch(batch, mesh: Mesh):
    """Device-put a pytree of host arrays with batch-axis sharding."""
    sharding = shard_batch(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
