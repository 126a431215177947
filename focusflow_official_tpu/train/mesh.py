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


# ---- spatial (sequence-parallel analog) sharding of the corr volume --------
#
# SURVEY.md §5.7: FocusFlow's "long context" axis is H*W — the all-pairs
# correlation volume is O((HW)^2) and dominates memory at large frames.
# `spatial_sharding(mesh)` activates query-axis sharding over the `model`
# mesh axis: the per-query lookup contractions then run fully sharded, and
# GSPMD inserts the halo exchanges where the sharded queries fold back into
# spatial feature maps. The reference has no equivalent (single-GPU memory
# wall); this is the TPU-native scale-out path for very large frames.

_SPATIAL_MESH: Optional[Mesh] = None


class spatial_sharding:
    """Context manager: shard per-query tensors over the `model` axis."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        global _SPATIAL_MESH
        self._prev = _SPATIAL_MESH
        _SPATIAL_MESH = self.mesh
        return self.mesh

    def __exit__(self, *exc):
        global _SPATIAL_MESH
        _SPATIAL_MESH = self._prev
        return False


def shard_queries(x, axis: int = 1):
    """Constrain `x` to be sharded over `model` along `axis` (the flattened
    H*W query dimension). No-op unless inside `spatial_sharding` with a
    model axis larger than 1, so single-mesh code paths are unaffected."""
    mesh = _SPATIAL_MESH
    if mesh is None or mesh.shape.get("model", 1) <= 1:
        return x
    spec = [None] * x.ndim
    spec[axis] = "model"
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec)))
