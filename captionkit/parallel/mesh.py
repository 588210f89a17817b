"""Device mesh construction and sharding helpers.

Design (SURVEY.md §3.5, §6 "Distributed communication backend" row):

* One logical axis, ``data``, spanning all chips of the slice (v5e-8
  target). The mesh abstraction keeps a 2-level ('dcn', 'ici') layout open,
  but at this model scale (10-30M params) DP over ICI is the whole story:
  parameters are replicated, batches sharded on axis 0, and XLA inserts the
  gradient psum over ICI.
* Models stay pjit-shardable (everything is pure functions over pytrees),
  so TP could be added by changing PartitionSpecs only — deliberately not
  done in v1 (SURVEY.md §3.5 TP row: "not needed").
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    shape: Sequence[int] = (-1,),
    axis_names: Sequence[str] = ("data",),
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh; -1 in shape absorbs the remaining devices."""
    devs = list(devices) if devices is not None else jax.devices()
    shape = list(shape)
    known = int(np.prod([s for s in shape if s != -1])) if shape else 1
    if -1 in shape:
        if len(devs) % known:
            raise ValueError(
                f"{len(devs)} devices not divisible by fixed mesh dims {shape}"
            )
        shape[shape.index(-1)] = len(devs) // known
    total = int(np.prod(shape))
    if total > len(devs):
        raise ValueError(
            f"mesh shape {tuple(shape)} needs {total} devices, have {len(devs)}"
        )
    arr = np.asarray(devs[:total]).reshape(shape)
    return Mesh(arr, tuple(axis_names))


def _data_axes(mesh: Mesh, axis):
    """Default: the batch shards over EVERY mesh axis. captionkit is
    DP-only by design (module docstring), so a multi-axis mesh — e.g. a
    2-level ('dcn', 'ici') layout where the outer axis crosses the slower
    data-center network — is still pure data parallelism: the batch
    splits across the full device grid and XLA's gradient psum becomes a
    hierarchical reduction (intra-slice over ICI, then across DCN).
    Passing an explicit axis (or tuple of axes) restricts the split."""
    return tuple(mesh.axis_names) if axis is None else axis


def batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Sharding for arrays whose leading dim is the global batch."""
    return NamedSharding(mesh, P(_data_axes(mesh, axis)))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (parameters, optimizer state, scalars)."""
    return NamedSharding(mesh, P())


def stacked_batch_sharding(mesh: Mesh, axis=None) -> NamedSharding:
    """Sharding for k-step stacked batches [k, B, ...]: the scan (leading)
    dim replicated, the batch dim sharded."""
    return NamedSharding(mesh, P(None, _data_axes(mesh, axis)))


def shard_batch_arrays(
    mesh: Mesh, tree: Any, axis=None, *, stacked: bool = False
) -> Any:
    """Place every array leaf batch-sharded on the mesh (leading axis; with
    ``stacked``, the second axis — the leading one is the scan dim).

    Host NumPy arrays go straight to per-device shards — the TPU-feed path
    for the input pipeline (one H2D copy per shard, no full-array staging).
    """
    sh = stacked_batch_sharding(mesh, axis) if stacked \
        else batch_sharding(mesh, axis)
    return jax.tree.map(
        lambda x: jax.device_put(x, sh) if x is not None else None,
        tree,
        is_leaf=lambda x: x is None,
    )
