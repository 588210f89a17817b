"""Mesh & sharding utilities (SURVEY.md §3.5).

The reference is single-process single-GPU; its rebuild parallelizes via
``jax.sharding`` over the ICI mesh — batch-sharded data parallel for XE and
SCST, parameters replicated, gradient all-reduce inserted by XLA. No
NCCL/MPI-style code exists anywhere in this framework by design.
"""

from captionkit.parallel.mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch_arrays,
)
