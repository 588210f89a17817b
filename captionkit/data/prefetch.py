"""Double-buffered host->device prefetch (SURVEY.md §2 L2' rebuild note).

The reference's DataLoader overlaps host IO with GPU compute via worker
processes; the TPU equivalent is keeping N batches in flight on device:
dispatch the transfer for batch k+1 while batch k computes. jax transfers
are async, so a small deque of already-device_put batches suffices.
"""

from __future__ import annotations

import collections
from typing import Any, Iterable, Iterator, Optional

import jax

from captionkit.parallel.mesh import shard_batch_arrays


def prefetch_to_device(
    batches: Iterable[Any],
    *,
    size: int = 2,
    mesh: Optional[Any] = None,
) -> Iterator[Any]:
    """Yield batches already resident on device, `size` in flight.

    With a mesh, arrays are placed batch-sharded over the 'data' axis
    (the DP layout the train steps expect); otherwise default placement.
    """
    if size < 1:
        raise ValueError("prefetch size must be >= 1")

    def _put(batch: Any) -> Any:
        if mesh is not None:
            return shard_batch_arrays(mesh, batch)
        return jax.tree.map(
            lambda x: jax.device_put(x) if x is not None else None,
            batch,
            is_leaf=lambda x: x is None,
        )

    queue: collections.deque = collections.deque()
    it = iter(batches)
    try:
        for _ in range(size):
            queue.append(_put(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield out
