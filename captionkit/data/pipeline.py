"""Static-shape batching for XLA (SURVEY.md §6: the 'sequence axis' work here
is padding/masks, not sequence parallelism).

Everything in this module is host-side NumPy. The contract with the device
side is:

* ``Batch`` arrays always have the same shapes for a given config — XLA
  compiles each (batch_size, max_len) signature exactly once.
* pad id is 0 everywhere; true lengths ride along as int32 arrays, masks are
  derived on device from lengths (cheap) rather than shipped.
* The final (ragged) batch of a split is padded up to batch_size with
  repeated samples plus a validity mask, so decode of a whole split never
  triggers a recompile (SURVEY.md §8.3 hard-part #4).
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence
from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class Batch:
    """One device batch. All arrays NumPy, static-shaped.

    features:      [B, R, F] float32   bottom-up region features (or zeros
                                       for text-only DCNet runs)
    existing:      [B, L_in] int32     existing (AoANet) caption ids
    existing_len:  [B] int32
    target:        [B, L_out] int32    gold caption ids (training only)
    target_len:    [B] int32
    valid:         [B] bool            False for padding rows in final batch
    image_id:      [B] int32           source image ids (eval bookkeeping)
    """

    features: np.ndarray
    existing: np.ndarray
    existing_len: np.ndarray
    target: Optional[np.ndarray]
    target_len: Optional[np.ndarray]
    valid: np.ndarray
    image_id: np.ndarray

    @property
    def size(self) -> int:
        return int(self.existing.shape[0])


def pad_to(ids: Sequence[int], length: int, pad: int = 0) -> np.ndarray:
    arr = np.full((length,), pad, dtype=np.int32)
    n = min(len(ids), length)
    arr[:n] = np.asarray(ids[:n], dtype=np.int32)
    return arr


def encode_captions(
    token_seqs: Sequence[Sequence[str]],
    vocab,
    max_len: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Encode tokenized captions into [N, max_len] ids + [N] lengths."""
    n = len(token_seqs)
    ids = np.zeros((n, max_len), dtype=np.int32)
    lens = np.zeros((n,), dtype=np.int32)
    for k, toks in enumerate(token_seqs):
        row, length = vocab.encode(toks, max_len)
        ids[k] = np.asarray(row, dtype=np.int32)
        lens[k] = length
    return ids, lens


def make_batches(
    *,
    features,  # [N, R, F] array, callable(indices)->rows, or None
    existing: np.ndarray,
    existing_len: np.ndarray,
    target: Optional[np.ndarray] = None,
    target_len: Optional[np.ndarray] = None,
    image_id: Optional[np.ndarray] = None,
    batch_size: int,
    shuffle: bool = False,
    seed: int = 0,
    drop_remainder: bool = False,
    feat_shape: tuple[int, int] = (36, 2048),
) -> Iterator[Batch]:
    """Yield fixed-shape Batches over a split.

    The last partial batch is padded (rows repeated from index 0) with
    valid=False so downstream jit functions see one shape only.
    """
    n = existing.shape[0]
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(seed)
        rng.shuffle(order)
    if image_id is None:
        image_id = np.arange(n, dtype=np.int32)

    for lo in range(0, n, batch_size):
        idx = order[lo: lo + batch_size]
        b = idx.shape[0]
        if b < batch_size:
            if drop_remainder:
                return
            fill = np.zeros((batch_size - b,), dtype=idx.dtype)
            idx = np.concatenate([idx, fill])
        valid = np.zeros((batch_size,), dtype=bool)
        valid[:b] = True
        if callable(features):
            feats = np.asarray(features(idx), dtype=np.float32)
        elif features is not None:
            feats = features[idx].astype(np.float32, copy=False)
        else:
            feats = np.zeros((batch_size, *feat_shape), dtype=np.float32)
        yield Batch(
            features=feats,
            existing=existing[idx],
            existing_len=existing_len[idx],
            target=None if target is None else target[idx],
            target_len=None if target_len is None else target_len[idx],
            valid=valid,
            image_id=image_id[idx].astype(np.int32, copy=False),
        )


def length_mask(lengths: np.ndarray, max_len: int) -> np.ndarray:
    """[B] lengths -> [B, max_len] bool mask (host-side twin of the device
    helper in captionkit.nn.masking)."""
    return np.arange(max_len)[None, :] < lengths[:, None]


def bucket_batches(
    batches: "Iterator[Batch]",
    boundaries: Sequence[int],
) -> Iterator[Batch]:
    """Length-bucketed batching (SURVEY.md §8.1 step 1 'bucketed batching';
    §6 long-context row: the TPU sequence-axis engineering).

    Rows of each incoming fixed-shape batch are re-emitted with their time
    axes truncated to the smallest boundary >= the batch's longest real
    sequence. XLA compiles one program per bucket width (len(boundaries)
    programs total instead of one), and teacher forcing / encoding skip the
    padding tail — ~30% fewer scan steps at COCO's length distribution.

    Batch composition is unchanged (same rows, same order); only the static
    time widths shrink, so numerics are identical to the unbucketed
    pipeline (masked steps contribute nothing — tests pin this).
    """
    bounds = sorted(boundaries)

    def width(max_needed: int, cap: int) -> int:
        for b in bounds:
            if b >= max_needed:
                return min(b, cap)
        return cap

    for b in batches:
        ex_w = width(int(b.existing_len.max()), b.existing.shape[1])
        out_kw = {}
        if b.target is not None:
            t_w = width(int(b.target_len.max()), b.target.shape[1])
            out_kw = dict(target=b.target[:, :t_w], target_len=b.target_len)
        else:
            out_kw = dict(target=None, target_len=None)
        yield Batch(
            features=b.features,
            existing=b.existing[:, :ex_w],
            existing_len=b.existing_len,
            valid=b.valid,
            image_id=b.image_id,
            **out_kw,
        )
