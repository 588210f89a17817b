"""Data sources: reference-format readers + a synthetic source.

The reference stores pre-extracted bottom-up features in HDF5 keyed per
split, encoded captions + lengths in JSON, and the wordmap in JSON
(SURVEY.md §3.1, ⟦cite⟧ — mount empty at build time). `CaptionDataset`
reads those artifacts. `SyntheticCaptionSource` fabricates a statistically
caption-like dataset (toy grammar over a configurable vocab) so every test
and benchmark runs without COCO on disk.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import Iterator, Optional

import numpy as np

from captionkit.data.pipeline import Batch, encode_captions, make_batches
from captionkit.data.vocab import Vocab


def load_hdf5_features(path: str, dataset: str = "features"):
    """Load [N, R, F] features from the reference's HDF5 layout. h5py is an
    optional dependency; .npy/.npz paths are accepted as fallbacks. .npy
    files go through the native mmap FeatureStore when it is built
    (threaded GIL-free row gather, captionkit/data/faststore.py)."""
    if path.endswith(".npy"):
        from captionkit.data.faststore import FeatureStore

        return FeatureStore(path)
    if path.endswith(".npz"):
        return np.load(path)[dataset]
    try:
        import h5py  # type: ignore
    except ImportError as e:  # pragma: no cover - h5py is present in image
        raise ImportError(
            "h5py is required for HDF5 feature files; convert to .npy instead"
        ) from e
    f = h5py.File(path, "r")
    return f[dataset]


@dataclass
class CaptionDataset:
    """A split of (features, existing caption, target caption) triples in the
    reference's on-disk format, exposed as static-shape batches.

    Replaces the torch Dataset/DataLoader pair (SURVEY.md §2 L2, §3.1).
    """

    features: Optional[np.ndarray]  # [N_img, R, F] or None (text-only)
    existing: np.ndarray  # [N, L_in] int32
    existing_len: np.ndarray  # [N]
    target: Optional[np.ndarray]  # [N, L_out] int32 (None at pure eval)
    target_len: Optional[np.ndarray]
    image_index: np.ndarray  # [N] int32: row -> image (features row & refs)
    vocab: Vocab
    # Tokenized reference captions per image, for metric eval / SCST reward.
    references: Optional[list[list[list[str]]]] = None
    # Original (e.g. COCO) image id per dense image index, when known —
    # prepared splits carry these so eval artifacts and the parity gate's
    # published-captions check key by the REAL image ids, not the dense
    # per-split order.
    image_ids: Optional[np.ndarray] = None  # [N_img] int64

    @classmethod
    def from_reference_files(
        cls,
        *,
        wordmap_path: str,
        captions_path: str,
        caplens_path: str,
        existing_captions_path: str,
        existing_caplens_path: str,
        features_path: str = "",
        max_len: int = 22,
        captions_per_image: Optional[int] = None,
    ) -> "CaptionDataset":
        """Read reference-prepared JSON/HDF5 artifacts (SURVEY.md §3.1)."""
        vocab = Vocab.load(wordmap_path)

        def _load_ids(p: str) -> np.ndarray:
            with open(p) as f:
                rows = json.load(f)
            out = np.zeros((len(rows), max_len), dtype=np.int32)
            for i, row in enumerate(rows):
                n = min(len(row), max_len)
                out[i, :n] = row[:n]
            return out

        def _load_lens(p: str) -> np.ndarray:
            with open(p) as f:
                return np.asarray(json.load(f), dtype=np.int32).reshape(-1)

        target = _load_ids(captions_path)
        target_len = np.minimum(_load_lens(caplens_path), max_len)
        existing = _load_ids(existing_captions_path)
        existing_len = np.minimum(_load_lens(existing_caplens_path), max_len)
        features = (
            load_hdf5_features(features_path) if features_path else None
        )
        n = existing.shape[0]
        n_img = n if features is None else features.shape[0]
        # Reference layout: captions_per_image GT captions per image, stored
        # image-major; existing captions are per-image (repeated if needed).
        # With no features file the image count is not derivable from the
        # artifacts — pass captions_per_image explicitly then.
        cpi = captions_per_image or max(1, n // max(1, n_img))
        image_index = np.arange(n, dtype=np.int32) // cpi
        # Reconstruct per-image reference captions from the GT rows so this
        # path can score metrics and run SCST like the prepared/synthetic
        # paths (ADVICE r1: previously silently decoded without metrics).
        references: list[list[list[str]]] = [
            [] for _ in range(int(image_index[-1]) + 1 if n else 0)
        ]
        for row, img in enumerate(image_index):
            references[int(img)].append(vocab.decode(target[row]))
        return cls(
            features=features,
            existing=existing,
            existing_len=existing_len,
            target=target,
            target_len=target_len,
            image_index=image_index,
            vocab=vocab,
            references=references,
        )

    @property
    def size(self) -> int:
        return int(self.existing.shape[0])

    def eval_view(self) -> "CaptionDataset":
        """One row per image (the first caption row): the decode/eval
        layout. The training layout has captions_per_image identical
        existing-caption rows per image — decoding all of them would do
        captions_per_image times the necessary work."""
        first = np.unique(self.image_index, return_index=True)[1]
        return CaptionDataset(
            features=self.features,
            existing=self.existing[first],
            existing_len=self.existing_len[first],
            target=None,
            target_len=None,
            image_index=self.image_index[first],
            vocab=self.vocab,
            references=self.references,
            image_ids=self.image_ids,
        )

    def shard(self, num_shards: int, index: int) -> "CaptionDataset":
        """Strided row partition for multi-host data parallelism.

        Process ``index`` of ``num_shards`` (``jax.process_index()`` /
        ``jax.process_count()`` under jax.distributed) sees rows
        ``index::num_shards`` — round-robin, so caption-length buckets
        stay uniformly distributed across hosts. The feature store,
        reference captions, and image-id table are shared views (rows
        gather through ``image_index`` lazily), so sharding never copies
        feature data. Shard the TRAINING layout for per-host input
        pipelines; shard ``eval_view()`` to split a decode across hosts
        (each host's results JSON keys by the real image ids, so shards
        concatenate trivially).
        """
        if not 0 <= index < num_shards:
            raise ValueError(
                f"shard index {index} outside [0, {num_shards})"
            )
        sel = np.arange(index, self.size, num_shards)
        return CaptionDataset(
            features=self.features,
            existing=self.existing[sel],
            existing_len=self.existing_len[sel],
            target=None if self.target is None else self.target[sel],
            target_len=(None if self.target_len is None
                        else self.target_len[sel]),
            image_index=self.image_index[sel],
            vocab=self.vocab,
            references=self.references,
            image_ids=self.image_ids,
        )

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = False,
        seed: int = 0,
        drop_remainder: bool = False,
        feat_shape: tuple[int, int] = (36, 2048),
    ) -> Iterator[Batch]:
        # Per-batch gather (never materialize the whole split's features):
        # rows are selected through image_index lazily, using the native
        # mmap feature store when the backing file supports it.
        features = None
        if self.features is not None:
            source = self.features
            image_index = self.image_index

            def features(idx, _src=source, _map=image_index):
                rows = _map[idx]
                if hasattr(_src, "gather"):
                    return _src.gather(rows)
                if isinstance(_src, np.ndarray):
                    return _src[rows]
                # h5py-style dataset: fancy indexing requires sorted unique
                # indices; gather via sort + inverse permutation so only the
                # requested rows are read (never the whole dataset).
                order = np.argsort(rows, kind="stable")
                uniq, inverse = np.unique(rows[order], return_inverse=True)
                block = _src[uniq]
                out = np.empty((len(rows), *block.shape[1:]), block.dtype)
                out[order] = block[inverse]
                return out

        return make_batches(
            features=features,
            existing=self.existing,
            existing_len=self.existing_len,
            target=self.target,
            target_len=self.target_len,
            image_id=self.image_index,
            batch_size=batch_size,
            shuffle=shuffle,
            seed=seed,
            drop_remainder=drop_remainder,
            feat_shape=feat_shape,
        )


# --------------------------------------------------------------------------
# Synthetic data (tests + benchmarks without COCO on disk)
# --------------------------------------------------------------------------

_SUBJECTS = ["a man", "a woman", "a dog", "a cat", "two people", "a child",
             "a group of people", "a bird", "a horse", "an elephant"]
_VERBS = ["riding", "holding", "watching", "standing near", "sitting on",
          "playing with", "walking past", "looking at", "jumping over"]
_OBJECTS = ["a skateboard", "a red umbrella", "the beach", "a wooden bench",
            "a plate of food", "a blue train", "the grass", "a laptop",
            "a baseball bat", "a slice of pizza"]
_TAILS = ["", "in the park", "on a sunny day", "at night", "next to a tree",
          "in the city", "under a bridge"]


def _toy_caption(rng: np.random.Generator) -> list[str]:
    parts = [
        _SUBJECTS[rng.integers(len(_SUBJECTS))],
        _VERBS[rng.integers(len(_VERBS))],
        _OBJECTS[rng.integers(len(_OBJECTS))],
        _TAILS[rng.integers(len(_TAILS))],
    ]
    return " ".join(p for p in parts if p).split()


def _corrupt(tokens: list[str], rng: np.random.Generator) -> list[str]:
    """Make an 'existing caption': drop/substitute a word — the denoising
    setting DCNet trains on (SURVEY.md §1)."""
    toks = list(tokens)
    if len(toks) > 3 and rng.random() < 0.5:
        del toks[rng.integers(len(toks))]
    if toks and rng.random() < 0.5:
        j = int(rng.integers(len(toks)))
        toks[j] = _OBJECTS[rng.integers(len(_OBJECTS))].split()[-1]
    return toks


class SyntheticCaptionSource:
    """Deterministic fake COCO: toy-grammar captions + random features."""

    def __init__(
        self,
        num_images: int = 128,
        captions_per_image: int = 5,
        num_regions: int = 36,
        feat_dim: int = 2048,
        max_len: int = 22,
        seed: int = 0,
        with_features: bool = True,
    ):
        rng = np.random.default_rng(seed)
        self.max_len = max_len
        gts: list[list[list[str]]] = []
        target_tokens: list[list[str]] = []
        existing_tokens: list[list[str]] = []
        image_index: list[int] = []
        for img in range(num_images):
            refs = [_toy_caption(rng) for _ in range(captions_per_image)]
            gts.append(refs)
            for r in refs:
                target_tokens.append(r)
                existing_tokens.append(_corrupt(refs[0], rng))
                image_index.append(img)
        self.vocab = Vocab.build(target_tokens + existing_tokens, min_freq=1)
        target, target_len = encode_captions(target_tokens, self.vocab, max_len)
        existing, existing_len = encode_captions(
            existing_tokens, self.vocab, max_len
        )
        features = None
        if with_features:
            features = rng.standard_normal(
                (num_images, num_regions, feat_dim), dtype=np.float32
            )
        self.dataset = CaptionDataset(
            features=features,
            existing=existing,
            existing_len=existing_len,
            target=target,
            target_len=target_len,
            image_index=np.asarray(image_index, dtype=np.int32),
            vocab=self.vocab,
            references=gts,
        )

    def eval_view(self) -> CaptionDataset:
        """One row per image (first existing caption), for decode eval."""
        return self.dataset.eval_view()
