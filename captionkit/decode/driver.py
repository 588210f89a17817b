"""Split-decode eval driver (SURVEY.md §3.3 'Eval driver', §4.3).

The reference iterates a split one image at a time, beam-searches in
Python, dumps {image_id, caption} JSON, and shells into cococaption. Here a
whole split decodes as a stream of static-shape device batches through ONE
compiled decode program; invalid tail rows are dropped on host; metrics run
in-process.
"""

from __future__ import annotations

import collections
import json
import time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from captionkit.data.featquant import (
    dequantize_for_feed,
    feed_to_device,
    quantize_for_feed,
)
from captionkit.data.sources import CaptionDataset
from captionkit.decode.beam import beam_search
from captionkit.decode.greedy import greedy_decode, sample_decode
from captionkit.metrics.eval import CaptionEvaluator
from captionkit.models.base import ModelDef
from captionkit.utils.config import DecodeConfig


def make_decode_fn(
    model: ModelDef,
    decode_cfg: DecodeConfig,
    *,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    mesh=None,
):
    """Jitted (params, features, existing, existing_len) -> tokens [B, L].

    With a mesh, the batch shards over the 'data' axis — each chip beam-
    searches its slice and XLA all-gathers the token output back
    (SURVEY.md §6 distributed-comm row: eval hypothesis collection rides
    an ICI all-gather).
    """

    if decode_cfg.method not in ("greedy", "beam", "sample"):
        raise ValueError(f"unknown decode method {decode_cfg.method!r}")

    def fn(params, features, existing, existing_len, batch_idx):
        # int8 feed ships features as an (int8 q, f32 per-region scale)
        # pair and dequantizes HERE, on device, to the same bf16 grid
        # the bfloat16 feed lands on (data/featquant.py — halves the
        # H2D bytes again on transfer-bound hosts).
        features = dequantize_for_feed(features, decode_cfg.feed_dtype)
        ctx = model.encode(params, features, existing, existing_len)
        if decode_cfg.method == "beam" and decode_cfg.beam_size > 1:
            res = beam_search(
                model, params, ctx,
                beam_size=decode_cfg.beam_size,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=decode_cfg.max_decode_len,
                length_penalty=decode_cfg.length_penalty,
                impl=decode_cfg.beam_impl,
            )
            return res.tokens
        if decode_cfg.method == "sample":
            rng = jax.random.fold_in(
                jax.random.PRNGKey(decode_cfg.seed), batch_idx
            )
            out = sample_decode(
                model, params, ctx, rng,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=decode_cfg.max_decode_len,
                temperature=decode_cfg.temperature,
                top_k=decode_cfg.top_k,
                top_p=decode_cfg.top_p,
            )
            return out.tokens
        out = greedy_decode(
            model, params, ctx,
            start_id=start_id, end_id=end_id, pad_id=pad_id,
            max_len=decode_cfg.max_decode_len,
        )
        return out.tokens

    from captionkit.utils.tpuopts import decode_compiler_options

    opts = decode_compiler_options()
    if mesh is None:
        return jax.jit(fn, compiler_options=opts)
    from captionkit.parallel.mesh import batch_sharding, replicated

    repl, bsh = replicated(mesh), batch_sharding(mesh)
    # int8 feed: features arrive as a (q, scale) pair; both lead with
    # the batch axis, so both shard over 'data'.
    fsh = (bsh, bsh) if decode_cfg.feed_dtype == "int8" else bsh
    return jax.jit(
        fn,
        in_shardings=(repl, fsh, bsh, bsh, repl),
        out_shardings=NamedSharding(mesh, PartitionSpec()),
        compiler_options=opts,
    )


def decode_split(
    model: ModelDef,
    params: Any,
    dataset: CaptionDataset,
    decode_cfg: DecodeConfig,
    *,
    decode_fn=None,
    results_path: Optional[str] = None,
    mesh=None,
) -> tuple[dict[int, str], dict[str, float]]:
    """Decode a dataset split. Returns ({image_id: caption}, stats).

    stats includes wall-clock captions/sec — the project's north-star
    throughput counter (SURVEY.md §6 tracing row).
    """
    vocab = dataset.vocab
    if decode_fn is None:
        decode_fn = make_decode_fn(
            model, decode_cfg,
            start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
            mesh=mesh,
        )
    hypotheses: dict[int, str] = {}
    n_decoded = 0
    n_timed = 0
    # The first batch compiles the decode program; it is excluded from the
    # throughput clock (captions/sec counts steady-state batches only).
    t_start: Optional[float] = None
    # Pipelined split decode: dispatch batch k+1 (async) before fetching
    # batch k's tokens, so H2D transfer and host detokenization overlap
    # device compute instead of serializing with it (round 2: the serial
    # loop left the chip idle for a full host round-trip per batch).
    pending: collections.deque = collections.deque()

    def _consume() -> None:
        nonlocal n_decoded, n_timed, t_start
        tokens_dev, batch = pending.popleft()
        tokens = np.asarray(jax.device_get(tokens_dev))
        n_valid = int(batch.valid.sum())
        if t_start is None:
            t_start = time.perf_counter()
        else:
            n_timed += n_valid
        for row, valid, img in zip(tokens, batch.valid, batch.image_id):
            if not valid:
                continue
            hypotheses[int(img)] = vocab.decode_to_string(row)
            n_decoded += 1

    t_total = time.perf_counter()
    for batch_idx, batch in enumerate(dataset.batches(decode_cfg.batch_size)):
        feats = quantize_for_feed(batch.features, decode_cfg.feed_dtype)
        tokens_dev = decode_fn(
            params,
            feed_to_device(feats),
            jnp.asarray(batch.existing),
            jnp.asarray(batch.existing_len),
            jnp.asarray(batch_idx, jnp.int32),
        )
        pending.append((tokens_dev, batch))
        if len(pending) > 2:
            _consume()
    while pending:
        _consume()
    elapsed = time.perf_counter() - (t_start or time.perf_counter())
    # wall_s covers the WHOLE split (including the compile batch);
    # captions_per_sec is steady-state only (batches after the first) and
    # reads 0.0 when the split fits in one batch — there is no
    # compile-free window to measure then.
    stats = {
        "captions": float(n_decoded),
        "wall_s": time.perf_counter() - t_total,
        "captions_per_sec": n_timed / elapsed if elapsed > 0 and n_timed
        else 0.0,
    }
    if results_path:
        # The in-memory dict stays keyed by the dense per-split index
        # (references/SCST lookups use it), but the written file is the
        # cococaption interchange format (SURVEY.md §4.3) — external
        # scorers key by the ORIGINAL image id, which prepared splits
        # carry in dataset.image_ids.
        ids = dataset.image_ids
        with open(results_path, "w") as f:
            json.dump(
                [{"image_id": int(ids[k]) if ids is not None else k,
                  "caption": v}
                 for k, v in sorted(hypotheses.items())],
                f, indent=0,
            )
    return hypotheses, stats


def evaluate_split(
    model: ModelDef,
    params: Any,
    dataset: CaptionDataset,
    decode_cfg: DecodeConfig,
    *,
    evaluator: Optional[CaptionEvaluator] = None,
    results_path: Optional[str] = None,
    mesh=None,
    decode_fn=None,
) -> dict[str, float]:
    """Decode + score a split (needs dataset.references). Pass a prebuilt
    decode_fn to reuse one compiled program across repeated validations."""
    if dataset.references is None:
        raise ValueError("dataset has no reference captions to score against")
    hyps, stats = decode_split(
        model, params, dataset, decode_cfg, results_path=results_path,
        mesh=mesh, decode_fn=decode_fn,
    )
    refs = {
        int(img): [" ".join(toks) for toks in dataset.references[int(img)]]
        for img in hyps
    }
    evaluator = evaluator or CaptionEvaluator()
    metrics = evaluator.evaluate(refs, hyps)
    metrics.update(stats)
    return metrics
