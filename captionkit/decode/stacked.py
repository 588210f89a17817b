"""Stacked editing: DCNet output becomes EditNet's existing caption.

The reference's two editors are trained separately and combinable by
running one after the other (SURVEY.md §1). Here the whole stack — DCNet
encode -> decode -> re-wrap as an existing caption -> EditNet encode ->
beam decode — is ONE jitted device program per batch: the intermediate
caption never leaves the chip.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from captionkit.decode.beam import beam_search
from captionkit.decode.greedy import greedy_decode
from captionkit.models.base import ModelDef
from captionkit.utils.config import DecodeConfig


def rollout_to_existing(
    tokens: jax.Array,  # [B, L] decoded tokens (pad after <end>)
    lengths: jax.Array,  # [B] emitted count (incl. <end> if produced)
    *,
    start_id: int,
    pad_id: int = 0,
) -> tuple[jax.Array, jax.Array]:
    """Convert a rollout into encoder-format existing captions:
    <start> w1 ... <end> <pad>..., with the matching true lengths.
    Output width is L+1 so a full-length rollout is never truncated."""
    B, L = tokens.shape
    start_col = jnp.full((B, 1), start_id, jnp.int32)
    existing = jnp.concatenate([start_col, tokens], axis=1)  # [B, L+1]
    return existing, lengths.astype(jnp.int32) + 1


def make_stacked_decode_fn(
    dcnet: ModelDef,
    editnet: ModelDef,
    *,
    first_stage: DecodeConfig,
    second_stage: DecodeConfig,
    start_id: int,
    end_id: int,
    pad_id: int = 0,
    feed_dtype: str = "float32",
):
    """Jitted (dcnet_params, editnet_params, features, existing,
    existing_len) -> final tokens [B, L].

    ``feed_dtype`` mirrors DecodeConfig.feed_dtype for the features
    argument: "int8" expects the host-quantized (q, scale) pair from
    data/featquant.quantize_for_feed and dequantizes on device (both
    stages see the same dequantized features)."""

    for stage in (first_stage, second_stage):
        if stage.method not in ("greedy", "beam"):
            raise ValueError(
                f"stacked decode supports greedy/beam stages, got "
                f"{stage.method!r}"
            )

    def _decode(model, params, ctx, cfg: DecodeConfig) -> tuple:
        if cfg.method == "beam" and cfg.beam_size > 1:
            res = beam_search(
                model, params, ctx, beam_size=cfg.beam_size,
                start_id=start_id, end_id=end_id, pad_id=pad_id,
                max_len=cfg.max_decode_len,
                length_penalty=cfg.length_penalty,
            )
            return res.tokens, res.lengths
        out = greedy_decode(
            model, params, ctx, start_id=start_id, end_id=end_id,
            pad_id=pad_id, max_len=cfg.max_decode_len,
        )
        return out.tokens, out.lengths

    def fn(
        dcnet_params: Any,
        editnet_params: Any,
        features: jax.Array,
        existing: jax.Array,
        existing_len: jax.Array,
    ) -> jax.Array:
        from captionkit.data.featquant import dequantize_for_feed

        features = dequantize_for_feed(features, feed_dtype)
        # Stage 1: DCNet edits the incoming caption (text-conditioned).
        ctx1 = dcnet.encode(dcnet_params, features, existing, existing_len)
        toks1, lens1 = _decode(dcnet, dcnet_params, ctx1, first_stage)
        # Re-wrap as an existing caption for the second editor.
        exist2, exist2_len = rollout_to_existing(
            toks1, lens1, start_id=start_id, pad_id=pad_id
        )
        # Stage 2: EditNet edits DCNet's output, grounded in the image.
        ctx2 = editnet.encode(editnet_params, features, exist2, exist2_len)
        toks2, _ = _decode(editnet, editnet_params, ctx2, second_stage)
        return toks2

    from captionkit.utils.tpuopts import decode_compiler_options

    return jax.jit(fn, compiler_options=decode_compiler_options())
