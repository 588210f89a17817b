"""int8-quantized vocab head (ModelConfig.head_quant="int8").

The serving knob: per-column-symmetric int8 weights + per-row int8
activations feed the fused top-k head (ops/head.py). The contract tested
here is EXACTNESS AGAINST THE QUANTIZED DEFINITION — the Pallas kernel,
the XLA path, and the jnp twin must agree bit-for-bit on the same
quantized logits (interpret mode on CPU; compiled on chip via
CAPTIONKIT_TEST_TPU) — plus end-to-end beam equality between the two
dispatch paths. Quality vs the float head is a measurement, not a
contract (quantization may flip near-tie beam choices by design).
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.decode import beam_search
from captionkit.models import get_model
from captionkit.ops.head import (
    fused_head_topk_int8,
    quantize_head,
    quantized_head_logits,
    xla_head_topk_int8,
)
from captionkit.utils.config import ModelConfig

INTERPRET = os.environ.get("CAPTIONKIT_TEST_TPU", "0") != "1"


@pytest.mark.parametrize("extract", ["mask", "thresh"])
@pytest.mark.parametrize("n,h,v,k", [(8, 16, 40, 5), (13, 32, 257, 3),
                                     (64, 64, 1000, 5)])
def test_int8_kernel_matches_jnp_twin(n, h, v, k, extract):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((h, v)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((v,)).astype(np.float32))
    w_q, scale, b_p = quantize_head(w, b, n_rows=n, k=k)
    vals, idx, lse = fused_head_topk_int8(x, w_q, scale, b_p, k=k,
                                          interpret=INTERPRET,
                                          extract=extract)
    ref_logits = quantized_head_logits(x, w_q, scale, b_p)
    import jax

    rv, ri = jax.lax.top_k(ref_logits, k)
    rlse = jax.scipy.special.logsumexp(ref_logits, axis=1)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(rv),
                               rtol=0, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ri))
    np.testing.assert_allclose(np.asarray(lse), np.asarray(rlse),
                               rtol=0, atol=2e-4)
    # the three implementations share one numeric definition
    xv, xi, xl = xla_head_topk_int8(x, w_q, scale, b_p, k=k)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(xi))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(xv), atol=2e-5)


def test_int8_tie_break_lowest_index():
    """Duplicate quantized columns must resolve to the lowest vocab id,
    matching lax.top_k (the same contract as the float kernel)."""
    n, h, v, k = 8, 16, 130, 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    col = rng.standard_normal((h, 1)).astype(np.float32)
    w = jnp.asarray(np.repeat(col, v, axis=1))  # every column identical
    b = jnp.zeros((v,), jnp.float32)
    w_q, scale, b_p = quantize_head(w, b, n_rows=n, k=k)
    _, idx, _ = fused_head_topk_int8(x, w_q, scale, b_p, k=k,
                                     interpret=INTERPRET)
    np.testing.assert_array_equal(
        np.asarray(idx), np.tile(np.arange(k, dtype=np.int32), (n, 1))
    )


def test_quantization_error_is_small():
    """Sanity bound: int8 logits track the float logits to ~1% of the
    per-row dynamic range on random data."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 500)).astype(np.float32))
    b = jnp.asarray(rng.standard_normal((500,)).astype(np.float32))
    w_q, scale, b_p = quantize_head(w, b, n_rows=32, k=5)
    ql = np.asarray(quantized_head_logits(x, w_q, scale, b_p))[:, :500]
    fl = np.asarray(x @ w + b)
    rng_row = fl.max(axis=1) - fl.min(axis=1)
    err = np.abs(ql - fl).max(axis=1)
    assert (err / rng_row).max() < 0.02, (err / rng_row).max()


def _decode(cfg, seed=0, batch=6, max_len=10):
    import jax

    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(seed)
    feats = (None if cfg.arch == "dcnet" else jnp.asarray(
        rng.standard_normal(
            (batch, cfg.num_regions, cfg.feat_dim)).astype(np.float32)))
    existing = jnp.asarray(
        rng.integers(4, cfg.vocab_size - 2, (batch, 7)).astype(np.int32))
    lengths = jnp.asarray(rng.integers(2, 8, (batch,)).astype(np.int32))
    ctx = model.encode(params, feats, existing, lengths)
    return np.asarray(beam_search(
        model, params, ctx, beam_size=3, start_id=1, end_id=2,
        max_len=max_len,
    ).tokens)


@pytest.mark.parametrize("arch", ["editnet", "dcnet"])
def test_int8_beam_paths_agree_end_to_end(arch):
    """Beam decode under head_quant=int8: the Pallas dispatch and the XLA
    dispatch run the same quantized numbers, so their captions must be
    token-identical."""
    dims = dict(vocab_size=50, emb_dim=12, hidden_dim=16, att_dim=8,
                feat_dim=10, num_regions=4, dropout=0.0,
                compute_dtype="float32")
    toks_pallas = _decode(ModelConfig(arch=arch, head_quant="int8",
                                      head_impl="pallas", **dims))
    toks_xla = _decode(ModelConfig(arch=arch, head_quant="int8",
                                   head_impl="xla", **dims))
    np.testing.assert_array_equal(toks_pallas, toks_xla)
    # and the float path still runs / produces valid ids
    toks_f = _decode(ModelConfig(arch=arch, **dims))
    assert toks_f.shape == toks_pallas.shape
    assert (toks_pallas >= 0).all() and (toks_pallas < 50).all()


def test_head_quant_validation():
    with pytest.raises(ValueError, match="head_quant"):
        ModelConfig(head_quant="int4")


def test_int8_composes_with_fused_cells():
    """head_quant=int8 + cell_impl=pallas (the megastep kernels) must
    produce the same captions as int8 + xla cells — the two levers are
    orthogonal (the cell kernels are exactness-tested at 2e-5 and the
    quantized head is bit-identical across dispatches)."""
    dims = dict(vocab_size=50, emb_dim=12, hidden_dim=16, att_dim=8,
                feat_dim=10, num_regions=4, dropout=0.0,
                compute_dtype="float32")
    a = _decode(ModelConfig(arch="editnet", head_quant="int8",
                            cell_impl="pallas", **dims))
    b = _decode(ModelConfig(arch="editnet", head_quant="int8",
                            cell_impl="xla", **dims))
    np.testing.assert_array_equal(a, b)


def test_int8_composes_with_backptr_history():
    """head_quant=int8 x beam_impl=backptr: the history layout never
    touches the head, so captions must equal the register layout's."""
    import jax

    dims = dict(vocab_size=50, emb_dim=12, hidden_dim=16, att_dim=8,
                feat_dim=10, num_regions=4, dropout=0.0,
                compute_dtype="float32")
    cfg = ModelConfig(arch="editnet", head_quant="int8", **dims)
    model = get_model(cfg)
    params = model.init(jax.random.PRNGKey(7))
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.standard_normal((5, 4, 10)).astype(np.float32))
    existing = jnp.asarray(rng.integers(4, 48, (5, 7)).astype(np.int32))
    lengths = jnp.asarray(rng.integers(2, 8, (5,)).astype(np.int32))
    ctx = model.encode(params, feats, existing, lengths)
    outs = {}
    for impl in ("register", "backptr"):
        outs[impl] = np.asarray(beam_search(
            model, params, ctx, beam_size=3, start_id=1, end_id=2,
            max_len=9, impl=impl,
        ).tokens)
    np.testing.assert_array_equal(outs["register"], outs["backptr"])
