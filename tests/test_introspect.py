"""Attention introspection (decode/introspect.py + ModelDef.step_attn):
the surface behind the paper's qualitative copy/ground analyses."""

import jax
import numpy as np
import pytest

from captionkit.data import SyntheticCaptionSource
from captionkit.decode import greedy_decode, greedy_decode_with_attention
from captionkit.decode.introspect import attention_report
from captionkit.models import get_model
from captionkit.utils.config import ModelConfig


def _setup(arch, **over):
    src = SyntheticCaptionSource(num_images=6, captions_per_image=2,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    mcfg = ModelConfig(arch=arch, vocab_size=len(src.vocab), emb_dim=16,
                       hidden_dim=24, att_dim=8, feat_dim=12,
                       num_regions=4, dropout=0.0,
                       compute_dtype="float32", **over)
    model = get_model(mcfg)
    params = model.init(jax.random.PRNGKey(0))
    ds = src.eval_view()
    import jax.numpy as jnp

    feats = (None if arch == "dcnet" and not over.get("dcnet_use_visual")
             else jnp.asarray(np.asarray(ds.features, np.float32)))
    ctx = model.encode(params, feats,
                       jnp.asarray(np.asarray(ds.existing, np.int32)),
                       jnp.asarray(np.asarray(ds.existing_len, np.int32)))
    return src, model, params, ctx, ds


@pytest.mark.parametrize("arch", ["editnet", "dcnet"])
def test_attention_trace_matches_plain_greedy(arch):
    """Token/mask semantics are pinned to greedy_decode exactly."""
    src, model, params, ctx, ds = _setup(arch)
    v = src.vocab
    kw = dict(start_id=v.start, end_id=v.end, pad_id=v.pad, max_len=10)
    plain = greedy_decode(model, params, ctx, **kw)
    trace = greedy_decode_with_attention(model, params, ctx, **kw)
    np.testing.assert_array_equal(np.asarray(plain.tokens),
                                  np.asarray(trace.rollout.tokens))
    np.testing.assert_array_equal(np.asarray(plain.mask),
                                  np.asarray(trace.rollout.mask))


def test_editnet_attention_distributions_are_valid():
    src, model, params, ctx, ds = _setup("editnet")
    v = src.vocab
    trace = greedy_decode_with_attention(
        model, params, ctx, start_id=v.start, end_id=v.end, pad_id=v.pad,
        max_len=8,
    )
    assert set(trace.attention) == {"vis_alpha", "beta"}
    alpha = np.asarray(trace.attention["vis_alpha"])  # [B, L, R]
    beta = np.asarray(trace.attention["beta"])  # [B, L, T]
    B, L = np.asarray(trace.rollout.tokens).shape
    assert alpha.shape == (B, L, 4)
    assert beta.shape == (B, L, ds.existing.shape[1])
    np.testing.assert_allclose(alpha.sum(-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(beta.sum(-1), 1.0, atol=1e-5)
    # beta respects the encoder mask: padded positions get ~zero weight
    lens = np.asarray(ds.existing_len)
    for b in range(B):
        if lens[b] < beta.shape[-1]:
            assert beta[b, :, lens[b]:].max() < 1e-6


def test_dcnet_alpha_masked_and_visual_variant():
    src, model, params, ctx, ds = _setup("dcnet")
    v = src.vocab
    trace = greedy_decode_with_attention(
        model, params, ctx, start_id=v.start, end_id=v.end, pad_id=v.pad,
        max_len=8,
    )
    assert set(trace.attention) == {"alpha"}
    alpha = np.asarray(trace.attention["alpha"])
    lens = np.asarray(ds.existing_len)
    for b in range(alpha.shape[0]):
        if lens[b] < alpha.shape[-1]:
            assert alpha[b, :, lens[b]:].max() < 1e-6
    # visual flag adds the region distribution
    src2, model2, params2, ctx2, _ = _setup("dcnet", dcnet_use_visual=True)
    tr2 = greedy_decode_with_attention(
        model2, params2, ctx2, start_id=v.start, end_id=v.end,
        pad_id=v.pad, max_len=6,
    )
    assert set(tr2.attention) == {"alpha", "vis_alpha"}


@pytest.mark.parametrize("arch", ["editnet", "dcnet"])
@pytest.mark.parametrize("impl", ["register", "backptr"])
def test_beam_attention_matches_beam_search(arch, impl):
    """beam_decode_with_attention's tokens/scores/n-best are pinned to
    beam_search exactly, against BOTH history layouts."""
    from captionkit.decode import beam_search
    from captionkit.decode.introspect import beam_decode_with_attention

    src, model, params, ctx, ds = _setup(arch)
    v = src.vocab
    kw = dict(beam_size=3, start_id=v.start, end_id=v.end, pad_id=v.pad,
              max_len=9)
    ref = beam_search(model, params, ctx, impl=impl, **kw)
    trace = beam_decode_with_attention(model, params, ctx, **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(trace.result.tokens))
    np.testing.assert_allclose(np.asarray(ref.scores),
                               np.asarray(trace.result.scores), atol=1e-5)
    np.testing.assert_array_equal(np.asarray(ref.lengths),
                                  np.asarray(trace.result.lengths))
    np.testing.assert_array_equal(np.asarray(ref.all_tokens),
                                  np.asarray(trace.result.all_tokens))
    # the rollout view is the winner row
    np.testing.assert_array_equal(np.asarray(trace.rollout.tokens),
                                  np.asarray(trace.result.tokens))
    # raw-sum ranking: per-step logprobs along the winner path sum to
    # its score
    np.testing.assert_allclose(
        np.asarray(trace.rollout.logprobs).sum(-1),
        np.asarray(trace.result.scores), atol=1e-4,
    )


def test_beam_attention_matches_length_penalty_variant():
    from captionkit.decode import beam_search
    from captionkit.decode.introspect import beam_decode_with_attention

    src, model, params, ctx, ds = _setup("editnet")
    v = src.vocab
    kw = dict(beam_size=3, start_id=v.start, end_id=v.end, pad_id=v.pad,
              max_len=9, length_penalty=0.7)
    ref = beam_search(model, params, ctx, **kw)
    trace = beam_decode_with_attention(model, params, ctx, **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(trace.result.tokens))
    np.testing.assert_allclose(np.asarray(ref.scores),
                               np.asarray(trace.result.scores), atol=1e-5)


def test_beam_attention_winner_path_replay():
    """The strongest pin: replaying the winner's token prefix through
    step_attn one image at a time must reproduce the trace's gathered
    attention (and masked steps are exactly zero)."""
    import jax.numpy as jnp

    from captionkit.decode.introspect import beam_decode_with_attention

    src, model, params, ctx, ds = _setup("editnet")
    v = src.vocab
    trace = beam_decode_with_attention(
        model, params, ctx, beam_size=3, start_id=v.start, end_id=v.end,
        pad_id=v.pad, max_len=9,
    )
    tokens = np.asarray(trace.rollout.tokens)
    lengths = np.asarray(trace.rollout.lengths)
    B, L = tokens.shape
    for b in range(min(B, 3)):
        ctx1 = jax.tree.map(lambda x: x[b:b + 1], ctx)
        state = model.init_state(params, ctx1)
        tok = jnp.asarray([v.start], jnp.int32)
        for t in range(int(lengths[b])):
            state, _, attn = model.step_attn(params, ctx1, state, tok)
            for key, arr in trace.attention.items():
                np.testing.assert_allclose(
                    np.asarray(arr[b, t]), np.asarray(attn[key][0]),
                    atol=1e-5,
                    err_msg=f"image {b} step {t} key {key}",
                )
            tok = jnp.asarray([tokens[b, t]], jnp.int32)
        for key, arr in trace.attention.items():
            tail = np.asarray(arr[b, int(lengths[b]):])
            assert tail.size == 0 or np.abs(tail).max() == 0.0


def test_beam_attention_ensemble_mean():
    """Ensemble beam tracing works and reports the members' MEAN
    attention (weak #6 tail: the ensemble inherits the introspection
    surface)."""
    from captionkit.decode import beam_search
    from captionkit.decode.introspect import beam_decode_with_attention
    from captionkit.models import ensemble_model, stack_params

    src, model, params, ctx, ds = _setup("editnet")
    v = src.vocab
    params2 = model.init(jax.random.PRNGKey(7))
    ens = ensemble_model(model, 2)
    eparams = stack_params([params, params2])
    import jax.numpy as jnp

    feats = jnp.asarray(np.asarray(ds.features, np.float32))
    ectx = ens.encode(params=eparams, features=feats,
                      existing=jnp.asarray(np.asarray(ds.existing,
                                                      np.int32)),
                      existing_len=jnp.asarray(
                          np.asarray(ds.existing_len, np.int32)))
    kw = dict(beam_size=3, start_id=v.start, end_id=v.end, pad_id=v.pad,
              max_len=8)
    ref = beam_search(ens, eparams, ectx, **kw)
    trace = beam_decode_with_attention(ens, eparams, ectx, **kw)
    np.testing.assert_array_equal(np.asarray(ref.tokens),
                                  np.asarray(trace.result.tokens))
    beta = np.asarray(trace.attention["beta"])
    lengths = np.asarray(trace.rollout.lengths)
    for b in range(beta.shape[0]):
        if lengths[b]:
            np.testing.assert_allclose(
                beta[b, :lengths[b]].sum(-1), 1.0, atol=1e-5)


def test_attention_report_is_readable():
    src, model, params, ctx, ds = _setup("editnet")
    v = src.vocab
    trace = greedy_decode_with_attention(
        model, params, ctx, start_id=v.start, end_id=v.end, pad_id=v.pad,
        max_len=8,
    )
    rep = attention_report(trace, 0, v, np.asarray(ds.existing[0]))
    assert rep, "no steps in report"
    for rec in rep:
        assert isinstance(rec["word"], str)
        assert "beta_word" in rec and "vis_alpha_argmax" in rec
        assert "vis_alpha_word" not in rec  # regions never words
        assert 0.0 <= rec["beta_weight"] <= 1.0
