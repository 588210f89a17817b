"""int8 feature feed (data/featquant.py): quantization bounds, and
exactness of the int8-fed decode paths vs the bfloat16 feed on features
that are exact on the int8 grid (per-region max 127 => scale 1.0 =>
quantize/dequantize is the identity, and integers <= 127 are exact in
bf16 — so the int8 path must answer byte-identically to bf16)."""

import numpy as np
import pytest


def _grid_feats(rng, shape):
    """Integer features in [-127, 127] whose per-region |max| is exactly
    127: quantization scale is 1.0, so int8 feed == bf16 feed exactly."""
    feats = rng.integers(-127, 128, size=shape).astype(np.float32)
    feats[..., 0] = 127.0
    return feats


def test_quantize_roundtrip_error_bound():
    from captionkit.data.featquant import (
        dequantize_features,
        quantize_features,
    )

    rng = np.random.default_rng(0)
    feats = (rng.standard_normal((3, 5, 64)) * 10).astype(np.float32)
    feats[1, 2] = 0.0  # all-zero region: scale must not blow up
    q, scale = quantize_features(feats)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    assert scale.shape == (3, 5)
    assert np.all(scale > 0)
    deq = np.asarray(dequantize_features(q, scale), np.float32)
    amax = np.abs(feats).max(axis=-1, keepdims=True)
    # quantization (scale/2 = amax/254) + bf16 rounding (~amax/256)
    assert np.all(np.abs(deq - feats) <= amax * 0.012 + 1e-6)
    assert np.all(deq[1, 2] == 0.0)


def test_quantize_identity_on_grid():
    from captionkit.data.featquant import (
        dequantize_features,
        quantize_features,
    )

    feats = _grid_feats(np.random.default_rng(1), (2, 4, 8))
    q, scale = quantize_features(feats)
    assert np.all(scale == 1.0)
    assert np.array_equal(q.astype(np.float32), feats)
    assert np.array_equal(
        np.asarray(dequantize_features(q, scale), np.float32), feats
    )


def test_feed_dtype_validation():
    from captionkit.utils.config import CaptionKitConfig

    with pytest.raises(ValueError, match="feed_dtype"):
        CaptionKitConfig().override({"decode.feed_dtype": "int4"})


def _small_setup(arch="editnet"):
    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.arch": arch,
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4, "model.dropout": 0.0,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 4,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(5))
    return cfg, src, model, params


def test_decode_fn_int8_feed_matches_bf16_on_grid():
    """make_decode_fn with feed_dtype='int8' consumes the (q, scale)
    pair and, on grid features, returns exactly the bf16-fed tokens."""
    import dataclasses

    import jax.numpy as jnp

    from captionkit.data.featquant import feed_to_device, quantize_for_feed
    from captionkit.decode.driver import make_decode_fn

    cfg, src, model, params = _small_setup()
    vocab = src.vocab
    rng = np.random.default_rng(7)
    feats = _grid_feats(rng, (4, 4, 12))
    ids = np.zeros((4, 12), np.int32)
    lens = np.zeros((4,), np.int32)
    for i, cap in enumerate(["a dog runs", "a cat sits",
                             "a man rides", "a bird flies"]):
        ids[i], lens[i] = vocab.encode(cap.split(), max_len=12)

    outs = {}
    for feed in ("bfloat16", "int8"):
        dcfg = dataclasses.replace(cfg.decode, feed_dtype=feed)
        fn = make_decode_fn(model, dcfg, start_id=vocab.start,
                            end_id=vocab.end, pad_id=vocab.pad)
        staged = feed_to_device(quantize_for_feed(feats, feed))
        if feed == "int8":
            assert isinstance(staged, tuple)
            assert staged[0].dtype == jnp.int8
        outs[feed] = np.asarray(fn(
            params, staged, jnp.asarray(ids), jnp.asarray(lens),
            jnp.asarray(0, jnp.int32),
        ))
    assert np.array_equal(outs["int8"], outs["bfloat16"])


def test_serve_feed_dtype_int8_matches_bf16_on_grid():
    """The server honors decode.feed_dtype='int8' end-to-end: answers
    match the bf16 server on grid features, and what actually crosses
    the transfer is the int8 pair."""
    import jax.numpy as jnp

    from captionkit.serve import CaptionServer

    cfg, src, model, params = _small_setup()
    feats = _grid_feats(np.random.default_rng(6), (4, 4, 12))
    caps = ["a dog runs", "a cat sits", "a man rides", "a bird flies"]

    bf16 = CaptionServer(cfg.override({"decode.feed_dtype": "bfloat16"}),
                         params, model, src.vocab)
    i8 = CaptionServer(cfg.override({"decode.feed_dtype": "int8"}),
                       params, model, src.vocab)

    fed = []
    inner = i8._decode_fn

    def spy(p, f, ids, lens, t0):
        fed.append((f[0].dtype, f[1].dtype, f[1].shape))
        return inner(p, f, ids, lens, t0)

    i8._decode_fn = spy
    assert i8.run_batch(feats, caps) == bf16.run_batch(feats, caps)
    assert fed == [(jnp.int8, jnp.float32, (4, 4))]


def test_stacked_decode_int8_feed_matches_bf16_on_grid():
    """make_stacked_decode_fn(feed_dtype='int8') dequantizes once for
    both stages; on grid features the full DCNet->EditNet chain matches
    the bf16-fed chain (both paths hand encode the identical bf16
    features, so every downstream reduction sees the same inputs)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from captionkit.data.featquant import feed_to_device, quantize_for_feed
    from captionkit.decode.stacked import make_stacked_decode_fn
    from captionkit.models import get_model

    cfg, src, editnet, ep = _small_setup("editnet")
    dcnet = get_model(dataclasses.replace(cfg.model, arch="dcnet"))
    dp = dcnet.init(jax.random.PRNGKey(9))
    vocab = src.vocab
    first = dataclasses.replace(cfg.decode, method="greedy", beam_size=1)

    feats = _grid_feats(np.random.default_rng(8), (4, 4, 12))
    ids = np.zeros((4, 12), np.int32)
    lens = np.zeros((4,), np.int32)
    for i in range(4):
        ids[i], lens[i] = vocab.encode("a dog runs".split(), max_len=12)

    outs = {}
    for feed in ("bfloat16", "int8"):
        fn = make_stacked_decode_fn(
            dcnet, editnet, first_stage=first, second_stage=cfg.decode,
            start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
            feed_dtype=feed,
        )
        outs[feed] = np.asarray(fn(
            dp, ep, feed_to_device(quantize_for_feed(feats, feed)),
            jnp.asarray(ids), jnp.asarray(lens),
        ))
    assert np.array_equal(outs["int8"], outs["bfloat16"])


def test_decode_split_int8_feed_on_mesh_matches_single_device():
    """The (q, scale) feed pair batch-shards over 'data': mesh-8 int8
    decode must produce exactly the single-device int8 captions."""
    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode.driver import decode_split
    from captionkit.models import get_model
    from captionkit.parallel import make_mesh
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.arch": "editnet",
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4, "model.dropout": 0.0,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 8,
        "decode.feed_dtype": "int8",
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=16, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(5))
    ev = src.eval_view()
    hyps_1, _ = decode_split(model, params, ev, cfg.decode)
    mesh = make_mesh((8,), ("data",))
    hyps_8, _ = decode_split(model, params, ev, cfg.decode, mesh=mesh)
    assert hyps_1 == hyps_8
    assert len(hyps_1) == 16


def test_decode_split_int8_feed():
    """decode_split stages the int8 feed itself (host quantize inside
    the loop) and produces a caption for every image."""
    import dataclasses

    from captionkit.decode.driver import decode_split

    cfg, src, model, params = _small_setup()
    dcfg = dataclasses.replace(cfg.decode, feed_dtype="int8")
    hyps, stats = decode_split(model, params, src.eval_view(), dcfg)
    assert len(hyps) == 2
    assert all(isinstance(v, str) for v in hyps.values())
