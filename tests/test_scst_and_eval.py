"""SCST mechanics, split-decode driver, and epoch-loop tests."""

import json

import jax
import jax.numpy as jnp
import numpy as np

from captionkit.data import SyntheticCaptionSource
from captionkit.decode import greedy_decode
from captionkit.decode.driver import decode_split, evaluate_split
from captionkit.metrics.cider import NgramDocFreq
from captionkit.models import get_model
from captionkit.train import create_train_state
from captionkit.train.loop import run_scst_training, run_xe_training
from captionkit.train.scst import (
    ScstRewarder,
    make_scst_rollout,
    make_scst_update,
    scst_train_step,
)
from captionkit.train.xe import batch_to_device_dict
from captionkit.utils.config import CaptionKitConfig, ModelConfig, TrainConfig


def _setup(seed=0, num_images=12):
    src = SyntheticCaptionSource(
        num_images=num_images, captions_per_image=2, num_regions=4,
        feat_dim=12, max_len=12, seed=seed,
    )
    mcfg = ModelConfig(
        arch="editnet", vocab_size=len(src.vocab), emb_dim=16, hidden_dim=24,
        att_dim=8, feat_dim=12, num_regions=4, dropout=0.0,
        compute_dtype="float32",
    )
    model = get_model(mcfg)
    tcfg = TrainConfig(learning_rate=1e-2, scst_learning_rate=1e-2,
                       donate_state=False, seed=seed)
    state = create_train_state(model.init, tcfg)
    return src, mcfg, model, tcfg, state


def test_scst_rollout_greedy_leg_matches_direct_greedy():
    src, mcfg, model, tcfg, state = _setup()
    v = src.vocab
    batch = batch_to_device_dict(next(src.dataset.batches(6)))
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=10)
    roll = rollout(state.params, batch, jax.random.PRNGKey(0))
    ctx = model.encode(state.params, batch["features"], batch["existing"],
                       batch["existing_len"])
    direct = greedy_decode(model, state.params, ctx, start_id=v.start,
                           end_id=v.end, pad_id=v.pad, max_len=10)
    np.testing.assert_array_equal(
        np.asarray(roll["greedy_tokens"]), np.asarray(direct.tokens)
    )
    assert roll["sample_tokens"].shape == (6, 10)


def test_rewarder_zero_advantage_for_identical_rollouts():
    src, *_ = _setup()
    df = NgramDocFreq.build(src.dataset.references)
    rewarder = ScstRewarder(src.vocab, df)
    toks, _ = src.vocab.encode("a man riding a horse".split(), 12)
    tokens = np.asarray([toks, toks], np.int32)
    refs = [src.dataset.references[0], src.dataset.references[1]]
    adv = rewarder.advantage(tokens, tokens, refs)
    np.testing.assert_allclose(adv, 0.0, atol=1e-9)


def test_scst_update_moves_logprob_in_advantage_direction():
    """+1 advantage on sampled tokens must raise their log-probs (REINFORCE
    sign check); -1 must lower them."""
    src, mcfg, model, tcfg, state = _setup()
    v = src.vocab
    batch = batch_to_device_dict(next(src.dataset.batches(6)))
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=8)
    roll = rollout(state.params, batch, jax.random.PRNGKey(1))
    update = make_scst_update(model, tcfg, start_id=v.start)

    from captionkit.models.base import teacher_forcing_logits

    def mean_logp(params):
        ctx = model.encode(params, batch["features"], batch["existing"],
                           batch["existing_len"])
        tokens = roll["sample_tokens"]
        B = tokens.shape[0]
        tokens_in = jnp.concatenate(
            [jnp.full((B, 1), v.start, jnp.int32), tokens[:, :-1]], axis=1
        )
        logits = teacher_forcing_logits(
            model, params, ctx, model.init_state(params, ctx), tokens_in
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        tl = jnp.take_along_axis(logp, tokens[..., None], -1)[..., 0]
        m = roll["sample_mask"].astype(jnp.float32)
        return float(jnp.sum(tl * m) / jnp.sum(m))

    before = mean_logp(state.params)
    pos = jnp.ones((6,), jnp.float32)
    s_pos, _ = update(state, batch, roll["sample_tokens"],
                      roll["sample_mask"], pos)
    assert mean_logp(s_pos.params) > before
    s_neg, _ = update(state, batch, roll["sample_tokens"],
                      roll["sample_mask"], -pos)
    assert mean_logp(s_neg.params) < before


def test_scst_full_step_runs():
    src, mcfg, model, tcfg, state = _setup()
    v = src.vocab
    batch_host = next(src.dataset.batches(6))
    batch = batch_to_device_dict(batch_host)
    df = NgramDocFreq.build(src.dataset.references)
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=10)
    update = make_scst_update(model, tcfg, start_id=v.start)
    refs = [src.dataset.references[int(i)] for i in batch_host.image_id]
    new_state, metrics = scst_train_step(
        rollout_fn=rollout, update_fn=update,
        rewarder=ScstRewarder(v, df), state=state, batch=batch,
        references=refs, rng=jax.random.PRNGKey(3),
    )
    assert int(new_state.step) == 1
    assert np.isfinite(metrics["reward_sample_minus_greedy"])
    assert np.isfinite(float(metrics["scst_loss"]))


def test_decode_split_and_results_json(tmp_path):
    src, mcfg, model, tcfg, state = _setup(num_images=10)
    ev = src.eval_view()
    from captionkit.utils.config import DecodeConfig

    dcfg = DecodeConfig(method="beam", beam_size=3, max_decode_len=10,
                        batch_size=4)
    path = str(tmp_path / "results.json")
    hyps, stats = decode_split(model, state.params, ev, dcfg,
                               results_path=path)
    assert len(hyps) == 10  # every image decoded exactly once
    assert stats["captions"] == 10
    with open(path) as f:
        dumped = json.load(f)
    assert {d["image_id"] for d in dumped} == set(range(10))
    assert all("caption" in d for d in dumped)

    # Prepared splits carry original (e.g. COCO) image ids: the written
    # cococaption-format file must key by those — external scorers match
    # them against annotation files — while the returned dict stays
    # dense-keyed for references/SCST lookups.
    import dataclasses as dc

    coco_ids = np.asarray([500000 + 3 * i for i in range(10)], np.int64)
    ev_ids = dc.replace(ev, image_ids=coco_ids)
    path2 = str(tmp_path / "results_ids.json")
    hyps2, _ = decode_split(model, state.params, ev_ids, dcfg,
                            results_path=path2)
    assert set(hyps2) == set(range(10))
    with open(path2) as f:
        dumped2 = json.load(f)
    assert {d["image_id"] for d in dumped2} == set(int(i) for i in coco_ids)


def test_evaluate_split_scores():
    src, mcfg, model, tcfg, state = _setup(num_images=8)
    ev = src.eval_view()
    from captionkit.utils.config import DecodeConfig

    dcfg = DecodeConfig(method="greedy", beam_size=1, max_decode_len=10,
                        batch_size=8)
    metrics = evaluate_split(model, state.params, ev, dcfg)
    for k in ("BLEU-4", "ROUGE-L", "CIDEr", "captions_per_sec"):
        assert k in metrics


def test_xe_loop_smoke(tmp_path):
    src, mcfg, model, tcfg, state = _setup(num_images=8)
    cfg = CaptionKitConfig(
        model=mcfg,
        train=tcfg.__class__(
            epochs=2, learning_rate=1e-2, donate_state=False,
            eval_every_epochs=1, log_every=1,
        ),
    )
    cfg = cfg.override({"data.batch_size": 8, "decode.method": "greedy",
                        "decode.beam_size": 1, "decode.max_decode_len": 10,
                        "decode.batch_size": 8})
    from captionkit.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(tmp_path / "ck"))
    state2, report = run_xe_training(
        model, state, cfg, src.dataset, src.eval_view(), ckpt=ckpt,
        max_steps=6,
    )
    assert report.epochs_run >= 1
    assert int(state2.step) > 0
    assert ckpt.latest_step() is not None
    ckpt.close()


def test_scst_loop_smoke():
    src, mcfg, model, tcfg, state = _setup(num_images=8)
    cfg = CaptionKitConfig(
        model=mcfg,
        train=tcfg.__class__(
            scst_epochs=1, scst_learning_rate=1e-3, donate_state=False,
            log_every=1,
        ),
    )
    cfg = cfg.override({"data.batch_size": 8, "decode.max_decode_len": 10,
                        "decode.method": "greedy", "decode.beam_size": 1,
                        "decode.batch_size": 8})
    state2, report = run_scst_training(
        model, state, cfg, src.dataset, None, max_steps=2,
    )
    assert int(state2.step) == 2
    assert report.epochs_run == 1


def test_decode_split_on_mesh_matches_single_device():
    """Batch-sharded DP decode over 8 virtual devices must produce the
    same captions as single-device decode (SURVEY.md §6 all-gather row)."""
    from captionkit.parallel import make_mesh
    from captionkit.utils.config import DecodeConfig

    src, mcfg, model, tcfg, state = _setup(num_images=16)
    ev = src.eval_view()
    dcfg = DecodeConfig(method="beam", beam_size=3, max_decode_len=10,
                        batch_size=8)
    hyps_1, _ = decode_split(model, state.params, ev, dcfg)
    mesh = make_mesh((8,), ("data",))
    hyps_8, _ = decode_split(model, state.params, ev, dcfg, mesh=mesh)
    assert hyps_1 == hyps_8


def test_scst_pipelined_loop_runs_and_counts_steps():
    """pipeline=True must process every batch exactly once (one-step-stale
    rollouts) and produce finite advantages."""
    src, mcfg, model, tcfg, state = _setup(num_images=12)
    cfg = CaptionKitConfig(
        model=mcfg,
        train=tcfg.__class__(
            scst_epochs=1, scst_learning_rate=1e-3, donate_state=False,
            log_every=1,
        ),
    )
    cfg = cfg.override({"data.batch_size": 6, "decode.max_decode_len": 10,
                        "decode.method": "greedy", "decode.beam_size": 1,
                        "decode.batch_size": 12})
    state2, report = run_scst_training(
        model, state, cfg, src.dataset, None, pipeline=True,
    )
    # 12 images x 2 captions = 24 rows -> 4 batches of 6.
    assert int(state2.step) == 4
    assert np.isfinite(report.history[0]["mean_advantage"])


def test_scst_pipelined_respects_max_steps():
    src, mcfg, model, tcfg, state = _setup(num_images=12)
    cfg = CaptionKitConfig(
        model=mcfg,
        train=tcfg.__class__(scst_epochs=1, donate_state=False, log_every=1),
    )
    cfg = cfg.override({"data.batch_size": 6, "decode.max_decode_len": 10,
                        "decode.method": "greedy", "decode.beam_size": 1,
                        "decode.batch_size": 12})
    state2, _ = run_scst_training(
        model, state, cfg, src.dataset, None, pipeline=True, max_steps=2,
    )
    assert int(state2.step) == 2


def test_decode_split_stats_semantics():
    """wall_s covers the whole split (compile batch included);
    captions_per_sec is steady-state only, so it reads 0.0 for a
    single-batch split and positive once later batches exist."""
    src, mcfg, model, tcfg, state = _setup(num_images=12)
    ev = src.eval_view()
    from captionkit.utils.config import DecodeConfig

    one = DecodeConfig(method="greedy", max_decode_len=8, batch_size=16)
    _, stats1 = decode_split(model, state.params, ev, one)
    assert stats1["captions"] == 12
    assert stats1["wall_s"] > 0.001  # whole split, not post-compile only
    assert stats1["captions_per_sec"] == 0.0  # no steady-state window

    many = DecodeConfig(method="greedy", max_decode_len=8, batch_size=4)
    _, stats2 = decode_split(model, state.params, ev, many)
    assert stats2["captions"] == 12
    assert stats2["captions_per_sec"] > 0.0
    assert stats2["wall_s"] > 0.0


def test_decode_split_beam_impl_config_plumbing():
    """DecodeConfig.beam_impl reaches beam_search through the driver:
    both history layouts produce identical captions for a whole split."""
    from captionkit.utils.config import DecodeConfig

    src, mcfg, model, tcfg, state = _setup(seed=11)
    ev = src.eval_view()
    base = dict(method="beam", beam_size=3, max_decode_len=8, batch_size=8)
    hyps_reg, _ = decode_split(
        model, state.params, ev, DecodeConfig(**base, beam_impl="register"))
    hyps_bp, _ = decode_split(
        model, state.params, ev, DecodeConfig(**base, beam_impl="backptr"))
    assert hyps_reg == hyps_bp
    assert len(hyps_reg) == 12  # every image captioned


# -------------------------------------------------------- multi-sample SCST


def test_advantage_loo_math():
    """Leave-one-out baseline: hand-checked on fabricated rewards."""
    from captionkit.train.scst import ScstRewarder

    src, mcfg, model, tcfg, state = _setup()
    df = NgramDocFreq.build(src.dataset.references)
    rw = ScstRewarder(src.vocab, df)

    rewards = np.asarray([[1.0, 0.0], [3.0, 2.0], [5.0, 4.0]], np.float32)

    class _StubScorer:
        def compute(self, hyps, refs):
            return 0.0, rewards.reshape(-1)

        def score(self, hyps, refs):
            return rewards.reshape(-1)

    rw._native = None
    rw.scorer = _StubScorer()
    toks = np.zeros((3, 2, 5), np.int32)  # shapes only; scorer is stubbed
    refs = [[["a"]], [["b"]]]
    adv, r = rw.advantage_loo(toks, refs)
    assert r.shape == (3, 2)
    # sample 0, image 0: baseline = (3+5)/2 = 4 -> adv = -3
    np.testing.assert_allclose(adv[:, 0], [1 - 4.0, 3 - 3.0, 5 - 2.0])
    np.testing.assert_allclose(adv[:, 1], [0 - 3.0, 2 - 2.0, 4 - 1.0])
    # advantages sum to zero per image (property of the loo baseline)
    np.testing.assert_allclose(adv.sum(axis=0), [0.0, 0.0], atol=1e-6)


def test_multisample_rollout_shapes_and_distinct_samples():
    src, mcfg, model, tcfg, state = _setup()
    v = src.vocab
    batch = batch_to_device_dict(next(src.dataset.batches(6)))
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=10, num_samples=3)
    roll = rollout(state.params, batch, jax.random.PRNGKey(0))
    assert "greedy_tokens" not in roll  # no greedy leg at n>1
    toks = np.asarray(roll["sample_tokens"])
    assert toks.shape == (3, 6, 10)
    # different rng per sample: at least one pair differs
    assert not (np.array_equal(toks[0], toks[1])
                and np.array_equal(toks[1], toks[2]))


def test_multisample_equal_rewards_give_zero_gradient():
    """If every sample of an image earns the same reward, the loo
    advantage is exactly zero and the update must be a no-op gradient."""
    from captionkit.train.scst import ScstRewarder, scst_train_step

    src, mcfg, model, tcfg, state = _setup()
    v = src.vocab
    df = NgramDocFreq.build(src.dataset.references)
    rw = ScstRewarder(src.vocab, df)

    class _Const:
        def compute(self, hyps, refs):
            return 0.0, np.ones(len(hyps), np.float32)

    rw._native = None
    rw.scorer = _Const()
    batch = batch_to_device_dict(next(src.dataset.batches(6)))
    refs = [src.dataset.references[int(i)] for i in range(6)]
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=10, num_samples=2)
    update = make_scst_update(model, tcfg, start_id=v.start, num_samples=2)
    _, metrics = scst_train_step(
        rollout_fn=rollout, update_fn=update, rewarder=rw, state=state,
        batch=batch, references=refs, rng=jax.random.PRNGKey(1),
    )
    assert float(metrics["grad_norm"]) < 1e-6
    assert float(metrics["mean_advantage"]) == 0.0
    assert "reward_sample_mean" in metrics


def test_multisample_scst_loop_smoke():
    """run_scst_training end to end with scst_num_samples=3 (serial and
    pipelined share apply_rollout, so one mode suffices)."""
    import dataclasses

    src, mcfg, model, tcfg, state = _setup(num_images=12)
    cfg = CaptionKitConfig(
        model=mcfg,
        train=dataclasses.replace(tcfg, scst_epochs=1, scst_num_samples=3,
                                  log_every=1),
    ).override({"data.batch_size": 6, "decode.max_decode_len": 10})
    state2, report = run_scst_training(
        model, state, cfg, src.dataset, None, max_steps=2,
    )
    assert report.epochs_run == 1
    assert np.isfinite(report.history[0]["mean_advantage"])
    assert int(jax.device_get(state2.step)) == 2


def test_multisample_scst_on_mesh():
    """n=2 rollout+update compile and run on the 8-device mesh (stacked
    [n, B, ...] leaves shard on the batch axis, not the sample axis)."""
    from captionkit.train.scst import ScstRewarder, scst_train_step

    from captionkit.parallel import make_mesh, shard_batch_arrays

    src, mcfg, model, tcfg, state = _setup(num_images=16)
    v = src.vocab
    mesh = make_mesh((8,), ("data",))
    batch = shard_batch_arrays(mesh,
                               batch_to_device_dict(
                                   next(src.dataset.batches(16))))
    df = NgramDocFreq.build(src.dataset.references)
    rw = ScstRewarder(src.vocab, df)
    refs = [src.dataset.references[int(i)]
            for i in np.asarray(jax.device_get(batch["image_id"]))] \
        if "image_id" in batch else [src.dataset.references[i % 12]
                                     for i in range(16)]
    rollout = make_scst_rollout(model, start_id=v.start, end_id=v.end,
                                pad_id=v.pad, max_len=10, num_samples=2,
                                mesh=mesh)
    update = make_scst_update(model, tcfg, start_id=v.start, mesh=mesh,
                              num_samples=2)
    state2, metrics = scst_train_step(
        rollout_fn=rollout, update_fn=update, rewarder=rw, state=state,
        batch=batch, references=refs, rng=jax.random.PRNGKey(2),
    )
    assert np.isfinite(float(metrics["scst_loss"]))


def test_decode_split_sampling_truncation_plumbing():
    """DecodeConfig.top_k/top_p reach sample_decode through the driver:
    method="sample" with top_k=1 is deterministic argmax, so it must
    produce the exact greedy captions; untruncated sampling at a high
    temperature must not (otherwise the knob isn't plumbed)."""
    src, mcfg, model, tcfg, state = _setup(num_images=12)
    ev = src.eval_view()
    from captionkit.utils.config import DecodeConfig

    base = dict(method="sample", max_decode_len=10, batch_size=8, seed=3)
    greedy = DecodeConfig(method="greedy", max_decode_len=10, batch_size=8)
    hyps_g, _ = decode_split(model, state.params, ev, greedy)
    hyps_k1, _ = decode_split(
        model, state.params, ev, DecodeConfig(top_k=1, **base))
    assert hyps_k1 == hyps_g

    hyps_free, _ = decode_split(
        model, state.params, ev,
        DecodeConfig(temperature=5.0, **base))
    assert hyps_free != hyps_g  # plain multinomial at T=5 diverges
