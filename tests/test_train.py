"""Training tests: loss goes down, DP invariance over mesh sizes,
checkpoint/resume (SURVEY.md §5 items 5 + aux)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from captionkit.data import SyntheticCaptionSource
from captionkit.models import get_model
from captionkit.parallel import make_mesh, shard_batch_arrays
from captionkit.train import (
    CheckpointManager,
    TrainState,
    create_train_state,
    make_eval_loss_step,
    make_xe_train_step,
)
from captionkit.train.xe import batch_to_device_dict, xe_loss
from captionkit.utils.config import ModelConfig, TrainConfig

MCFG = dict(
    vocab_size=0,  # filled from vocab
    emb_dim=16, hidden_dim=24, att_dim=8, feat_dim=12, num_regions=4,
    dropout=0.0, compute_dtype="float32",
)


def _setup(arch="editnet", num_images=16, batch_size=16, seed=0, **over):
    src = SyntheticCaptionSource(
        num_images=num_images, captions_per_image=2, num_regions=4,
        feat_dim=12, max_len=12, seed=seed,
    )
    cfg = dict(MCFG, **over)
    cfg["vocab_size"] = len(src.vocab)
    mcfg = ModelConfig(arch=arch, **cfg)
    model = get_model(mcfg)
    tcfg = TrainConfig(learning_rate=1e-2, grad_clip=5.0, seed=seed,
                       donate_state=False)
    state = create_train_state(model.init, tcfg)
    batch = batch_to_device_dict(next(src.dataset.batches(batch_size)))
    return src, model, tcfg, state, batch


@pytest.mark.parametrize("arch", ["dcnet", "editnet"])
def test_xe_loss_decreases(arch):
    src, model, tcfg, state, batch = _setup(arch)
    step = make_xe_train_step(model, tcfg)
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.8, losses
    assert np.isfinite(losses).all()


def test_xe_loss_ignores_invalid_rows():
    src, model, tcfg, state, batch = _setup("editnet")
    loss_a, _ = xe_loss(
        model, state.params, batch["features"], batch["existing"],
        batch["existing_len"], batch["target"], batch["target_len"],
        batch["valid"], train=False,
    )
    # Mark half the rows invalid and corrupt them — loss over the valid
    # half must not see the corruption.
    valid = batch["valid"].at[8:].set(False)
    target_bad = batch["target"].at[8:].set(1)
    loss_b, _ = xe_loss(
        model, state.params, batch["features"], batch["existing"],
        batch["existing_len"], target_bad, batch["target_len"], valid,
        train=False,
    )
    loss_c, _ = xe_loss(
        model, state.params, batch["features"], batch["existing"],
        batch["existing_len"], batch["target"], batch["target_len"], valid,
        train=False,
    )
    np.testing.assert_allclose(float(loss_b), float(loss_c), atol=1e-6)
    assert not np.allclose(float(loss_a), float(loss_b))


def test_dp_mesh_sizes_agree():
    """Same global batch, mesh of 1 vs 8 devices -> identical loss
    trajectory (SURVEY.md §5 item 5)."""
    assert len(jax.devices()) >= 8, "conftest should provide 8 cpu devices"

    def run(n_dev):
        src, model, tcfg, state, batch = _setup("editnet", seed=3)
        mesh = make_mesh((n_dev,), ("data",),
                         devices=jax.devices()[:n_dev])
        step = make_xe_train_step(model, tcfg, mesh)
        batch_sh = shard_batch_arrays(mesh, batch)
        losses = []
        for _ in range(3):
            state, m = step(state, batch_sh)
            losses.append(float(m["loss"]))
        return losses

    l1 = run(1)
    l8 = run(8)
    np.testing.assert_allclose(l1, l8, rtol=2e-5)


def test_dp_two_level_mesh_agrees():
    """2-level ('dcn', 'ici') mesh — pure DP over BOTH axes (SURVEY.md
    §3.5 'keeps a (dcn, ici) 2-level mesh option open'): same global
    batch on a (2, 4) grid must reproduce the single-device trajectory;
    the batch shards over all 8 devices and the gradient psum becomes a
    hierarchical reduction."""
    assert len(jax.devices()) >= 8

    def run(shape, names, n_dev):
        src, model, tcfg, state, batch = _setup("editnet", seed=3)
        mesh = make_mesh(shape, names, devices=jax.devices()[:n_dev])
        step = make_xe_train_step(model, tcfg, mesh)
        batch_sh = shard_batch_arrays(mesh, batch)
        losses = []
        for _ in range(3):
            state, m = step(state, batch_sh)
            losses.append(float(m["loss"]))
        return losses

    l1 = run((1,), ("data",), 1)
    l24 = run((2, 4), ("dcn", "ici"), 8)
    np.testing.assert_allclose(l1, l24, rtol=2e-5)


def test_eval_loss_step_matches_train_loss_at_step0():
    src, model, tcfg, state, batch = _setup("dcnet")
    eval_step = make_eval_loss_step(model)
    m = eval_step(state.params, batch)
    train_step = make_xe_train_step(model, tcfg)
    _, m2 = train_step(state, batch)
    # dropout=0 so train-mode loss at the same params matches eval loss.
    np.testing.assert_allclose(float(m["loss"]), float(m2["loss"]),
                               rtol=1e-5)


def test_checkpoint_save_restore_roundtrip(tmp_path):
    src, model, tcfg, state, batch = _setup("editnet")
    step = make_xe_train_step(model, tcfg)
    for _ in range(2):
        state, _ = step(state, batch)
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    is_best = mgr.save(state, metric=0.5)
    assert is_best
    assert mgr.save(state, metric=0.4) is False  # not an improvement
    template = create_train_state(model.init, tcfg)
    restored = mgr.restore(template)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Training continues identically from the restored state.
    s1, m1 = step(state, batch)
    s2, m2 = step(restored, batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    mgr.close()


def test_params_npz_roundtrip(tmp_path):
    from captionkit.train.checkpoint import load_params_npz, save_params_npz

    src, model, tcfg, state, batch = _setup("dcnet")
    path = str(tmp_path / "params.npz")
    save_params_npz(state.params, path)
    zeros = jax.tree.map(
        lambda x: jnp.zeros_like(x) if x is not None else None,
        state.params,
        is_leaf=lambda x: x is None,
    )
    loaded = load_params_npz(zeros, path)
    for a, b in zip(jax.tree.leaves(loaded), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_make_mesh_helpers():
    m = make_mesh((-1,), ("data",))
    assert m.devices.size == len(jax.devices())
    m2 = make_mesh((2, 4), ("dcn", "ici"))
    assert m2.axis_names == ("dcn", "ici")
    with pytest.raises(ValueError):
        make_mesh((16,), ("data",))


def test_checkpoint_best_survives_rotation(tmp_path):
    """The best checkpoint must survive max_to_keep garbage collection
    (reference '*BEST.pth.tar' semantics)."""
    src, model, tcfg, state, batch = _setup("dcnet")
    step = make_xe_train_step(model, tcfg)
    mgr = CheckpointManager(str(tmp_path / "ck"), keep=2)
    best_state = state
    mgr.save(state, metric=0.9)  # the best, at step 0
    for _ in range(4):  # rotate far past keep=2
        state, _ = step(state, batch)
        mgr.save(state, metric=0.1)
    assert mgr.best_step() == 0
    template = create_train_state(model.init, tcfg)
    restored = mgr.restore_best(template)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(best_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    mgr.close()


def test_label_smoothing_reaches_loss():
    import dataclasses

    from captionkit.train.loop import run_xe_training
    from captionkit.utils.config import CaptionKitConfig

    src, model, tcfg, state, batch = _setup("editnet", seed=5)
    losses = {}
    for ls in (0.0, 0.3):
        cfg = CaptionKitConfig(
            model=dataclasses.replace(
                ModelConfig(arch="editnet", **{**MCFG,
                                               "vocab_size": len(src.vocab)})
            ),
            train=dataclasses.replace(tcfg, label_smoothing=ls, epochs=1),
        ).override({"data.batch_size": 16})
        st = create_train_state(model.init, tcfg)
        _, report = run_xe_training(model, st, cfg, src.dataset, None,
                                    max_steps=1)
        losses[ls] = report.history[0]["loss"]
    assert losses[0.0] != losses[0.3]


def test_xe_loop_with_buckets(monkeypatch):
    """Bucketed training runs end to end and matches the unbucketed first-
    step loss (same batch content, shorter static widths). The spy asserts
    the bucketing path is genuinely exercised — an earlier version of this
    test passed vacuously while the loop ignored the config."""
    import dataclasses

    import captionkit.data.pipeline as pipeline_mod
    from captionkit.train.loop import run_xe_training
    from captionkit.utils.config import CaptionKitConfig, DataConfig

    src, model, tcfg, state, batch = _setup("editnet", seed=9)
    seen_widths: list[int] = []
    real_bucket = pipeline_mod.bucket_batches

    def spy(batches, boundaries):
        for b in real_bucket(batches, boundaries):
            seen_widths.append(b.existing.shape[1])
            yield b

    monkeypatch.setattr(pipeline_mod, "bucket_batches", spy)

    def first_loss(buckets):
        cfg = CaptionKitConfig(
            model=ModelConfig(arch="editnet",
                              **{**MCFG, "vocab_size": len(src.vocab)}),
            data=DataConfig(batch_size=16, bucket_boundaries=buckets),
            train=dataclasses.replace(tcfg, epochs=1, log_every=1),
        )
        st = create_train_state(model.init, tcfg)
        _, report = run_xe_training(model, st, cfg, src.dataset, None,
                                    max_steps=1)
        return report.history[0]["loss"]

    plain = first_loss(())
    assert not seen_widths  # no buckets -> bucketing not invoked
    bucketed = first_loss((6, 9, 12))
    assert seen_widths, "bucket_batches was never invoked by the loop"
    assert all(w <= 12 for w in seen_widths)
    np.testing.assert_allclose(plain, bucketed, rtol=1e-5)


def test_multistep_matches_single_step_trajectory():
    """k scanned steps must be bit-compatible with k sequential single
    steps: same batches, same fold_in(rng, step) dropout keys, same Adam
    math (VERDICT r1 weak #2 — dispatch amortization must not change the
    trajectory)."""
    from captionkit.train.xe import make_xe_train_multistep

    src, model, tcfg, state0, _ = _setup("editnet", num_images=32,
                                         batch_size=8)
    batches = [batch_to_device_dict(b)
               for b in src.dataset.batches(8, shuffle=True, seed=1)][:4]

    step = make_xe_train_step(model, tcfg)
    state_a = state0
    losses_a = []
    for b in batches:
        state_a, m = step(state_a, b)
        losses_a.append(float(m["loss"]))

    multi = make_xe_train_multistep(model, tcfg)
    stacked = {k: jnp.stack([b[k] for b in batches]) for k in batches[0]}
    state_b, metrics = multi(state0, stacked)
    losses_b = [float(x) for x in metrics["loss"]]

    np.testing.assert_allclose(losses_a, losses_b, rtol=1e-6)
    assert int(state_b.step) == int(state_a.step) == 4
    for a, b in zip(jax.tree.leaves(state_a.params),
                    jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_multistep_on_mesh():
    from captionkit.train.xe import make_xe_train_multistep

    src, model, tcfg, state0, _ = _setup("editnet", num_images=32,
                                         batch_size=8)
    mesh = make_mesh((8,), ("data",))
    batches = [batch_to_device_dict(b)
               for b in src.dataset.batches(8)][:2]
    stacked = {k: np.stack([np.asarray(b[k]) for b in batches])
               for k in batches[0]}
    dev = shard_batch_arrays(mesh, stacked, stacked=True)
    multi = make_xe_train_multistep(model, tcfg, mesh)
    state, metrics = multi(state0, dev)
    assert np.isfinite(np.asarray(metrics["loss"])).all()
    assert int(state.step) == 2


def test_pack_host_batches_grouping_and_budget():
    from captionkit.train.loop import _pack_host_batches

    def hb(t):  # host batch with caption width t
        return {"target": np.zeros((4, t)), "valid": np.ones((4,), bool)}

    # same-shape stream, k=3: two packs + one single tail
    out = list(_pack_host_batches([hb(8)] * 7, 3))
    assert [kind for kind, _ in out] == ["multi", "multi", "single"]
    assert out[0][1]["target"].shape == (3, 4, 8)

    # bucketing shape change flushes the buffer as singles
    out = list(_pack_host_batches([hb(8), hb(8), hb(12), hb(12), hb(12)], 3))
    assert [kind for kind, _ in out] == ["single", "single", "multi"]
    assert out[2][1]["target"].shape == (3, 4, 12)

    # budget forbids an overshooting pack and stops exactly at the budget
    out = list(_pack_host_batches([hb(8)] * 9, 4, budget=6))
    kinds = [kind for kind, _ in out]
    steps = sum(4 if kk == "multi" else 1 for kk, _ in out)
    assert steps == 6, (kinds, steps)


def test_xe_loop_multistep_respects_max_steps():
    import dataclasses

    from captionkit.train.loop import run_xe_training
    from captionkit.utils.config import CaptionKitConfig, DataConfig

    src, model, tcfg, state, _ = _setup("editnet", num_images=32,
                                        batch_size=8)
    tcfg = dataclasses.replace(tcfg, steps_per_dispatch=4, epochs=1,
                               log_every=3)
    cfg = CaptionKitConfig(
        model=ModelConfig(arch="editnet", **{**MCFG,
                          "vocab_size": len(src.vocab)}),
        train=tcfg,
        data=DataConfig(batch_size=8, max_len=12),
    )
    state, report = run_xe_training(
        model, state, cfg, src.dataset, None, max_steps=6,
    )
    assert int(state.step) == 6
    assert np.isfinite(report.history[-1]["loss"])


def test_xe_step_hard_scma():
    """SURVEY.md §8.3 #1: the hard-selection knob must train, not just
    decode — straight-through gradients flow through the XE step scan."""
    src, model, tcfg, state, batch = _setup("editnet", scma_select="hard")
    step = make_xe_train_step(model, tcfg)
    enc_before = np.asarray(jax.tree.leaves(state.params.encoder)[0]).copy()
    scma_before = np.asarray(jax.tree.leaves(state.params.scma)[0]).copy()
    losses = []
    for _ in range(25):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0] * 0.8, losses
    # The encoder and the SCMA scorer sit behind the hard gather; the
    # straight-through estimator must still deliver them gradient.
    assert not np.array_equal(
        enc_before, np.asarray(jax.tree.leaves(state.params.encoder)[0]))
    assert not np.array_equal(
        scma_before, np.asarray(jax.tree.leaves(state.params.scma)[0]))


# ------------------------------------------------------------- preemption


def _loop_cfg(src, tcfg, epochs=50):
    import dataclasses

    from captionkit.utils.config import CaptionKitConfig

    return CaptionKitConfig(
        model=ModelConfig(arch="editnet",
                          **{**MCFG, "vocab_size": len(src.vocab)}),
        train=dataclasses.replace(tcfg, epochs=epochs),
    ).override({"data.batch_size": 16})


def test_preemption_guard_signal_latch_and_restore():
    """The guard latches the signal into a flag and restores the previous
    handler on exit (SIGUSR1 so a failure can't kill pytest)."""
    import signal

    from captionkit.utils.preemption import PreemptionGuard

    prev = signal.getsignal(signal.SIGUSR1)
    with PreemptionGuard(signals=(signal.SIGUSR1,)) as guard:
        assert not guard.requested
        signal.raise_signal(signal.SIGUSR1)
        assert guard.requested
    assert signal.getsignal(signal.SIGUSR1) is prev


def test_xe_preemption_checkpoints_and_exits(tmp_path):
    """A preemption request makes the XE loop drain, checkpoint at the
    exact step, and return early with report.preempted; resume restores
    that step."""
    from captionkit.train.loop import run_xe_training
    from captionkit.utils.preemption import PreemptionGuard

    src, model, tcfg, state, _ = _setup("editnet", seed=6)
    cfg = _loop_cfg(src, tcfg)
    mgr = CheckpointManager(str(tmp_path / "pre"), keep=2)
    guard = PreemptionGuard(signals=())
    import threading

    # Fire mid-run: the loop polls at dispatch boundaries, so whenever the
    # timer lands the exit is clean. (request() is thread-safe.)
    threading.Timer(0.5, guard.request).start()
    state2, report = run_xe_training(
        model, state, cfg, src.dataset, None, ckpt=mgr,
        max_steps=100_000, preemption=guard,
    )
    assert report.preempted is True
    assert report.history[-1]["preempted"] is True
    step = int(jax.device_get(state2.step))
    assert 0 < step < 100_000
    restored = mgr.restore(state)
    assert int(jax.device_get(restored.step)) == step
    mgr.close()


def test_xe_preemption_before_first_step(tmp_path):
    """Already-requested guard: the loop exits without dispatching."""
    from captionkit.train.loop import run_xe_training
    from captionkit.utils.preemption import PreemptionGuard

    src, model, tcfg, state, _ = _setup("editnet", seed=7)
    cfg = _loop_cfg(src, tcfg, epochs=2)
    guard = PreemptionGuard(signals=())
    guard.request()
    state2, report = run_xe_training(
        model, state, cfg, src.dataset, None, preemption=guard,
    )
    assert report.preempted is True
    assert int(jax.device_get(state2.step)) == 0


def test_scst_preemption_exits_cleanly(tmp_path):
    from captionkit.train.loop import run_scst_training
    from captionkit.utils.preemption import PreemptionGuard

    src, model, tcfg, state, _ = _setup("editnet", seed=8)
    cfg = _loop_cfg(src, tcfg, epochs=2)
    guard = PreemptionGuard(signals=())
    guard.request()
    mgr = CheckpointManager(str(tmp_path / "spre"), keep=2)
    _, report = run_scst_training(
        model, state, cfg, src.dataset, None, ckpt=mgr,
        pipeline=True, preemption=guard,
    )
    assert report.preempted is True
    mgr.close()


# ---------------------------------------------------------------------------
# EMA (Polyak) parameter averaging — train.state.ema_weights / ema_params.
# ---------------------------------------------------------------------------

def test_ema_matches_hand_recurrence():
    """The opt_state-carried EMA equals the hand recurrence over the raw
    parameter trajectory, and never perturbs that trajectory."""
    from captionkit.train.state import ema_params

    decay = 0.8
    src, model, tcfg, state, batch = _setup("editnet")
    tcfg_ema = TrainConfig(learning_rate=1e-2, grad_clip=5.0, seed=0,
                           donate_state=False, ema_decay=decay)
    state_ema = create_train_state(model.init, tcfg_ema)
    step_plain = make_xe_train_step(model, tcfg)
    step_ema = make_xe_train_step(model, tcfg_ema)

    assert ema_params(state) is None  # decay=0 run carries no EMA
    hand = jax.tree.map(np.asarray, state_ema.params)
    for _ in range(4):
        state, _ = step_plain(state, batch)
        state_ema, _ = step_ema(state_ema, batch)
        hand = jax.tree.map(
            lambda e, p: decay * e + (1 - decay) * np.asarray(p),
            hand, state_ema.params,
        )
    # Same training trajectory with and without the EMA tail.
    for a, b in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(state_ema.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
    avg = ema_params(state_ema)
    assert avg is not None
    for a, b in zip(jax.tree.leaves(avg), jax.tree.leaves(hand)):
        np.testing.assert_allclose(np.asarray(a), b, rtol=1e-5, atol=1e-6)
    # And the EMA is genuinely not the raw params after 4 steps.
    diffs = [float(np.abs(np.asarray(a) - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(avg),
                             jax.tree.leaves(state_ema.params))]
    assert max(diffs) > 1e-6


def test_ema_checkpoint_roundtrip(tmp_path):
    from captionkit.train.state import ema_params

    src, model, _, _, batch = _setup("editnet")
    tcfg = TrainConfig(learning_rate=1e-2, seed=0, donate_state=False,
                       ema_decay=0.9, checkpoint_dir=str(tmp_path))
    state = create_train_state(model.init, tcfg)
    step = make_xe_train_step(model, tcfg)
    for _ in range(2):
        state, _ = step(state, batch)
    ckpt = CheckpointManager(str(tmp_path), keep=1)
    ckpt.save(state)
    ckpt.close()
    template = create_train_state(model.init, tcfg)
    ckpt2 = CheckpointManager(str(tmp_path), keep=1)
    restored = ckpt2.restore(template)
    ckpt2.close()
    for a, b in zip(jax.tree.leaves(ema_params(state)),
                    jax.tree.leaves(ema_params(restored))):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ema_decay_validated():
    from captionkit.train.state import make_optimizer

    with pytest.raises(ValueError, match="ema_decay"):
        make_optimizer(TrainConfig(ema_decay=1.5))
    # A negative decay (sign typo) must raise too, not silently
    # disable EMA (round-4 advisor finding).
    with pytest.raises(ValueError, match="ema_decay"):
        make_optimizer(TrainConfig(ema_decay=-0.5))


def test_ema_init_does_not_alias_params():
    """EmaState.ema must be a COPY of the initial params: jnp.asarray
    aliases committed buffers, and the first donate_state=True dispatch
    then donates the same buffer under two arguments — the TPU backend
    rejects that with INVALID_ARGUMENT (chip-bisected, session 9). CPU
    tolerates the aliasing, so this pins the invariant by buffer
    pointer."""
    from captionkit.train.state import ema_params

    src, model, _, _, batch = _setup("editnet")
    tcfg = TrainConfig(learning_rate=1e-2, seed=0, donate_state=True,
                       ema_decay=0.9)
    state = create_train_state(model.init, tcfg)
    for p, e in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(ema_params(state))):
        assert (p.unsafe_buffer_pointer() != e.unsafe_buffer_pointer()), \
            "EMA leaf aliases a param buffer at init"
    # And the donating step itself runs (the CPU backend would accept the
    # aliased form too — the pointer check above is the real guard).
    step = make_xe_train_step(model, tcfg)
    state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_xe_loop_validates_with_ema_weights(monkeypatch):
    """With train.ema_decay > 0 the validation decode must score the EMA
    weights, not the raw params (spy on evaluate_split's params)."""
    import dataclasses

    import captionkit.train.loop as loop_mod
    from captionkit.train.loop import run_xe_training
    from captionkit.train.state import ema_params
    from captionkit.utils.config import CaptionKitConfig, DataConfig, \
        DecodeConfig

    src, model, tcfg, state, batch = _setup("editnet", seed=11)
    tcfg = dataclasses.replace(tcfg, ema_decay=0.9, epochs=1, log_every=1,
                               eval_every_epochs=1)
    cfg = CaptionKitConfig(
        model=ModelConfig(arch="editnet",
                          **{**MCFG, "vocab_size": len(src.vocab)}),
        data=DataConfig(batch_size=16),
        train=tcfg,
        decode=DecodeConfig(method="greedy", beam_size=1,
                            max_decode_len=10, batch_size=16),
    )
    seen = []
    real = loop_mod.evaluate_split

    def spy(model_, params_, *a, **kw):
        seen.append(params_)
        return real(model_, params_, *a, **kw)

    monkeypatch.setattr(loop_mod, "evaluate_split", spy)
    st = create_train_state(model.init, tcfg)
    st, report = run_xe_training(model, st, cfg, src.dataset,
                                 src.eval_view(), max_steps=2)
    assert seen, "validation never ran"
    want = ema_params(st)
    got_leaves = jax.tree.leaves(seen[-1])
    for a, b in zip(got_leaves, jax.tree.leaves(want)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # And NOT the raw params (they differ after training steps).
    raw_leaves = jax.tree.leaves(st.params)
    assert any(
        np.abs(np.asarray(a) - np.asarray(b)).max() > 0
        for a, b in zip(got_leaves, raw_leaves)
    )
