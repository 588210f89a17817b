"""Host-side epoch drivers for XE and SCST training.

Rebuilds the reference train scripts' outer loops (SURVEY.md §3.3): epoch
iteration, periodic validation by decoding the val split and scoring CIDEr,
best-checkpointing, lr decay on plateau, early stop. All device work happens
in the jitted steps from xe.py / scst.py; this module only moves batches and
bookkeeping.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from typing import Any, Optional

import jax
import numpy as np

from captionkit.data.sources import CaptionDataset
from captionkit.decode.driver import evaluate_split
from captionkit.metrics.cider import NgramDocFreq
from captionkit.models.base import ModelDef
from captionkit.parallel.mesh import shard_batch_arrays
from captionkit.train.checkpoint import CheckpointManager
from captionkit.train.scst import (
    ScstRewarder,
    make_scst_rollout,
    make_scst_update,
    scst_train_step,
)
from captionkit.train.state import TrainState
from captionkit.train.xe import (
    batch_to_device_dict,
    make_xe_train_multistep,
    make_xe_train_step,
)
from captionkit.utils.config import CaptionKitConfig
from captionkit.utils.logging import MetricsLogger

log = logging.getLogger("captionkit.train")


def _host_dict(batch) -> dict:
    """Batch -> host NumPy dict; device placement happens in prefetch."""
    return {
        "features": batch.features,
        "existing": batch.existing,
        "existing_len": batch.existing_len,
        "target": batch.target,
        "target_len": batch.target_len,
        "valid": batch.valid,
    }


class AverageMeter:
    """Running average — the reference's training-loop telemetry unit
    (SURVEY.md §6 metrics row)."""

    def __init__(self) -> None:
        self.sum = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1) -> None:
        self.sum += float(value) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / self.count if self.count else 0.0


@dataclass
class TrainReport:
    epochs_run: int = 0
    best_metric: float = float("-inf")
    best_epoch: int = -1
    history: list[dict[str, float]] = field(default_factory=list)
    # True when the run exited early on a caught termination signal
    # (utils.preemption.PreemptionGuard) after checkpointing.
    preempted: bool = False


def _make_val_decode_fn(model, val_dataset, cfg, mesh):
    """Build the validation decode program ONCE per training run — a fresh
    make_decode_fn per epoch would re-trace and re-compile the beam search
    every validation, and would ignore the mesh."""
    from captionkit.decode.driver import make_decode_fn

    v = val_dataset.vocab
    return make_decode_fn(
        model, cfg.decode, start_id=v.start, end_id=v.end, pad_id=v.pad,
        mesh=mesh,
    )


def _validate(model, state, val_dataset, cfg, decode_fn=None) -> float:
    # No external (JVM) scorers inside the training loop: SPICE alone can
    # take minutes per call, and val CIDEr is the only signal used here
    # (best-ckpt / early-stop / lr-decay). ADVICE r1.
    from captionkit.metrics.eval import CaptionEvaluator
    from captionkit.train.state import ema_params

    # With train.ema_decay > 0 the shippable weights are the Polyak
    # average, so that is what validation (and therefore best-checkpoint
    # selection / early stopping / lr decay) scores.
    avg = ema_params(state)
    metrics = evaluate_split(
        model, state.params if avg is None else avg, val_dataset,
        cfg.decode, decode_fn=decode_fn,
        evaluator=CaptionEvaluator(use_external=False),
    )
    log.info("val metrics%s: %s", "" if avg is None else " (EMA weights)",
             {k: round(v, 4) for k, v in metrics.items()})
    return metrics.get("CIDEr", 0.0)


def _pack_host_batches(host_batches, k: int, budget=None):
    """Group consecutive same-shape host batches into k-stacks for the
    multi-step program; odd ones out (bucketing shape changes, epoch
    tails, max_steps budget tails) pass through as singles.

    Yields ("multi", stacked_dict) with leaves [k, B, ...] or
    ("single", dict). Never emits more than `budget` total steps.
    """
    emitted = 0

    def _left():
        return float("inf") if budget is None else budget - emitted

    def _sig(hb):
        return tuple(sorted((key, np.shape(v)) for key, v in hb.items()))

    buf: list = []
    sig = None
    it = iter(host_batches)
    while True:
        hb = next(it, None)
        flush = hb is None or (buf and _sig(hb) != sig)
        if flush:
            for b in buf:
                if _left() <= 0:
                    return
                emitted += 1
                yield ("single", b)
            buf = []
        if hb is None:
            return
        if _left() <= 0:
            return
        buf.append(hb)
        sig = _sig(hb)
        if len(buf) == k:
            if _left() >= k:
                emitted += k
                yield (
                    "multi",
                    {key: np.stack([b[key] for b in buf])
                     for key in buf[0]},
                )
            else:
                for b in buf:
                    if _left() <= 0:
                        return
                    emitted += 1
                    yield ("single", b)
            buf = []


def _prefetch_packs(packs, mesh, size: int = 2):
    """Tagged-pack variant of prefetch_to_device: keeps `size` packs
    resident on device (multi packs use the stacked [k, B] sharding)."""
    import collections

    def _put(item):
        kind, hb = item
        if mesh is not None:
            return kind, shard_batch_arrays(mesh, hb,
                                            stacked=(kind == "multi"))
        return kind, jax.tree.map(jax.device_put, hb)

    queue: collections.deque = collections.deque()
    it = iter(packs)
    for _ in range(size):
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            break
    while queue:
        out = queue.popleft()
        try:
            queue.append(_put(next(it)))
        except StopIteration:
            pass
        yield out


def run_xe_training(
    model: ModelDef,
    state: TrainState,
    cfg: CaptionKitConfig,
    train_dataset: CaptionDataset,
    val_dataset: Optional[CaptionDataset] = None,
    *,
    mesh=None,
    ckpt: Optional[CheckpointManager] = None,
    max_steps: Optional[int] = None,
    metrics_logger: Optional[MetricsLogger] = None,
    preemption=None,
) -> tuple[TrainState, TrainReport]:
    """Cross-entropy phase (reference per-model train script, SURVEY.md §4.1).

    ``preemption``: an optional utils.preemption.PreemptionGuard polled at
    dispatch boundaries — on a caught SIGTERM the loop drains, saves a
    checkpoint at the exact step, marks report.preempted, and returns.

    lr decay on val-CIDEr plateau is realized by rebuilding the optimizer
    would discard Adam moments, so instead — matching the reference's
    in-place adjust_learning_rate — we scale the update via optax's
    inject_hyperparams-free path: the step is rebuilt with the decayed lr
    and the existing opt_state is kept (Adam state is lr-independent).
    """
    tcfg = cfg.train
    report = TrainReport()
    lr = tcfg.learning_rate
    epochs_since_best = 0
    step_fn = make_xe_train_step(
        model, tcfg, mesh, label_smoothing=tcfg.label_smoothing
    )
    # k>1: scan k steps per dispatch (same math, one launch per k steps —
    # see make_xe_train_multistep). The single-step program still runs
    # epoch/bucket/budget tails.
    k = max(1, int(tcfg.steps_per_dispatch))
    multi_fn = (
        make_xe_train_multistep(
            model, tcfg, mesh, label_smoothing=tcfg.label_smoothing
        )
        if k > 1 else None
    )
    val_decode_fn = (
        _make_val_decode_fn(model, val_dataset, cfg, mesh)
        if val_dataset is not None else None
    )
    steps_done = 0

    for epoch in range(tcfg.epochs):
        meter_loss, meter_acc, meter_bt = (
            AverageMeter(), AverageMeter(), AverageMeter()
        )
        t0 = time.perf_counter()
        epoch_batches = train_dataset.batches(
            cfg.data.batch_size, shuffle=True, seed=tcfg.seed + epoch
        )
        if cfg.data.bucket_boundaries:
            from captionkit.data.pipeline import bucket_batches

            epoch_batches = bucket_batches(
                epoch_batches, cfg.data.bucket_boundaries
            )
        host_batches = (_host_dict(b) for b in epoch_batches)
        # Device metric scalars are collected and materialized only at
        # log boundaries: a per-step float() would synchronize the host
        # with every step and stall the dispatch pipeline that
        # prefetch_to_device sets up.
        pending_metrics: list = []
        meter_tok = AverageMeter()

        def _drain():
            # Multi-step dispatches carry [k]-shaped metric leaves; single
            # steps carry scalars — np.atleast_1d treats both uniformly.
            for m in jax.device_get(pending_metrics):
                for lo, ac, tk in zip(np.atleast_1d(m["loss"]),
                                      np.atleast_1d(m["top5_acc"]),
                                      np.atleast_1d(m["tokens"])):
                    meter_loss.update(float(lo))
                    meter_acc.update(float(ac))
                    meter_tok.update(float(tk))
            pending_metrics.clear()

        window_steps = 0
        steps_since_log = 0
        first_dispatch = True
        budget = None if max_steps is None else max_steps - steps_done
        packs = _pack_host_batches(host_batches, k, budget) if k > 1 \
            else (("single", hb) for hb in host_batches)
        for kind, dev_batch in _prefetch_packs(packs, mesh):
            if preemption is not None and preemption.requested:
                break
            if kind == "multi":
                state, metrics = multi_fn(state, dev_batch)
                n = k
            else:
                state, metrics = step_fn(state, dev_batch)
                n = 1
            steps_done += n
            pending_metrics.append(
                {"loss": metrics["loss"], "top5_acc": metrics["top5_acc"],
                 "tokens": metrics["tokens"]}
            )
            window_steps += n
            steps_since_log += n
            # First dispatch carries trace+compile; drain (device_get
            # blocks until the device finishes) and restart the clock so
            # it stays out of the steady-state rate.
            if first_dispatch:
                first_dispatch = False
                _drain()
                t0 = time.perf_counter()
                window_steps = 0
                steps_since_log = 0
            if steps_since_log >= tcfg.log_every:
                steps_since_log = 0
                _drain()
                # _drain synchronized on the device, so the elapsed window
                # reflects device step latency, not async dispatch time
                # (ADVICE r1: per-step dispatch clocks overstate early-epoch
                # throughput until the queue backpressures).
                now = time.perf_counter()
                if window_steps:
                    meter_bt.update((now - t0) / window_steps, n=window_steps)
                t0 = now
                window_steps = 0
                log.info(
                    "epoch %d step %d loss %.4f top5 %.3f %.3fs/step",
                    epoch, steps_done, meter_loss.avg, meter_acc.avg,
                    meter_bt.avg,
                )
                if metrics_logger is not None:
                    sec = max(meter_bt.avg, 1e-9)
                    metrics_logger.log(steps_done, {
                        "train/loss": meter_loss.avg,
                        "train/top5_acc": meter_acc.avg,
                        "train/sec_per_step": meter_bt.avg,
                        # SURVEY.md §6 tracing row: tokens/sec counter.
                        "train/tokens_per_sec": meter_tok.avg / sec,
                    })
            if max_steps is not None and steps_done >= max_steps:
                break
        _drain()
        if window_steps:
            meter_bt.update(
                (time.perf_counter() - t0) / window_steps, n=window_steps
            )

        if preemption is not None and preemption.requested:
            log.warning(
                "preempted at step %d: checkpointing and exiting cleanly",
                steps_done,
            )
            if ckpt is not None:
                ckpt.save(state, extra={"preempted": True})
            report.preempted = True
            report.epochs_run = epoch + 1
            report.history.append({
                "epoch": epoch, "loss": meter_loss.avg, "preempted": True,
            })
            return state, report

        epoch_stats = {
            "epoch": epoch, "loss": meter_loss.avg, "top5_acc": meter_acc.avg
        }
        if val_dataset is not None and (epoch + 1) % tcfg.eval_every_epochs == 0:
            cider = _validate(model, state, val_dataset, cfg, val_decode_fn)
            epoch_stats["val_cider"] = cider
            if metrics_logger is not None:
                metrics_logger.log(steps_done, {"val/cider": cider})
            improved = cider > report.best_metric
            if improved:
                report.best_metric = cider
                report.best_epoch = epoch
                epochs_since_best = 0
            else:
                epochs_since_best += 1
            if ckpt is not None:
                ckpt.save(state, metric=cider)
            if epochs_since_best >= tcfg.early_stop_patience:
                log.info("early stop at epoch %d", epoch)
                report.history.append(epoch_stats)
                report.epochs_run = epoch + 1
                break
            if (
                epochs_since_best > 0
                and epochs_since_best % tcfg.lr_decay_patience == 0
            ):
                lr *= tcfg.lr_decay_factor
                log.info("decaying lr to %g", lr)
                import dataclasses as _dc

                step_fn = make_xe_train_step(
                    model, _dc.replace(tcfg, learning_rate=lr), mesh,
                    label_smoothing=tcfg.label_smoothing,
                )
        elif ckpt is not None:
            ckpt.save(state)
        report.history.append(epoch_stats)
        report.epochs_run = epoch + 1
        if max_steps is not None and steps_done >= max_steps:
            break
    return state, report


def _apply_pending(state, pending, update_fn, rewarder):
    """Finish a pipelined SCST step via the shared reward+update path."""
    from captionkit.train.scst import apply_rollout

    dev_batch, refs, roll = pending
    return apply_rollout(
        update_fn=update_fn, rewarder=rewarder, state=state,
        batch=dev_batch, references=refs, roll=roll,
    )


def run_scst_training(
    model: ModelDef,
    state: TrainState,
    cfg: CaptionKitConfig,
    train_dataset: CaptionDataset,
    val_dataset: Optional[CaptionDataset] = None,
    *,
    mesh=None,
    ckpt: Optional[CheckpointManager] = None,
    df: Optional[NgramDocFreq] = None,
    max_steps: Optional[int] = None,
    metrics_logger: Optional[MetricsLogger] = None,
    pipeline: bool = False,
    preemption=None,
) -> tuple[TrainState, TrainReport]:
    """SCST fine-tuning phase (SURVEY.md §4.4).

    ``preemption``: see run_xe_training — polled at step boundaries; in
    pipelined mode the in-flight rollout is dropped (no state was
    mutated), so the checkpoint is exact.

    pipeline=True overlaps the host CIDEr-D reward of batch k with the
    device rollout of batch k+1 (SURVEY.md §7.4). The k+1 rollout then uses
    the params from BEFORE batch k's update — one step of policy staleness,
    a standard asynchronous-REINFORCE tradeoff. Off by default: the native
    C++ reward scorer already removes most of the host serial cost, and the
    strictly on-policy recipe matches the reference."""
    if train_dataset.references is None:
        raise ValueError("SCST needs per-image reference captions")
    tcfg = cfg.train
    vocab = train_dataset.vocab
    if df is None:
        df = NgramDocFreq.build(train_dataset.references)
    rewarder = ScstRewarder(vocab, df)
    import dataclasses as _dc

    scst_cfg = _dc.replace(tcfg, learning_rate=tcfg.scst_learning_rate)
    rollout_fn = make_scst_rollout(
        model, start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
        max_len=cfg.decode.max_decode_len, mesh=mesh,
        num_samples=tcfg.scst_num_samples,
    )
    update_fn = make_scst_update(
        model, scst_cfg, start_id=vocab.start, mesh=mesh,
        num_samples=tcfg.scst_num_samples,
    )
    report = TrainReport()
    steps_done = 0
    val_decode_fn = (
        _make_val_decode_fn(model, val_dataset, cfg, mesh)
        if val_dataset is not None else None
    )
    def _prep(batch):
        dev_batch = batch_to_device_dict(batch)
        if mesh is not None:
            dev_batch = shard_batch_arrays(mesh, dev_batch)
        refs = [train_dataset.references[int(i)] for i in batch.image_id]
        return dev_batch, refs

    def _tick(metrics, epoch):
        nonlocal steps_done
        steps_done += 1
        # Progress signal: single-sample reports the masked mean advantage
        # (sample − greedy). Under multi-sample the leave-one-out
        # advantages sum to ZERO per image by construction, so the mean
        # reward of the samples (apply_rollout's reward_sample_mean) is
        # the quantity that actually tracks learning.
        meter_rw.update(float(
            metrics.get("reward_sample_mean", metrics["mean_advantage"])
        ))
        if steps_done % tcfg.log_every == 0:
            signal = ("mean sample reward"
                      if "reward_sample_mean" in metrics
                      else "mean advantage")
            log.info(
                "scst epoch %d step %d %s %.4f",
                epoch, steps_done, signal, meter_rw.avg,
            )
            if metrics_logger is not None:
                key = ("scst/reward_sample_mean"
                       if "reward_sample_mean" in metrics
                       else "scst/mean_advantage")
                metrics_logger.log(steps_done, {key: meter_rw.avg})

    for epoch in range(tcfg.scst_epochs):
        meter_rw = AverageMeter()
        batches = train_dataset.batches(
            cfg.data.batch_size, shuffle=True, seed=tcfg.seed + 1000 + epoch
        )
        if not pipeline:
            for batch in batches:
                if preemption is not None and preemption.requested:
                    break
                dev_batch, refs = _prep(batch)
                rng = jax.random.fold_in(state.rng, int(state.step))
                state, metrics = scst_train_step(
                    rollout_fn=rollout_fn, update_fn=update_fn,
                    rewarder=rewarder, state=state, batch=dev_batch,
                    references=refs, rng=rng,
                )
                _tick(metrics, epoch)
                if max_steps is not None and steps_done >= max_steps:
                    break
        else:
            # Pipelined: dispatch batch k+1's rollout (async, with the
            # pre-update params — one step stale) before batch k's host
            # reward + device update, so the chip never idles on CIDEr-D.
            pending = None  # (dev_batch, refs, roll)
            dispatched = 0  # rollouts issued this epoch (steps_done lags
            # one behind under pipelining, so it cannot key the PRNG)
            for batch in batches:
                if preemption is not None and preemption.requested:
                    pending = None  # rollout not applied: no state mutated
                    break
                dev_batch, refs = _prep(batch)
                rng = jax.random.fold_in(
                    jax.random.fold_in(state.rng, epoch), dispatched
                )
                dispatched += 1
                roll = rollout_fn(state.params, dev_batch, rng)
                if pending is not None:
                    state, metrics = _apply_pending(
                        state, pending, update_fn, rewarder
                    )
                    _tick(metrics, epoch)
                    if max_steps is not None and steps_done >= max_steps:
                        pending = None
                        break
                pending = (dev_batch, refs, roll)
            if pending is not None and (
                max_steps is None or steps_done < max_steps
            ):
                state, metrics = _apply_pending(
                    state, pending, update_fn, rewarder
                )
                _tick(metrics, epoch)
        if preemption is not None and preemption.requested:
            log.warning(
                "preempted at scst step %d: checkpointing and exiting "
                "cleanly", steps_done,
            )
            if ckpt is not None:
                ckpt.save(state, extra={"preempted": True})
            report.preempted = True
            report.epochs_run = epoch + 1
            report.history.append({
                "epoch": epoch, "mean_advantage": meter_rw.avg,
                "preempted": True,
            })
            return state, report

        stats = {"epoch": epoch, "mean_advantage": meter_rw.avg}
        if val_dataset is not None:
            cider = _validate(model, state, val_dataset, cfg, val_decode_fn)
            stats["val_cider"] = cider
            if cider > report.best_metric:
                report.best_metric = cider
                report.best_epoch = epoch
            if ckpt is not None:
                ckpt.save(state, metric=cider)
        elif ckpt is not None:
            ckpt.save(state)
        report.history.append(stats)
        report.epochs_run = epoch + 1
        if max_steps is not None and steps_done >= max_steps:
            break
    return state, report
