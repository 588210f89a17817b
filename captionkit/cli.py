"""captionkit CLI (SURVEY.md §2 L7 rebuilt as a real config system + CLI).

The reference exposes per-script argparse flags; here one entry point wraps
every BASELINE.json config:

    python -m captionkit.cli configs
    python -m captionkit.cli decode    --config editnet_beam5 --synthetic
    python -m captionkit.cli train-xe  --config xe_train      --synthetic
    python -m captionkit.cli train-scst --config scst_train   --synthetic
    python -m captionkit.cli convert   --torch ckpt.pth.tar --arch dcnet --out params.npz

--set section.field=value applies dotted config overrides. --synthetic runs
on the generated toy dataset (no COCO on disk); real runs point --features/
--captions/... at reference-format artifacts (SURVEY.md §3.1).
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
from typing import Any

import jax

from captionkit.utils.config import (
    CaptionKitConfig,
    ModelConfig,
    get_named_config,
    list_named_configs,
)


def _parse_value(raw: str) -> Any:
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def _apply_overrides(cfg: CaptionKitConfig, sets: list[str]) -> CaptionKitConfig:
    overrides = {}
    for s in sets:
        key, _, val = s.partition("=")
        if not val:
            raise SystemExit(f"--set expects section.field=value, got {s!r}")
        overrides[key] = _parse_value(val)
    return cfg.override(overrides)


def _load_dataset(args, cfg):
    """Returns (train_dataset, eval_dataset). The eval dataset is always
    one row per image (decoding the training layout's captions_per_image
    duplicate rows would multiply decode work for identical hypotheses)."""
    from captionkit.data import SyntheticCaptionSource
    from captionkit.data.sources import CaptionDataset

    if args.synthetic:
        src = SyntheticCaptionSource(
            num_images=args.images,
            captions_per_image=cfg.data.captions_per_image,
            num_regions=cfg.model.num_regions,
            feat_dim=cfg.model.feat_dim,
            max_len=cfg.data.max_len,
            seed=cfg.data.seed,
        )
        return src.dataset, src.eval_view()
    if getattr(args, "prepared", None):
        # prepare_from_karpathy output dir: attaches per-image reference
        # captions, enabling metrics-scored eval and SCST.
        from captionkit.data.prepare import load_prepared_split

        ds = load_prepared_split(
            args.prepared, args.split, max_len=cfg.data.max_len
        )
        return ds, ds.eval_view()
    ds = CaptionDataset.from_reference_files(
        wordmap_path=args.wordmap,
        captions_path=args.captions,
        caplens_path=args.caplens,
        existing_captions_path=args.existing,
        existing_caplens_path=args.existing_lens,
        features_path=args.features,
        max_len=cfg.data.max_len,
        captions_per_image=args.captions_per_image,
    )
    return ds, ds.eval_view()


def _build_model(cfg, vocab_size: int):
    import dataclasses

    from captionkit.models import get_model

    mcfg = dataclasses.replace(cfg.model, vocab_size=vocab_size)
    return mcfg, get_model(mcfg)


def cmd_configs(args) -> int:
    for name in list_named_configs():
        cfg = get_named_config(name)
        print(f"{name:16s} arch={cfg.model.arch:8s} "
              f"decode={cfg.decode.method}/{cfg.decode.beam_size}")
    return 0


def cmd_decode(args) -> int:
    from captionkit.decode.driver import decode_split, evaluate_split

    cfg = _apply_overrides(get_named_config(args.config), args.set)
    _, eval_ds = _load_dataset(args, cfg)
    if args.num_shards > 1:
        # Multi-host eval: each host decodes its strided shard; results
        # JSONs key by real image ids and concatenate across hosts.
        eval_ds = eval_ds.shard(args.num_shards, args.shard_index)
    mcfg, model = _build_model(cfg, len(eval_ds.vocab))
    model, params = _load_model_and_params(args, model, mcfg)
    if eval_ds.references is not None and not args.no_metrics:
        metrics = evaluate_split(
            model, params, eval_ds, cfg.decode, results_path=args.out
        )
    else:
        _, metrics = decode_split(
            model, params, eval_ds, cfg.decode, results_path=args.out
        )
    print(json.dumps({k: round(float(v), 4) for k, v in metrics.items()},
                     indent=2))
    return 0


def _load_params(args, model, mcfg):
    if getattr(args, "params", None):
        if "," in args.params:
            # A comma list reaches here only from commands that take a
            # SINGLE checkpoint (train-scst init weights, stacked stage
            # params, ...): ensembling is a decode/serve-time feature.
            raise SystemExit(
                "this command takes one --params checkpoint; "
                "multi-checkpoint ensembles (--params a.npz,b.npz) are "
                "supported by `decode` and `serve` only"
            )
        from captionkit.train.checkpoint import load_params_npz

        template = model.init(jax.random.PRNGKey(0))
        return load_params_npz(template, args.params)
    return model.init(jax.random.PRNGKey(args.seed))


def _load_model_and_params(args, model, mcfg):
    """Resolve --params, which accepts a comma-separated list of
    checkpoints of the SAME config: more than one path wraps the model in
    the decode-time ensemble combinator (captionkit/models/ensemble.py) —
    per-step member distributions averaged under --ensemble-mode. One
    path (or none) is the plain single-model load."""
    paths = [p for p in (getattr(args, "params", None) or "").split(",")
             if p]
    if len(paths) > 1:
        from captionkit.models import ensemble_model, load_ensemble_params

        mode = getattr(args, "ensemble_mode", "logprob")
        return (
            ensemble_model(model, len(paths), mode=mode),
            load_ensemble_params(model, paths),
        )
    if len(paths) == 1:
        # Load the CLEANED single path directly: a stray trailing comma
        # ("--params a.npz,") must not fall through to _load_params'
        # raw-string comma check, whose "ensembles are for decode/serve
        # only" message would be nonsense here — we ARE decode/serve.
        from captionkit.train.checkpoint import load_params_npz

        template = model.init(jax.random.PRNGKey(0))
        return model, load_params_npz(template, paths[0])
    return model, _load_params(args, model, mcfg)


def _load_stage_params(args, model, raw: str | None):
    """Resolve one pipeline STAGE's --*-params value: none -> random
    init, one path -> plain load, a comma list -> that stage becomes a
    checkpoint ensemble (same semantics as `decode --params a,b`) — so
    stacked pipelines can ensemble either editor independently."""
    paths = [p for p in (raw or "").split(",") if p]
    if len(paths) > 1:
        from captionkit.models import ensemble_model, load_ensemble_params

        mode = getattr(args, "ensemble_mode", "logprob")
        return (
            ensemble_model(model, len(paths), mode=mode),
            load_ensemble_params(model, paths),
        )
    if paths:
        from captionkit.train.checkpoint import load_params_npz

        return model, load_params_npz(
            model.init(jax.random.PRNGKey(0)), paths[0]
        )
    return model, model.init(jax.random.PRNGKey(args.seed))


def _export_trained_params(args, state) -> None:
    """--export-params / --export-ema: write decode-ready .npz weights
    from the final TrainState (the Orbax checkpoint keeps the full state;
    these are the light interchange artifacts `decode --params` takes)."""
    if getattr(args, "export_params", None):
        from captionkit.train.checkpoint import save_params_npz

        save_params_npz(state.params, args.export_params)
    if getattr(args, "export_ema", None):
        from captionkit.train.checkpoint import save_params_npz
        from captionkit.train.state import ema_params

        avg = ema_params(state)
        if avg is None:
            raise SystemExit(
                "--export-ema needs EMA tracking enabled: set "
                "--set train.ema_decay=0.999 (or similar) on this run"
            )
        save_params_npz(avg, args.export_ema)


def cmd_train_xe(args) -> int:
    from captionkit.parallel import make_mesh
    from captionkit.train import create_train_state
    from captionkit.train.checkpoint import CheckpointManager
    from captionkit.train.loop import run_xe_training

    cfg = _apply_overrides(get_named_config(args.config), args.set)
    train_ds, eval_ds = _load_dataset(args, cfg)
    if args.num_shards > 1:  # multi-host: this process trains its shard
        train_ds = train_ds.shard(args.num_shards, args.shard_index)
    mcfg, model = _build_model(cfg, len(train_ds.vocab))
    state = create_train_state(model.init, cfg.train)
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axis_names)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir,
                             keep=cfg.train.keep_checkpoints)
    if getattr(args, "resume", False) and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        logging.getLogger("captionkit.cli").info(
            "resumed from step %s", int(state.step)
        )
    mlogger = None
    if args.run_dir:
        from captionkit.utils.logging import MetricsLogger

        mlogger = MetricsLogger(args.run_dir)
    from captionkit.utils.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        state, report = run_xe_training(
            model, state, cfg, train_ds,
            None if args.no_val else eval_ds,
            mesh=mesh, ckpt=ckpt, max_steps=args.max_steps,
            metrics_logger=mlogger, preemption=guard,
        )
    _export_trained_params(args, state)
    best = report.best_metric if report.best_metric > float("-inf") else None
    print(json.dumps({
        "epochs_run": report.epochs_run,
        "best_val_cider": best,
        "preempted": report.preempted,
        "history": report.history,
    }, indent=2, default=float))
    ckpt.close()
    return 0


def cmd_train_scst(args) -> int:
    from captionkit.parallel import make_mesh
    from captionkit.train import create_train_state
    from captionkit.train.checkpoint import CheckpointManager
    from captionkit.train.loop import run_scst_training
    from captionkit.train.state import TrainState

    cfg = _apply_overrides(get_named_config(args.config), args.set)
    train_ds, eval_ds = _load_dataset(args, cfg)
    if args.num_shards > 1:  # multi-host: this process trains its shard
        train_ds = train_ds.shard(args.num_shards, args.shard_index)
    mcfg, model = _build_model(cfg, len(train_ds.vocab))
    state = create_train_state(model.init, cfg.train)
    if args.params:
        if "," in args.params:
            raise SystemExit(
                "train-scst takes one --params checkpoint (the XE "
                "weights to fine-tune); multi-checkpoint ensembles "
                "(--params a.npz,b.npz) are supported by `decode` and "
                "`serve` only"
            )
        from captionkit.train.checkpoint import load_params_npz

        state = TrainState(
            params=load_params_npz(state.params, args.params),
            opt_state=state.opt_state, step=state.step, rng=state.rng,
        )
    mesh = make_mesh(cfg.train.mesh_shape, cfg.train.mesh_axis_names)
    ckpt = CheckpointManager(cfg.train.checkpoint_dir,
                             keep=cfg.train.keep_checkpoints)
    mlogger = None
    if args.run_dir:
        from captionkit.utils.logging import MetricsLogger

        mlogger = MetricsLogger(args.run_dir)
    from captionkit.utils.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        state, report = run_scst_training(
            model, state, cfg, train_ds,
            None if args.no_val else eval_ds,
            mesh=mesh, ckpt=ckpt, max_steps=args.max_steps,
            metrics_logger=mlogger, pipeline=args.pipeline,
            preemption=guard,
        )
    _export_trained_params(args, state)
    best = report.best_metric if report.best_metric > float("-inf") else None
    print(json.dumps({
        "epochs_run": report.epochs_run,
        "best_val_cider": best,
        "preempted": report.preempted,
    }, indent=2, default=float))
    ckpt.close()
    return 0


def cmd_decode_stacked(args) -> int:
    """DCNet -> EditNet stacked editing over a split (SURVEY.md §1:
    the two editors combined by running one after the other)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from captionkit.decode.stacked import make_stacked_decode_fn
    from captionkit.metrics.eval import CaptionEvaluator
    from captionkit.models import get_model

    cfg = _apply_overrides(get_named_config(args.config), args.set)
    _, eval_ds = _load_dataset(args, cfg)
    vocab = eval_ds.vocab
    mcfg_d = dataclasses.replace(cfg.model, arch="dcnet",
                                 vocab_size=len(vocab))
    mcfg_e = dataclasses.replace(cfg.model, arch="editnet",
                                 vocab_size=len(vocab))
    dcnet = get_model(mcfg_d)
    editnet = get_model(mcfg_e)

    dcnet, dp = _load_stage_params(args, dcnet, args.dcnet_params)
    editnet, ep = _load_stage_params(args, editnet, args.editnet_params)
    first = dataclasses.replace(cfg.decode, method="greedy", beam_size=1)
    fn = make_stacked_decode_fn(
        dcnet, editnet, first_stage=first, second_stage=cfg.decode,
        start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
        feed_dtype=cfg.decode.feed_dtype,
    )
    from captionkit.data.featquant import feed_to_device, quantize_for_feed

    hyps = {}
    for batch in eval_ds.batches(cfg.decode.batch_size):
        toks = np.asarray(jax.device_get(fn(
            dp, ep,
            feed_to_device(
                quantize_for_feed(batch.features, cfg.decode.feed_dtype)),
            jnp.asarray(batch.existing), jnp.asarray(batch.existing_len),
        )))
        for row, valid, img in zip(toks, batch.valid, batch.image_id):
            if valid:
                hyps[int(img)] = vocab.decode_to_string(row)
    out = {"captions": len(hyps)}
    if eval_ds.references is not None and not args.no_metrics:
        refs = {
            i: [" ".join(t) for t in eval_ds.references[i]] for i in hyps
        }
        out.update(CaptionEvaluator().evaluate(refs, hyps))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                [{"image_id": k, "caption": v}
                 for k, v in sorted(hyps.items())], f,
            )
    print(json.dumps({k: round(float(v), 4) for k, v in out.items()},
                     indent=2))
    return 0


def _load_name_map(path):
    if not path:
        return None
    with open(path) as f:
        return json.load(f)


def _parse_split_paths(pairs: list[str], flag: str) -> dict[str, str]:
    out = {}
    for p in pairs:
        if "=" not in p:
            raise SystemExit(f"{flag} expects split=path, got {p!r}")
        split, path = p.split("=", 1)
        out[split] = path
    return out


def cmd_prepare(args) -> int:
    """Offline data prep (SURVEY.md §2 L1): Karpathy JSON + AoANet captions
    (+ optional feature arrays) -> reference-format artifacts that every
    other command consumes via --prepared."""
    import dataclasses

    from captionkit.data.prepare import prepare_from_karpathy

    out = prepare_from_karpathy(
        karpathy_json=args.karpathy,
        output_dir=args.out,
        existing_captions=_parse_split_paths(args.existing, "--existing"),
        features=(_parse_split_paths(args.features, "--features")
                  if args.features else None),
        min_word_freq=args.min_word_freq,
        max_len=args.max_len,
        captions_per_image=args.captions_per_image,
    )
    print(json.dumps(
        {split: dataclasses.asdict(ps) for split, ps in out.items()},
        indent=2,
    ))
    return 0


def cmd_convert(args) -> int:
    from captionkit.convert.torch_import import convert_torch_checkpoint

    if args.fit_names:
        import dataclasses

        from captionkit.convert.fit_names import fit_params_from_state_dict
        from captionkit.convert.torch_import import load_torch_state_dict
        from captionkit.train.checkpoint import save_params_npz

        raw = load_torch_state_dict(args.torch)
        base = get_named_config(args.config) if args.config else None
        if base is not None:
            mcfg = _apply_overrides(base, args.set).model
        elif args.set:
            mcfg = _apply_overrides(
                get_named_config(
                    "editnet_beam5" if args.arch == "editnet"
                    else "dcnet_beam5"),
                args.set,
            ).model
        else:
            from captionkit.convert.fit_names import (
                infer_dims,
                state_dict_shapes,
            )

            dims = infer_dims(state_dict_shapes(raw), args.arch)
            print(f"inferred dims: {dims}")
            mcfg = ModelConfig(arch=args.arch, **dims)
        if mcfg.arch != args.arch:
            mcfg = dataclasses.replace(mcfg, arch=args.arch)
        params, fit = fit_params_from_state_dict(
            raw, args.arch, mcfg, candidate=args.fit_candidate)
        save_params_npz(params, args.out)
        print(f"wrote {args.out} (fit candidate {args.fit_candidate} of "
              f"{len(fit.candidates)})")
        for n in fit.notes:
            print(f"  note: {n}")
        if fit.unmatched_raw:
            print(f"  WARNING: {len(fit.unmatched_raw)} checkpoint "
                  f"tensor(s) not matched (NOT converted): "
                  f"{fit.unmatched_raw[:8]}", file=sys.stderr)
        if args.fit_report:
            with open(args.fit_report, "w") as f:
                json.dump({"translation": fit.translation,
                           "alternates": fit.alternates,
                           "notes": fit.notes,
                           "unmatched_raw": fit.unmatched_raw}, f, indent=2)
            print(f"fit report: {args.fit_report}")
        return 0

    out = convert_torch_checkpoint(
        args.torch, args.arch, args.out,
        name_map=_load_name_map(args.name_map),
    )
    print(f"wrote {out}")
    return 0


def cmd_parity_gate(args) -> int:
    """convert -> greedy-identical -> beam CIDEr, as one command
    (VERDICT r1 #5; BASELINE fidelity gate)."""
    import dataclasses

    from captionkit.convert.gate import run_parity_gate

    cfg = _apply_overrides(get_named_config(args.config), args.set)
    _, eval_ds = _load_dataset(args, cfg)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, vocab_size=len(eval_ds.vocab)
        )
    )
    expected_captions = None
    if args.expected_captions:
        with open(args.expected_captions) as f:
            expected_captions = json.load(f)
    report = run_parity_gate(
        args.ckpt, cfg, eval_ds,
        name_map=_load_name_map(args.name_map),
        expected_cider=args.expected_cider,
        cider_tol=args.cider_tol,
        max_images=args.max_images,
        out_params_path=args.out,
        expected_captions=expected_captions,
        fit_names=args.fit_names,
    )
    print(json.dumps(report, indent=2, default=str))
    return 0 if report["ok"] else 1


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("captionkit")
    p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
                   help="cpu forces the CPU backend; tpu (the default) "
                        "uses the environment's accelerator")
    p.add_argument("--debug-nans", action="store_true",
                   help="raise immediately on any NaN under jit")
    p.add_argument("--run-dir", default="",
                   help="write metrics.jsonl (+ TensorBoard if available)")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("configs", help="list named configs")

    def add_common(sp, with_params=True):
        sp.add_argument("--config", required=True,
                        help="named config (see `configs`)")
        sp.add_argument("--set", action="append", default=[],
                        metavar="K=V", help="dotted config override")
        sp.add_argument("--synthetic", action="store_true",
                        help="use the generated toy dataset")
        sp.add_argument("--images", type=int, default=64,
                        help="synthetic dataset size")
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--prepared",
                        help="prepare_from_karpathy output dir (loads "
                             "reference captions for metrics/SCST)")
        sp.add_argument("--split", default="train",
                        help="split name inside --prepared")
        sp.add_argument("--wordmap"), sp.add_argument("--captions")
        sp.add_argument("--caplens"), sp.add_argument("--existing")
        sp.add_argument("--existing-lens", dest="existing_lens")
        sp.add_argument("--features", default="")
        sp.add_argument("--captions-per-image", dest="captions_per_image",
                        type=int, default=None,
                        help="GT captions per image in raw artifacts "
                             "(needed without --features to group "
                             "references by image)")
        if with_params:
            sp.add_argument(
                "--params",
                help="params .npz to load; comma-separate several "
                     "checkpoints of the SAME config to decode their "
                     "ensemble (see --ensemble-mode)",
            )

    sp = sub.add_parser("decode", help="decode + score a split")
    add_common(sp)
    sp.add_argument("--ensemble-mode", dest="ensemble_mode",
                    choices=("logprob", "prob"), default="logprob",
                    help="member averaging when --params lists several "
                         "checkpoints: mean log-prob (geometric mixture, "
                         "default) or mean prob (arithmetic mixture)")
    sp.add_argument("--out", help="results JSON path")
    sp.add_argument("--no-metrics", action="store_true")
    sp.add_argument("--num-shards", dest="num_shards", type=int, default=1,
                    help="split the eval set across hosts "
                         "(CaptionDataset.shard); run one process per "
                         "shard and concatenate the results JSONs")
    sp.add_argument("--shard-index", dest="shard_index", type=int,
                    default=0, help="this host's shard (0-based)")

    sp = sub.add_parser("decode-stacked",
                        help="DCNet->EditNet stacked editing of a split")
    add_common(sp, with_params=False)
    sp.add_argument("--dcnet-params", dest="dcnet_params",
                    help="DCNet checkpoint .npz; a comma list ensembles "
                         "that stage (see --ensemble-mode)")
    sp.add_argument("--editnet-params", dest="editnet_params",
                    help="EditNet checkpoint .npz; a comma list ensembles "
                         "that stage (see --ensemble-mode)")
    sp.add_argument("--ensemble-mode", dest="ensemble_mode",
                    choices=["logprob", "prob"], default="logprob",
                    help="per-step member combination for comma-list "
                         "stage params")
    sp.add_argument("--out", help="results JSON path")
    sp.add_argument("--no-metrics", action="store_true")

    def add_export(sp):
        sp.add_argument("--export-params", dest="export_params",
                        metavar="OUT.npz",
                        help="write the final raw weights as a "
                             "decode-ready .npz")
        sp.add_argument("--export-ema", dest="export_ema",
                        metavar="OUT.npz",
                        help="write the final EMA (Polyak-averaged) "
                             "weights (needs train.ema_decay > 0)")

    def add_shards(sp):
        sp.add_argument("--num-shards", dest="num_shards", type=int,
                        default=1,
                        help="per-host strided split of the TRAIN data "
                             "(CaptionDataset.shard) for multi-host runs "
                             "under jax.distributed; validation stays "
                             "whole on every host")
        sp.add_argument("--shard-index", dest="shard_index", type=int,
                        default=0, help="this host's shard (0-based)")

    sp = sub.add_parser("train-xe", help="cross-entropy training")
    add_common(sp, with_params=False)
    sp.add_argument("--max-steps", type=int)
    sp.add_argument("--no-val", action="store_true")
    sp.add_argument("--resume", action="store_true",
                    help="resume from the latest checkpoint in "
                         "train.checkpoint_dir")
    add_shards(sp)
    add_export(sp)

    sp = sub.add_parser("train-scst", help="SCST fine-tuning")
    add_common(sp)
    sp.add_argument("--max-steps", type=int)
    sp.add_argument("--no-val", action="store_true")
    sp.add_argument("--pipeline", action="store_true",
                    help="overlap host CIDEr-D reward with the next "
                         "rollout (one-step-stale policy)")
    add_shards(sp)
    add_export(sp)

    sp = sub.add_parser(
        "serve",
        help="JSON-lines caption-edit server on stdin/stdout (one "
             "resident compiled beam program, micro-batched requests)",
    )
    sp.add_argument("--config", default="editnet_beam5")
    sp.add_argument("--set", action="append", default=[], metavar="K=V")
    sp.add_argument("--params",
                    help="params .npz (else random init); comma-separate "
                         "several checkpoints to serve their ensemble")
    sp.add_argument("--ensemble-mode", dest="ensemble_mode",
                    choices=("logprob", "prob"), default="logprob",
                    help="member averaging for a multi-checkpoint "
                         "--params list")
    sp.add_argument("--wordmap", help="WORDMAP json (reference format)")
    sp.add_argument("--synthetic", action="store_true",
                    help="toy vocab + random weights (demo/tests)")
    sp.add_argument("--batch", type=int, default=8,
                    help="compiled micro-batch size")
    sp.add_argument("--ladder", default="",
                    help="comma-separated smaller batch rungs (e.g. "
                         "'1,8'): a drained batch pads to the smallest "
                         "rung that fits instead of the full --batch — "
                         "low-load latency scales with the load")
    sp.add_argument("--flush-ms", dest="flush_ms", type=float, default=0,
                    help="max milliseconds a queued request waits for "
                         "the batch to fill before a partial batch is "
                         "decoded anyway (0 = only explicit flush/EOF "
                         "drain, the original semantics)")
    sp.add_argument("--warmup", action="store_true",
                    help="compile every ladder rung before reading "
                         "requests (no first-request compile stall)")
    sp.add_argument("--stacked", action="store_true",
                    help="serve the DCNet->EditNet stacked pipeline "
                         "(--params = EditNet, --dcnet-params = DCNet)")
    sp.add_argument("--dcnet-params", dest="dcnet_params",
                    help="DCNet params .npz for --stacked; a comma list "
                         "ensembles that stage (see --ensemble-mode)")
    sp.add_argument("--seed", type=int, default=0)

    sp = sub.add_parser(
        "prepare",
        help="Karpathy JSON + AoANet captions (+features) -> prepared "
             "artifacts dir",
    )
    sp.add_argument("--karpathy", required=True,
                    help="Karpathy-split dataset JSON (dataset_coco.json)")
    sp.add_argument("--out", required=True, help="output artifact dir")
    sp.add_argument("--existing", action="append", required=True,
                    metavar="SPLIT=PATH",
                    help="AoANet existing-caption JSON per split "
                         "(repeatable: --existing train=a.json "
                         "--existing val=b.json)")
    sp.add_argument("--features", action="append", default=[],
                    metavar="SPLIT=PATH",
                    help="[N,R,F] feature array per split (npy/h5)")
    sp.add_argument("--min-word-freq", dest="min_word_freq", type=int,
                    default=5)
    sp.add_argument("--max-len", dest="max_len", type=int, default=22)
    sp.add_argument("--captions-per-image", dest="captions_per_image",
                    type=int, default=5)

    sp = sub.add_parser("convert", help="torch checkpoint -> params .npz")
    sp.add_argument("--torch", required=True)
    sp.add_argument("--arch", required=True, choices=["dcnet", "editnet"])
    sp.add_argument("--out", required=True)
    sp.add_argument("--name-map", dest="name_map",
                    help="JSON overrides for the checkpoint module-name "
                         "table (see convert.torch_import.DEFAULT_NAME_MAPS)")
    sp.add_argument("--fit-names", dest="fit_names", action="store_true",
                    help="infer the checkpoint layout from parameter "
                         "shapes (convert.fit_names) instead of the name "
                         "map; dims come from --config (default: the "
                         "arch's paper-scale defaults)")
    sp.add_argument("--config", default="",
                    help="named config supplying model dims for --fit-names")
    sp.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="dotted config overrides for --fit-names dims, "
                         "e.g. model.hidden_dim=512")
    sp.add_argument("--fit-candidate", dest="fit_candidate", type=int,
                    default=0,
                    help="which ranked fit to convert (0 = best; see "
                         "--fit-report for the alternates)")
    sp.add_argument("--fit-report", dest="fit_report",
                    help="write the fitted translation + alternates + "
                         "notes as JSON here")

    sp = sub.add_parser(
        "parity-gate",
        help="torch ckpt -> convert -> greedy-identical -> beam CIDEr "
             "tolerance, in one command",
    )
    add_common(sp, with_params=False)
    sp.add_argument("--ckpt", required=True, help="torch checkpoint path")
    sp.add_argument("--name-map", dest="name_map",
                    help="JSON overrides for the checkpoint module-name "
                         "table")
    sp.add_argument("--expected-cider", dest="expected_cider", type=float,
                    help="published CIDEr to gate against (+/- tol)")
    sp.add_argument("--expected-captions", dest="expected_captions",
                    help="JSON {image_id: caption} of the original repo's "
                         "published greedy captions; gates exact string "
                         "match (catches semantics weights can't express, "
                         "e.g. soft-vs-hard SCMA)")
    sp.add_argument("--cider-tol", dest="cider_tol", type=float, default=0.2)
    sp.add_argument("--max-images", dest="max_images", type=int,
                    help="cap greedy-identical comparison size")
    sp.add_argument("--out", help="also write converted params .npz here")
    sp.add_argument("--fit-names", dest="fit_names", action="store_true",
                    help="infer the checkpoint layout from shapes and "
                         "sweep the ranked candidate fits through the "
                         "gate (decisive only with --expected-cider or "
                         "--expected-captions)")
    return p


def cmd_serve(args) -> int:
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer, serve_stream

    if not args.synthetic and not args.wordmap:
        raise SystemExit("serve: --wordmap is required without --synthetic")
    cfg = _apply_overrides(get_named_config(args.config), args.set)
    cfg = cfg.override({"decode.batch_size": args.batch})
    if args.synthetic:
        from captionkit.data import SyntheticCaptionSource

        vocab = SyntheticCaptionSource(
            num_images=2, captions_per_image=1,
            num_regions=cfg.model.num_regions, feat_dim=cfg.model.feat_dim,
            max_len=cfg.data.max_existing_len, seed=0,
        ).vocab
    else:
        from captionkit.data.vocab import Vocab

        vocab = Vocab.load(args.wordmap)
    cfg = cfg.override({"model.vocab_size": len(vocab)})
    mcfg = cfg.model
    model = get_model(mcfg)
    model, params = _load_model_and_params(args, model, mcfg)
    ladder = ([int(s) for s in args.ladder.split(",")]
              if args.ladder else ())
    decode_fn = None
    if args.stacked:
        # Serve the full edit pipeline: DCNet denoises the incoming
        # caption, EditNet edits DCNet's output (one jitted program,
        # same convention as the decode-stacked command: greedy first
        # stage, the configured decode as the second).
        import dataclasses

        from captionkit.decode.stacked import make_stacked_decode_fn

        mcfg_d = dataclasses.replace(mcfg, arch="dcnet")
        dcnet = get_model(mcfg_d)
        dcnet, dp = _load_stage_params(args, dcnet, args.dcnet_params)
        first = dataclasses.replace(cfg.decode, method="greedy",
                                    beam_size=1)
        stacked = make_stacked_decode_fn(
            dcnet, model, first_stage=first, second_stage=cfg.decode,
            start_id=vocab.start, end_id=vocab.end, pad_id=vocab.pad,
            feed_dtype=cfg.decode.feed_dtype,
        )
        params = (dp, params)

        def decode_fn(pair, feats, ids, lens, _step):
            return stacked(pair[0], pair[1], feats, ids, lens)

    server = CaptionServer(cfg, params, model, vocab, ladder=ladder,
                           decode_fn=decode_fn)
    if args.warmup:
        server.warmup()
    serve_stream(server, sys.stdin, sys.stdout,
                 flush_ms=args.flush_ms or None)
    return 0


_COMMANDS = {
    "configs": cmd_configs,
    "decode": cmd_decode,
    "serve": cmd_serve,
    "decode-stacked": cmd_decode_stacked,
    "train-xe": cmd_train_xe,
    "train-scst": cmd_train_scst,
    "convert": cmd_convert,
    "parity-gate": cmd_parity_gate,
    "prepare": cmd_prepare,
}


def main(argv=None) -> int:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(name)s %(levelname)s %(message)s",
    )
    args = build_parser().parse_args(argv)
    if args.platform == "cpu":
        # jax.config (not the env var): the host sitecustomize imports jax
        # at interpreter start, latching JAX_PLATFORMS before we run.
        # "tpu" needs no action — the environment's accelerator is the
        # default; forcing the literal string would break on hosts whose
        # TPU plugin registers under another platform name (e.g. axon).
        jax.config.update("jax_platforms", "cpu")
    if args.debug_nans:
        from captionkit.utils.logging import enable_nan_debugging

        enable_nan_debugging()
    from captionkit.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    return _COMMANDS[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
