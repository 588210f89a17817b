"""Minimal production caption-editing server: JSON lines in, JSON lines out.

The deployment shape captionkit targets (README "production" framing):
ONE resident compiled beam-decode program on the accelerator, a host
loop that micro-batches incoming requests up to the compiled batch size,
and static shapes everywhere so nothing ever recompiles after warmup.

Protocol (stdin -> stdout, one JSON object per line):
  request:  {"id": <any>, "features": <path.npy of [R, F] or [1, R, F]>,
             "caption": "existing caption to edit"}
  response: {"id": <same>, "caption": "<edited caption>"}
  control:  {"flush": true}   -> decode whatever is queued now
            EOF               -> flush and exit

Batching: requests queue until `--batch` are pending (or a flush/EOF);
the tail batch pads with copies of the last row — static shapes, no
recompile. Features may also be given inline as {"features_inline":
[[...]]} for testing.

Run with synthetic weights (demo):
  python examples/serve_captions.py --synthetic < requests.jsonl
Production: pass --config editnet_beam5 --params params.npz
  --wordmap WORDMAP.json (reference-format artifacts).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _build(args):
    import jax
    import jax.numpy as jnp

    from captionkit.decode.driver import make_decode_fn
    from captionkit.models import get_model
    from captionkit.utils.config import get_named_config

    cfg = get_named_config(args.config)
    if args.set:
        overrides = {}
        for kv in args.set:
            key, _, val = kv.partition("=")
            try:
                val = json.loads(val)
            except json.JSONDecodeError:
                pass
            overrides[key] = val
        cfg = cfg.override(overrides)
    cfg = cfg.override({"decode.batch_size": args.batch})

    if args.synthetic:
        from captionkit.data import SyntheticCaptionSource

        src = SyntheticCaptionSource(
            num_images=4, captions_per_image=1,
            num_regions=cfg.model.num_regions,
            feat_dim=cfg.model.feat_dim,
            max_len=cfg.data.max_existing_len, seed=0,
        )
        vocab = src.vocab
        cfg = cfg.override({"model.vocab_size": len(vocab)})
    else:
        from captionkit.data.vocab import Vocab

        vocab = Vocab.load(args.wordmap)
        cfg = cfg.override({"model.vocab_size": len(vocab)})

    model = get_model(cfg.model)
    if args.params:
        from captionkit.train.checkpoint import load_params_npz

        template = model.init(jax.random.PRNGKey(0))
        params = load_params_npz(template, args.params)
    else:
        params = model.init(jax.random.PRNGKey(args.seed))

    decode_fn = make_decode_fn(
        model, cfg.decode, start_id=vocab.start, end_id=vocab.end,
        pad_id=vocab.pad,
    )

    T = cfg.data.max_existing_len
    R, F = cfg.model.num_regions, cfg.model.feat_dim

    def run_batch(feats, caps):
        """feats [b, R, F] fp32, caps: list of strings (b <= batch)."""
        b = len(caps)
        B = args.batch
        # Pad the tail batch by repeating the last row: static shapes,
        # one compiled program for the server's lifetime.
        pad = B - b
        feats = np.concatenate(
            [feats] + [feats[-1:]] * pad, axis=0) if pad else feats
        ids = np.zeros((B, T), np.int32)
        lens = np.zeros((B,), np.int32)
        for i in range(B):
            cap = caps[min(i, b - 1)]
            enc, ln = vocab.encode(cap.split(), max_len=T)
            ids[i] = enc
            lens[i] = ln
        tokens = np.asarray(jax.device_get(decode_fn(
            params, jnp.asarray(feats.astype(np.float32)),
            jnp.asarray(ids), jnp.asarray(lens),
            jnp.asarray(0, jnp.int32),
        )))
        return [vocab.decode_to_string(tokens[i]) for i in range(b)]

    return run_batch, (R, F)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="editnet_beam5")
    ap.add_argument("--batch", type=int, default=8,
                    help="compiled micro-batch size")
    ap.add_argument("--params", help="params .npz (else random init)")
    ap.add_argument("--wordmap", help="WORDMAP json (reference format)")
    ap.add_argument("--synthetic", action="store_true",
                    help="synthetic vocab + random weights (demo/tests)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--set", action="append", default=[],
                    metavar="section.key=value")
    ap.add_argument("--cpu", action="store_true",
                    help="serve on the CPU backend (tests/dev; the host "
                         "sitecustomize latches the TPU platform, so the "
                         "env var alone is not enough)")
    args = ap.parse_args()
    if not args.synthetic and not args.wordmap:
        ap.error("--wordmap is required without --synthetic")
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    run_batch, (R, F) = _build(args)
    print(json.dumps({"ready": True, "batch": args.batch}), flush=True)

    pending: list[tuple] = []

    def flush():
        if not pending:
            return
        feats = np.stack([p[1] for p in pending])
        caps = [p[2] for p in pending]
        outs = run_batch(feats, caps)
        for (rid, _, _), cap in zip(pending, outs):
            print(json.dumps({"id": rid, "caption": cap}), flush=True)
        pending.clear()

    for line in sys.stdin:
        line = line.strip()
        if not line:
            continue
        req = json.loads(line)
        if req.get("flush"):
            flush()
            continue
        if "features_inline" in req:
            feats = np.asarray(req["features_inline"], np.float32)
        else:
            feats = np.load(req["features"]).astype(np.float32)
        if feats.ndim == 3:
            feats = feats[0]
        if feats.shape != (R, F):
            print(json.dumps(
                {"id": req.get("id"),
                 "error": f"features must be [{R}, {F}], "
                          f"got {list(feats.shape)}"}), flush=True)
            continue
        pending.append((req.get("id"), feats, req.get("caption", "")))
        if len(pending) >= args.batch:
            flush()
    flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
