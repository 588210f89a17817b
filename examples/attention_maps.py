"""Dump attention traces for a decoded split — the data behind the
paper's qualitative figures (SCMA copy sources, visual grounding).

    python examples/attention_maps.py [--platform cpu] [--arch editnet]
        [--images 8] [--out attn.npz] [--beam 5] [--params a.npz[,b.npz]]

Greedy by default; ``--beam K`` traces the WINNING beam hypothesis
instead — its token sequence is exactly ``beam_search``'s (the trace
walks the same backpointer machinery; pinned by
tests/test_introspect.py), and its attention rows are gathered along the
winner's parent-slot path. A comma-list ``--params`` traces a checkpoint
ensemble's mean attention.

Prints a per-step report for the first image (emitted word, the
existing-caption word SCMA attends to, weights) and saves every image's
full [B, L, N] distributions to an .npz for plotting.
"""

from __future__ import annotations

import argparse
import json
import sys

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", choices=["tpu", "cpu"], default=None)
    ap.add_argument("--arch", choices=["editnet", "dcnet"],
                    default="editnet")
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--out", default="attn.npz")
    ap.add_argument("--params", default="",
                    help="params .npz (optional); a comma list traces a "
                         "checkpoint ensemble's mean attention")
    ap.add_argument("--beam", type=int, default=0,
                    help="trace the winning hypothesis of beam-K search "
                         "instead of greedy decode")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from captionkit.data import SyntheticCaptionSource
    from captionkit.decode import greedy_decode_with_attention
    from captionkit.decode.introspect import (
        attention_report,
        beam_decode_with_attention,
    )
    from captionkit.models import get_model
    from captionkit.utils.config import ModelConfig

    src = SyntheticCaptionSource(num_images=args.images,
                                 captions_per_image=2, num_regions=8,
                                 feat_dim=64, max_len=14, seed=0)
    mcfg = ModelConfig(arch=args.arch, vocab_size=len(src.vocab),
                       emb_dim=64, hidden_dim=64, att_dim=32, feat_dim=64,
                       num_regions=8, dropout=0.0)
    model = get_model(mcfg)
    paths = [p for p in args.params.split(",") if p]
    if len(paths) > 1:
        from captionkit.models import ensemble_model, load_ensemble_params

        params = load_ensemble_params(model, paths)
        model = ensemble_model(model, len(paths))
    else:
        params = model.init(jax.random.PRNGKey(0))
        if paths:
            from captionkit.train.checkpoint import load_params_npz

            params = load_params_npz(params, paths[0])
    ds = src.eval_view()
    feats = (None if args.arch == "dcnet" else
             jnp.asarray(np.asarray(ds.features, np.float32)))
    ctx = model.encode(params, feats,
                       jnp.asarray(np.asarray(ds.existing, np.int32)),
                       jnp.asarray(np.asarray(ds.existing_len, np.int32)))
    v = src.vocab
    if args.beam > 0:
        trace = beam_decode_with_attention(
            model, params, ctx, beam_size=args.beam, start_id=v.start,
            end_id=v.end, pad_id=v.pad, max_len=14,
        )
        print(f"beam={args.beam} winner score: "
              f"{float(trace.result.scores[0]):.4f}")
    else:
        trace = greedy_decode_with_attention(
            model, params, ctx, start_id=v.start, end_id=v.end,
            pad_id=v.pad, max_len=14,
        )
    rep = attention_report(trace, 0, v, np.asarray(ds.existing[0]))
    print("existing caption:",
          " ".join(v.decode(np.asarray(ds.existing[0]))))
    for rec in rep:
        print(json.dumps(rec))
    np.savez(
        args.out,
        tokens=np.asarray(trace.rollout.tokens),
        mask=np.asarray(trace.rollout.mask),
        **{k: np.asarray(a) for k, a in trace.attention.items()},
    )
    print(f"saved attention arrays to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
