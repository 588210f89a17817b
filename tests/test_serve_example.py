"""The caption-edit server (captionkit.serve, CLI `serve`) answers a
JSON-lines request stream: micro-batching, tail-batch padding, flush
control, per-request error answers."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SMALL = [
    "--set", "model.emb_dim=16", "--set", "model.hidden_dim=24",
    "--set", "model.att_dim=8", "--set", "model.feat_dim=12",
    "--set", "model.num_regions=4", "--set", "decode.beam_size=3",
    "--set", "decode.max_decode_len=8",
]


def _requests():
    rng = np.random.default_rng(0)
    reqs = []
    for i in range(5):  # 5 requests, batch 4 -> one full + one tail batch
        reqs.append(json.dumps({
            "id": i,
            "features_inline": rng.standard_normal((4, 12)).round(3)
            .tolist(),
            "caption": "a dog runs",
        }))
    reqs.append(json.dumps({"flush": True}))
    # A malformed-shape request must produce an error line, not a crash.
    reqs.append(json.dumps({"id": 99, "features_inline": [[0.0]],
                            "caption": "x"}))
    reqs.append("this is not json")
    return reqs


def _check(stdout: str):
    lines = [json.loads(x) for x in stdout.strip().splitlines()]
    assert lines[0]["ready"] is True
    resp = {r["id"]: r for r in lines[1:] if "caption" in r}
    assert sorted(resp) == [0, 1, 2, 3, 4]
    assert all(isinstance(r["caption"], str) for r in resp.values())
    errors = [r for r in lines[1:] if "error" in r]
    assert len(errors) == 2  # bad shape + bad JSON
    assert errors[0]["id"] == 99


@pytest.mark.parametrize("entry", ["cli", "example_shim"])
def test_serve_round_trip(entry):
    if entry == "cli":
        cmd = [sys.executable, "-m", "captionkit.cli", "--platform", "cpu",
               "serve", "--synthetic", "--batch", "4", *SMALL]
    else:
        cmd = [sys.executable,
               os.path.join(REPO, "examples/serve_captions.py"),
               "--synthetic", "--cpu", "--batch", "4", *SMALL]
    proc = subprocess.run(
        cmd, input="\n".join(_requests()) + "\n",
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    _check(proc.stdout)


def test_serve_ladder_pads_to_smallest_rung():
    """In-process: a 3-request flush on ladder (1, 4, 8) must run the
    4-wide program, a single request the 1-wide one, and the answers must
    match the full-batch server's exactly (padding is semantics-free)."""
    import io

    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer, serve_stream
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 8,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    server = CaptionServer(cfg, params, model, src.vocab, ladder=(1, 4))
    assert server.ladder == (1, 4, 8)
    full = CaptionServer(cfg, params, model, src.vocab)
    assert full.ladder == (8,)

    seen = []
    inner = server._decode_fn

    def spy(params, feats, ids, lens, t0):
        seen.append(int(feats.shape[0]))
        return inner(params, feats, ids, lens, t0)

    server._decode_fn = spy
    rng = np.random.default_rng(1)
    feats3 = rng.standard_normal((3, 4, 12)).astype(np.float32)
    caps3 = ["a dog runs", "a cat sits", "a man rides"]
    out3 = server.run_batch(feats3, caps3)
    out1 = server.run_batch(feats3[:1], caps3[:1])
    assert seen == [4, 1]
    # answers identical to the always-full-batch server
    assert out3 == full.run_batch(feats3, caps3)
    assert out1 == full.run_batch(feats3[:1], caps3[:1])

    # the stream protocol advertises the ladder
    out = io.StringIO()
    serve_stream(server, io.StringIO(""), out)
    ready = json.loads(out.getvalue().splitlines()[0])
    assert ready["ladder"] == [1, 4, 8]

    import pytest as _pytest

    with _pytest.raises(ValueError):
        CaptionServer(cfg, params, model, src.vocab, ladder=(16,))


def test_serve_stream_pipelined_overlap_matches_synchronous():
    """Round-5 serving overlap: full batches are DISPATCHED (submit_batch)
    while the loop keeps reading, with up to max_in_flight outstanding;
    answers must stay request-ordered and byte-identical to the
    synchronous run_batch path, and the in-flight budget must hold."""
    import io

    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer, serve_stream
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 4,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    server = CaptionServer(cfg, params, model, src.vocab, ladder=(1, 2))

    # Spy on submit/collect to check the overlap discipline.
    events = []
    real_submit, real_collect = server.submit_batch, server.collect

    def submit(feats, caps):
        events.append(("submit", len(caps)))
        return real_submit(feats, caps)

    def collect(handle):
        events.append(("collect", handle[1]))
        return real_collect(handle)

    server.submit_batch, server.collect = submit, collect

    rng = np.random.default_rng(2)
    reqs, feats_all, caps_all = [], [], []
    for i in range(11):  # 2 full batches of 4 + a 3-request tail
        f = rng.standard_normal((4, 12)).round(3)
        feats_all.append(np.asarray(f, np.float32))
        caps_all.append("a dog runs")
        reqs.append(json.dumps({"id": i, "features_inline": f.tolist(),
                                "caption": caps_all[-1]}))
    out = io.StringIO()
    served = serve_stream(
        server, io.StringIO("\n".join(reqs) + "\n"), out
    )
    assert served == 11
    lines = [json.loads(x) for x in out.getvalue().splitlines()[1:]]
    assert [r["id"] for r in lines] == list(range(11))

    # Both full batches were submitted before anything was collected
    # (the second batch assembled while the first was in flight).
    assert [e for e in events if e[0] == "submit"] == [
        ("submit", 4), ("submit", 4), ("submit", 3)]
    first_collect = events.index(("collect", 4))
    assert events.index(("submit", 4), 1) < first_collect

    # In-flight budget: never more submits than collects + max_in_flight.
    depth = mx = 0
    for kind, _ in events:
        depth += 1 if kind == "submit" else -1
        mx = max(mx, depth)
    assert mx <= 2

    # Answers identical to the synchronous path.
    sync = []
    for i in range(0, 11, 4):
        sync += CaptionServer(cfg, params, model, src.vocab,
                              ladder=(1, 2)).run_batch(
            np.stack(feats_all[i:i + 4]), caps_all[i:i + 4])
    assert sync == [r["caption"] for r in lines]

    import pytest as _pytest

    with _pytest.raises(ValueError, match="max_in_flight"):
        serve_stream(server, io.StringIO(""), io.StringIO(),
                     max_in_flight=0)


def test_serve_flush_ms_drains_partial_batch_without_eof():
    """A lone request on a long-lived connection must be answered within
    the latency bound, not wait for EOF/flush. Driven over a real pipe:
    the writer sends ONE request and keeps the stream open until it has
    seen the response."""
    import io
    import os
    import threading

    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer, serve_stream
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 8,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    server = CaptionServer(cfg, params, model, src.vocab, ladder=(1,))
    server.warmup()  # also exercises the warmup path per rung

    r_fd, w_fd = os.pipe()
    in_stream = os.fdopen(r_fd, "r")
    writer = os.fdopen(w_fd, "w")
    out = io.StringIO()
    answered = threading.Event()

    class _Out:
        def write(self, s):
            out.write(s)
            if '"caption"' in s:
                answered.set()
            return len(s)

        def flush(self):
            pass

    def client():
        req = json.dumps({
            "id": 7,
            "features_inline": np.zeros((4, 12)).tolist(),
            "caption": "a dog runs",
        })
        writer.write(req + "\n")
        writer.flush()
        # Hold the connection open until the timeout flush answers.
        assert answered.wait(timeout=30), "no timeout flush within 30s"
        writer.close()  # now EOF ends the server loop

    t = threading.Thread(target=client)
    t.start()
    served = serve_stream(server, in_stream, _Out(), flush_ms=50)
    t.join()
    assert served == 1
    lines = [json.loads(x) for x in out.getvalue().strip().splitlines()]
    assert lines[-1]["id"] == 7 and isinstance(lines[-1]["caption"], str)


def test_serve_flush_ms_bounds_oldest_wait_under_trickle():
    """The flush_ms bound is on the OLDEST queued request's total wait.
    Regression: the loop used to re-arm the timeout on every received
    line, so a steady trickle spaced < flush_ms that never fills the
    batch starved the first request indefinitely. Under a 60 ms-spaced
    trickle with flush_ms=200 and batch=32, the first answer must arrive
    long before the batch could fill (32 requests)."""
    import io
    import os
    import threading
    import time

    import jax

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer, serve_stream
    from captionkit.utils.config import CaptionKitConfig

    cfg = CaptionKitConfig().override({
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 32,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    cfg = cfg.override({"model.vocab_size": len(src.vocab)})
    model = get_model(cfg.model)
    params = model.init(jax.random.PRNGKey(0))
    server = CaptionServer(cfg, params, model, src.vocab, ladder=(4, 8))
    server.warmup()  # no rung pays a first-use compile below

    r_fd, w_fd = os.pipe()
    in_stream = os.fdopen(r_fd, "r")
    writer = os.fdopen(w_fd, "w")
    out = io.StringIO()
    sent = 0
    sent_at_first_answer = [None]

    class _Out:
        def write(self, s):
            out.write(s)
            if '"caption"' in s and sent_at_first_answer[0] is None:
                sent_at_first_answer[0] = sent
            return len(s)

        def flush(self):
            pass

    def client():
        nonlocal sent
        feats = np.zeros((4, 12)).tolist()
        deadline = time.monotonic() + 8.0
        while sent < 32 and time.monotonic() < deadline:
            if sent_at_first_answer[0] is not None and sent >= 4:
                break  # answered; a few extra lines already proved flow
            writer.write(json.dumps({
                "id": sent, "features_inline": feats,
                "caption": "a dog runs"}) + "\n")
            writer.flush()
            sent += 1
            time.sleep(0.06)
        writer.close()

    t = threading.Thread(target=client)
    t.start()
    served = serve_stream(server, in_stream, _Out(), flush_ms=200)
    t.join()
    assert sent_at_first_answer[0] is not None, "first request never answered"
    # flush_ms=200 / 60 ms spacing => ~4-6 sent when the bound fires; the
    # pre-fix behavior only answers once all 32 fill the batch (or EOF).
    assert sent_at_first_answer[0] <= 16, (
        f"oldest request waited past the bound: "
        f"{sent_at_first_answer[0]} requests sent before first answer")
    assert served == sent


def test_serve_feed_dtype_bf16_matches_f32():
    """decode.feed_dtype='bfloat16' halves the H2D feature bytes (the
    serving wall on a tunnel-attached chip, bench_serve sustained sweep)
    and must NOT change the compute path: the model casts context to
    bf16 at encode anyway. On features that are exact on a bf16 grid
    (quarter-integers; region means are then exact in both reduction
    orders), the bf16-fed server must answer byte-identically to the
    f32-fed one — and actually ship bf16 over the transfer."""
    import jax
    import jax.numpy as jnp

    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.serve import CaptionServer
    from captionkit.utils.config import CaptionKitConfig

    base = CaptionKitConfig().override({
        "model.emb_dim": 16, "model.hidden_dim": 24, "model.att_dim": 8,
        "model.feat_dim": 12, "model.num_regions": 4,
        "decode.method": "beam", "decode.beam_size": 3,
        "decode.max_decode_len": 8, "decode.batch_size": 4,
        "data.max_existing_len": 12,
    })
    src = SyntheticCaptionSource(num_images=2, captions_per_image=1,
                                 num_regions=4, feat_dim=12, max_len=12,
                                 seed=0)
    base = base.override({"model.vocab_size": len(src.vocab)})
    model = get_model(base.model)
    params = model.init(jax.random.PRNGKey(5))

    rng = np.random.default_rng(6)
    feats = (rng.integers(-8, 8, size=(4, 4, 12)) / 4.0).astype(np.float32)
    caps = ["a dog runs", "a cat sits", "a man rides", "a bird flies"]

    f32 = CaptionServer(base, params, model, src.vocab)
    bf16 = CaptionServer(
        base.override({"decode.feed_dtype": "bfloat16"}),
        params, model, src.vocab)

    fed = []
    inner = bf16._decode_fn

    def spy(p, f, ids, lens, t0):
        fed.append(f.dtype)
        return inner(p, f, ids, lens, t0)

    bf16._decode_fn = spy
    assert bf16.run_batch(feats, caps) == f32.run_batch(feats, caps)
    assert fed == [jnp.bfloat16]


def test_serve_stacked_pipeline():
    """--stacked serves the DCNet->EditNet chain: same protocol, answers
    for every request."""
    cmd = [sys.executable, "-m", "captionkit.cli", "--platform", "cpu",
           "serve", "--synthetic", "--batch", "4", "--stacked",
           "--ladder", "1", *SMALL]
    proc = subprocess.run(
        cmd, input="\n".join(_requests()) + "\n",
        capture_output=True, text=True, timeout=560, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    _check(proc.stdout)


def test_serve_ensemble_params(tmp_path):
    """`serve --params a.npz,b.npz` serves the 2-member ensemble: the
    resident compiled program answers requests, and a duplicated single
    checkpoint answers identically to the single-model server."""
    import jax

    from captionkit.cli import _apply_overrides
    from captionkit.data import SyntheticCaptionSource
    from captionkit.models import get_model
    from captionkit.train.checkpoint import save_params_npz
    from captionkit.utils.config import get_named_config

    cfg = _apply_overrides(get_named_config("editnet_beam5"), SMALL[1::2])
    src = SyntheticCaptionSource(
        num_images=2, captions_per_image=1,
        num_regions=cfg.model.num_regions, feat_dim=cfg.model.feat_dim,
        max_len=cfg.data.max_existing_len, seed=0,
    )
    import dataclasses

    mcfg = dataclasses.replace(cfg.model, vocab_size=len(src.vocab))
    model = get_model(mcfg)
    pa = str(tmp_path / "a.npz")
    pb = str(tmp_path / "b.npz")
    save_params_npz(model.init(jax.random.PRNGKey(3)), pa)
    save_params_npz(model.init(jax.random.PRNGKey(4)), pb)

    def run(params_arg):
        cmd = [sys.executable, "-m", "captionkit.cli", "--platform", "cpu",
               "serve", "--synthetic", "--batch", "4",
               "--params", params_arg, *SMALL]
        proc = subprocess.run(
            cmd, input="\n".join(_requests()) + "\n",
            capture_output=True, text=True, timeout=560, cwd=REPO,
        )
        assert proc.returncode == 0, proc.stderr[-1500:]
        _check(proc.stdout)
        return {r["id"]: r["caption"]
                for r in map(json.loads, proc.stdout.strip().splitlines()[1:])
                if "caption" in r}

    ens = run(f"{pa},{pb}")
    dup = run(f"{pa},{pa}")
    one = run(pa)
    assert dup == one  # duplicate-member ensemble == the single model
    assert sorted(ens) == sorted(one)
