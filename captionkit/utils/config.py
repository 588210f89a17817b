"""Unified configuration system (SURVEY.md §6 "Config / flag system").

The reference spreads argparse flags + module constants across per-model
scripts (SURVEY.md §6, ⟦cite⟧ — mount empty at build time). Here there is a
single dataclass tree; every BASELINE.json "configs" line is expressible as a
named config (see NAMED_CONFIGS at the bottom).

Dimensions default to the family-standard hyperparameters recalled in
SURVEY.md §3.2: emb 1024, decoder hidden 1024, attention 512, dropout 0.5,
vocab ≈ 9490, 36x2048 bottom-up features.
"""

from __future__ import annotations

import dataclasses
import json
import warnings
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class ModelConfig:
    """Architecture hyperparameters shared by DCNet and EditNet."""

    arch: str = "editnet"  # "dcnet" | "editnet"
    vocab_size: int = 9490
    emb_dim: int = 1024
    hidden_dim: int = 1024
    att_dim: int = 512
    feat_dim: int = 2048  # bottom-up region feature dim (SURVEY.md §3.1)
    num_regions: int = 36  # bottom-up regions per image
    dropout: float = 0.5
    # SCMA selection mode (SURVEY.md §8.3 hard-part #1): "soft" = attention-
    # weighted sum of encoder cell states; "hard" = straight-through gather of
    # the argmax-scored cell state. Configurable because the exact reference
    # selection rule must be fit against released checkpoints (⟦cite⟧).
    scma_select: str = "soft"
    # DCNet is textual in the paper; BASELINE config #1 mentions features in
    # the pipeline env, so visual conditioning is a flag (SURVEY.md §8.4).
    dcnet_use_visual: bool = False
    # Compute dtype for matmuls ("bfloat16" rides the MXU; params stay fp32).
    compute_dtype: str = "bfloat16"
    # (Round 3: the former `use_pallas` cell-kernel flag is retired from
    # the config surface. The fused cell/attention kernels remain in
    # captionkit.ops as parity-tested alternates reachable through
    # nn.dispatch + examples/bench_cell_kernels.py, but every reachable
    # model config now composes the grouped-query beam layout and
    # forward_seq — enabling the cell kernels forfeited both and was
    # strictly dominated (docs/DESIGN.md "Pallas kernels" section).)
    # Fused vocab head (matmul + online log-sum-exp + per-row top-k in one
    # Pallas kernel, captionkit.ops.head) for beam decode: the XLA vocab
    # tail (fc -> log_softmax -> +scores -> lax.top_k over K*V) measured
    # 2.6ms/step vs 1.4ms fused at paper scale. Interpret-mode on CPU.
    use_fused_head: bool = True
    # Hand-written deferred-dW backward for EditNet teacher forcing
    # (models/editnet_backward.py): the backward scan emits per-step
    # matmul cotangents and computes every big dW as one batched einsum,
    # removing ~5.7GB/step of per-timestep gradient-accumulate HBM
    # traffic. Measured: 21.36 -> 25.75 steps/s at B=256 scan_k=8 (the
    # stop-gradient ceiling is 26.1). Gradients match autodiff to 1e-15
    # at f64 (tests/test_deferred_backward.py); fp32/bf16 differ only in
    # summation order. Soft-SCMA EditNet only; hard mode and DCNet fall
    # back to the autodiff scan.
    deferred_backward: bool = True
    # DCNet's sibling deferred backward (models/dcnet_backward.py) is
    # built and exactness-tested but measured a wash at paper scale
    # (51.9 vs 52.6 steps/s at B=256): DCNet's in-scan accumulates are
    # ~3x smaller and its step 2.4x faster, so the deferral's stash and
    # recompute overheads cancel the savings. Off by default; the flag
    # documents the measured negative rather than hiding the machinery.
    dcnet_deferred_backward: bool = False
    # Which top-k head step_topk uses: "pallas" (default — the fused
    # kernel, never materializes [N, V] logits in HBM) or "xla" (bf16
    # matmul + per-row lax.top_k + logsumexp). Round-3 measurements: the
    # XLA path wins the ISOLATED comparison (834 vs 1,387 us/iter
    # scan-chained at paper shapes) but LOSES inside the full beam-decode
    # program (6,966-6,974 vs 7,144 captions/s, both scoped-VMEM
    # settings) — its 97MB/step logits round-trip crowds the MSA feature
    # cache the decode program depends on. See ops/head.py.
    head_impl: str = "pallas"
    # Fused decode-step cell kernels (ops/megastep.py): "pallas" runs the
    # attention-LSTM + attention scores and the visual-gate + Copy-LSTM
    # as two Pallas kernels around the XLA grouped context einsums,
    # keeping the step's concat/gate-preactivation intermediates in VMEM.
    # Beam decode only (the pack is built by the prepare_topk hook);
    # soft-SCMA EditNet only; everything else falls back to "xla".
    # On-chip A/B (round 3, bench_matrix.jsonl): LOSES to "xla"
    # (-3.8% EditNet / -13% DCNet) — kept as a measured alternate.
    # Compile-time note: "pallas" + DecodeConfig.beam_impl="backptr"
    # timed out at 420s on chip (likely compile, unverified);
    # CaptionKitConfig warns on that pair.
    # "wholestep" (ops/wholestep.py) goes one level further: the lang
    # cell AND the vocab head fuse into ONE kernel, so h_lang never
    # round-trips HBM between them — the round-4 "whole-step kernel"
    # question answered by MEASUREMENT instead of the arithmetic bound.
    # On-chip paired A/B (round 5, bench_matrix.jsonl): LOSES 10.92%
    # to the default (7,602.6 vs 8,530.5 c/s, spread 0.28%) and 3.02%
    # to the two-kernel "pallas" path — the h-hop saving is outweighed
    # by the resident lang weights crowding the head's W streaming.
    # Kept as the measured closure of the kernel escalation ladder.
    # EditNet beam decode with the float pallas head only; everything
    # else falls back exactly like "pallas".
    cell_impl: str = "xla"
    # Serving-oriented head quantization: "int8" runs the beam decode's
    # fused top-k head on per-column-symmetric int8 weights with per-row
    # int8 activations (ops/head.py quantize_head / fused_head_topk_int8)
    # — the MXU's double-rate int8 path at ~1/4 the weight streaming.
    # APPROXIMATE: quantization error can flip near-tie beam choices, so
    # this is an explicit serving trade, never the default, and it only
    # affects the fused-top-k (beam) path — greedy/teacher-forcing logits
    # and training stay float. Per-arch guidance (measured on chip, round
    # 3, bench_matrix.jsonl): EditNet serving WINS (+1.9% over the band
    # ceiling, 7,878 c/s) because the ~100us head saving is a large
    # fraction of its 2.65ms step; DCNet LOSES 3.6% (13,254 vs 13,747)
    # because the same saving is a smaller slice of a 2.2ms step and the
    # per-batch quantize + in-kernel activation-quant overheads don't
    # amortize at DCNet's higher step rate. __post_init__ emits a runtime
    # hint when int8 is combined with arch="dcnet".
    head_quant: str = "none"
    # In-kernel top-k extraction algorithm for the fused head (float and
    # int8 twins; ops/head.py _lse_topk_update). "mask": k passes of
    # max/argmin-index/rewrite-winner-to--inf. "thresh": read-only
    # lexicographic-threshold extraction — the consumed prefix is exactly
    # the (value desc, index asc) head, so a (v_prev, i_prev) threshold
    # marks it; step 1's max is reused from the LSE pass and each later
    # step is two traversals with no tile rewrite. Results are identical
    # (lax.top_k tie semantics, pinned by tests) — but the round-5 chip
    # paired A/B measured thresh SLOWER end-to-end on both archs:
    # EditNet beam=5 paper scale −4.45% (8,513 vs 8,135 c/s, pair spread
    # 1.57%), DCNet −8.04% (15,250 vs 14,029, spread 1.28% — larger at
    # DCNet's higher head share). bench.py --ab head-extract=mask,thresh;
    # bench_matrix.jsonl. The fewer-passes intuition ignored that the
    # tile lives in VMEM/vregs where the mask rewrite is one cheap vector
    # op, while thresh's broadcast-threshold compares add VPU work per
    # traversal. "mask" is the measured default; "thresh" stays as the
    # exactness-pinned alternate and the recorded negative.
    head_extract: str = "mask"

    def __post_init__(self) -> None:
        # Validate the string-enum knobs up front: the dispatch sites test
        # `== "xla"` / `== "soft"`-style equality, so an unknown value
        # (typo, hand-edited JSON) would otherwise silently select the
        # other branch instead of erroring like DecodeConfig.method does.
        if self.arch not in ("dcnet", "editnet"):
            raise ValueError(f"ModelConfig.arch must be 'dcnet' or "
                             f"'editnet', got {self.arch!r}")
        if self.scma_select not in ("soft", "hard"):
            raise ValueError(f"ModelConfig.scma_select must be 'soft' or "
                             f"'hard', got {self.scma_select!r}")
        if self.head_impl not in ("pallas", "xla"):
            raise ValueError(f"ModelConfig.head_impl must be 'pallas' or "
                             f"'xla', got {self.head_impl!r}")
        if self.cell_impl not in ("pallas", "xla", "wholestep"):
            raise ValueError(f"ModelConfig.cell_impl must be 'pallas', "
                             f"'xla', or 'wholestep', got "
                             f"{self.cell_impl!r}")
        if self.head_quant not in ("none", "int8"):
            raise ValueError(f"ModelConfig.head_quant must be 'none' or "
                             f"'int8', got {self.head_quant!r}")
        if self.head_extract not in ("mask", "thresh"):
            raise ValueError(f"ModelConfig.head_extract must be 'mask' or "
                             f"'thresh', got {self.head_extract!r}")
        if self.head_quant == "int8" and self.arch == "dcnet":
            warnings.warn(
                "head_quant='int8' with arch='dcnet' measured SLOWER on "
                "chip (-3.6%, 13,254 vs 13,747 captions/s — the head "
                "saving doesn't amortize at DCNet's step rate; "
                "bench_matrix.jsonl). The int8 head is an EditNet serving "
                "knob; consider head_quant='none' for DCNet.",
                stacklevel=2,
            )

    @property
    def pad_id(self) -> int:
        return 0


@dataclass(frozen=True)
class DataConfig:
    """Static-shape input pipeline parameters (SURVEY.md §6 long-context row:
    the 'sequence engineering' here is padding/bucketing, not SP)."""

    max_len: int = 22  # <start> + up to 20 words + <end>, padded (static)
    max_existing_len: int = 22  # existing (AoANet) caption static length
    batch_size: int = 256
    min_word_freq: int = 5
    features_path: str = ""  # HDF5 with [N, 36, 2048] float features
    captions_path: str = ""  # encoded GT captions JSON
    existing_captions_path: str = ""  # encoded existing (AoANet) captions
    wordmap_path: str = ""  # word->id JSON (reference-compatible)
    captions_per_image: int = 5
    shuffle_buffer: int = 4096
    seed: int = 0
    # Length buckets for training batches (empty = single max_len width).
    # Each bucket width compiles its own XLA program; teacher forcing skips
    # the padding tail (SURVEY.md §8.1 'bucketed batching').
    bucket_boundaries: tuple[int, ...] = ()


@dataclass(frozen=True)
class TrainConfig:
    optimizer: str = "adam"
    learning_rate: float = 4e-4
    scst_learning_rate: float = 5e-5
    # SCST baseline: 1 = the reference recipe (one sample vs a greedy
    # rollout); n>1 = multi-sample SCST (n samples per image, each scored
    # against its siblings' leave-one-out mean reward — lower-variance,
    # and the greedy rollout disappears from the step).
    # Measured guidance (round-4 on-chip A/B, 600-image protocol,
    # docs/DESIGN.md session 8): n=4 showed NO CIDEr-per-wall-clock
    # advantage over n=1 (0.531 vs 0.569 at matched wall) — keep the
    # default 1 unless your reward/baseline regime is known to need LOO.
    scst_num_samples: int = 1
    grad_clip: float = 5.0  # max-abs clip, reference-style (SURVEY.md §3.3)
    epochs: int = 30
    scst_epochs: int = 10
    lr_decay_factor: float = 0.8
    lr_decay_patience: int = 3  # epochs without val-CIDEr improvement
    early_stop_patience: int = 10
    label_smoothing: float = 0.0
    # Polyak/EMA parameter averaging: > 0 tracks ema = d*ema + (1-d)*params
    # after every optimizer step (inside opt_state — train.state.EmaState),
    # WITHOUT touching the training trajectory. Validation decodes then
    # score the EMA weights, and train-xe/train-scst --export-ema writes
    # them as a decode-ready .npz. 0 = off (the reference recipe).
    # Measured guidance (on-chip A/Bs: examples/ensemble_ema_quality.py
    # session 9; examples/ema_scst_curve.py session 10 — the
    # win-condition run): the averaging window 1/(1-d) must be SMALL
    # against the remaining improvement horizon — d=0.98 on a 200-step
    # run lost 0.6 CIDEr to lag, d=0.9 was neutral. On EMA's home turf
    # (2,500-step SCST, d=0.995, window 200 << horizon) EMA reaches
    # near-plateau CIDEr ~2x earlier while the raw trajectory is still
    # churning (step 500: EMA 0.587 vs raw 0.514), then reads NEUTRAL at
    # the plateau (median delta -0.004 over the last 1,500 steps). Use it
    # for early-stopping robustness / time-to-quality under REINFORCE
    # noise, not for a converged-quality win; default stays 0.
    ema_decay: float = 0.0
    checkpoint_dir: str = "checkpoints"
    keep_checkpoints: int = 3
    log_every: int = 100
    eval_every_epochs: int = 1
    # Parallelism: pure data parallel over the ICI mesh (SURVEY.md §3.5).
    mesh_shape: tuple[int, ...] = (-1,)  # -1 = all local devices
    mesh_axis_names: tuple[str, ...] = ("data",)
    donate_state: bool = True
    # XE steps scanned into one dispatch (same math; amortizes launch
    # overhead — see train.xe.make_xe_train_multistep). 1 = step-per-call.
    steps_per_dispatch: int = 8
    seed: int = 42


@dataclass(frozen=True)
class DecodeConfig:
    method: str = "beam"  # "greedy" | "beam" | "sample"
    beam_size: int = 5
    max_decode_len: int = 22
    length_penalty: float = 0.0  # 0 = sum log-probs (reference-style)
    batch_size: int = 256  # images per device batch during split decode
    temperature: float = 1.0
    # Sampling truncation (method="sample" only): top_k > 0 keeps each
    # step's k highest-logit tokens; top_p < 1.0 keeps the smallest
    # nucleus whose softmax mass reaches p. 0 / 1.0 = the reference's
    # plain multinomial (SURVEY.md §4.4). They compose: top_k then top_p.
    top_k: int = 0
    top_p: float = 1.0
    seed: int = 0  # sampling seed (method="sample"); folded per batch
    # Host->device dtype for region features during split decode and
    # serving. "bfloat16" halves the dominant H2D traffic (the model
    # stores/computes context in bf16 anyway); "int8" halves it AGAIN
    # via per-region symmetric quantization on host + on-device dequant
    # to the same bf16 grid (data/featquant.py) — approximate by design,
    # measured at 0.0% caption churn at H=128 and H=1024
    # (examples/int8_quality_tradeoff.py --knob feed) and faster than
    # bf16 in all 6 interleaved sustained-load pairs (bench_serve
    # --ab-feed, bench_matrix.jsonl); "float32" preserves exact round-1
    # numerics. Use int8 when the host->device pipe is the serving wall
    # (bench_serve sustained sweep: saturation at 86-92% of the pipe).
    feed_dtype: str = "float32"
    # Beam-search sequence-history layout (decode.beam docstring):
    # "register" carries materialized [B, K, L] sequences through the
    # while loop; "backptr" records per-step [B, K] tokens/parents and
    # reconstructs sequences once after the loop. Identical results
    # (oracle-tested); the default is the measured-faster one on v5e.
    # On-chip A/B (round 3, bench_matrix.jsonl): backptr is a wash at
    # max_len=22 (7,590 vs the 7,626-7,730 band). Round-4 L-sweep
    # (22/40/64, medians of 3): backptr never crosses over — -0.6% /
    # +0.2% / -1.7% vs register — so "register" is right at every
    # measured length and "backptr" is an exactness-tested alternate
    # with no measured niche. Compile-time note:
    # combining beam_impl="backptr" with ModelConfig.cell_impl="pallas"
    # timed out at 420s on chip (likely compile, unverified) —
    # CaptionKitConfig warns on that pair.
    beam_impl: str = "register"

    def __post_init__(self) -> None:
        # Mirrors data/featquant.FEED_DTYPES (kept inline to avoid a
        # config->data import); anything else would fail deep inside a
        # jitted decode program with a dtype error instead of here.
        if self.feed_dtype not in ("float32", "bfloat16", "int8"):
            raise ValueError(
                f"decode.feed_dtype must be one of float32/bfloat16/int8,"
                f" got {self.feed_dtype!r}"
            )


@dataclass(frozen=True)
class CaptionKitConfig:
    name: str = "default"
    model: ModelConfig = field(default_factory=ModelConfig)
    data: DataConfig = field(default_factory=DataConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    decode: DecodeConfig = field(default_factory=DecodeConfig)

    def __post_init__(self) -> None:
        # Cross-section pathological pair (round-3 on-chip measurement,
        # bench_matrix.jsonl): backptr beam history + fused Pallas cell
        # kernels timed out at 420s (likely compile, unverified). Both
        # knobs individually lose/wash vs the defaults, so the
        # combination cannot win; warn rather than let a user discover a
        # silent multi-minute compile.
        if (self.decode.beam_impl == "backptr"
                and self.model.cell_impl in ("pallas", "wholestep")):
            warnings.warn(
                "decode.beam_impl='backptr' + model.cell_impl='pallas' "
                "timed out at 420s on chip (likely compile; "
                "bench_matrix.jsonl) and cannot beat the defaults — both "
                "knobs individually lose/wash. Use beam_impl='register' "
                "and/or cell_impl='xla'.",
                stacklevel=2,
            )

    def replace(self, **kw: Any) -> "CaptionKitConfig":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2, sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "CaptionKitConfig":
        raw = json.loads(s)
        return CaptionKitConfig(
            name=raw.get("name", "default"),
            model=ModelConfig(**raw.get("model", {})),
            data=DataConfig(**raw.get("data", {})),
            train=_train_from_raw(raw.get("train", {})),
            decode=DecodeConfig(**raw.get("decode", {})),
        )

    def override(self, dotted: dict[str, Any]) -> "CaptionKitConfig":
        """Apply CLI-style overrides like {"model.emb_dim": 512}."""
        out = self
        for key, value in dotted.items():
            section, _, leaf = key.partition(".")
            if not leaf:
                out = dataclasses.replace(out, **{section: value})
                continue
            sub = getattr(out, section)
            out = dataclasses.replace(
                out, **{section: dataclasses.replace(sub, **{leaf: value})}
            )
        return out


def _train_from_raw(raw: dict[str, Any]) -> TrainConfig:
    raw = dict(raw)
    for key in ("mesh_shape", "mesh_axis_names"):
        if key in raw and isinstance(raw[key], list):
            raw[key] = tuple(raw[key])
    return TrainConfig(**raw)


# --- Named configs: one per BASELINE.json "configs" entry -----------------

def _mk(name: str, **kw: Any) -> CaptionKitConfig:
    return CaptionKitConfig(name=name).override(kw)


NAMED_CONFIGS: dict[str, CaptionKitConfig] = {
    # BASELINE config #1: "DCNet greedy decode, batch=1, COCO Karpathy val"
    "dcnet_greedy": _mk(
        "dcnet_greedy",
        **{"model.arch": "dcnet", "decode.method": "greedy",
           "decode.beam_size": 1},
    ),
    # BASELINE config #2: "EditNet (SCMA + Copy-LSTM) greedy decode"
    "editnet_greedy": _mk(
        "editnet_greedy",
        **{"model.arch": "editnet", "decode.method": "greedy",
           "decode.beam_size": 1},
    ),
    # BASELINE config #3: "Batched beam search (beam=5) full Karpathy test"
    "editnet_beam5": _mk(
        "editnet_beam5",
        **{"model.arch": "editnet", "decode.method": "beam",
           "decode.beam_size": 5},
    ),
    # BASELINE config #4: "Cross-entropy training of DCNet+EditNet, DP mesh"
    "xe_train": _mk("xe_train", **{"model.arch": "editnet"}),
    # BASELINE config #5: "SCST self-critical CIDEr fine-tuning".
    # (run_scst_training reads train.scst_learning_rate.)
    "scst_train": _mk(
        "scst_train",
        **{"model.arch": "editnet", "train.scst_learning_rate": 5e-5},
    ),
    # Per-model variants (the reference trains/evaluates each editor
    # separately and with its own SCST phase, SURVEY.md §1).
    "dcnet_beam5": _mk(
        "dcnet_beam5",
        **{"model.arch": "dcnet", "decode.method": "beam",
           "decode.beam_size": 5},
    ),
    "dcnet_xe_train": _mk("dcnet_xe_train", **{"model.arch": "dcnet"}),
    "dcnet_scst_train": _mk(
        "dcnet_scst_train",
        **{"model.arch": "dcnet", "train.scst_learning_rate": 5e-5},
    ),
}


def get_named_config(name: str) -> CaptionKitConfig:
    try:
        return NAMED_CONFIGS[name]
    except KeyError:
        raise KeyError(
            f"unknown config {name!r}; available: {sorted(NAMED_CONFIGS)}"
        ) from None


def list_named_configs() -> list[str]:
    return sorted(NAMED_CONFIGS)
