"""captionkit — a TPU-native caption-editing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``fawazsammani/show-edit-tell`` ("Show, Edit and Tell: A Framework for Editing
Image Captions", CVPR 2020, arXiv:2003.03107):

* **DCNet** — an LSTM denoising auto-encoder that edits an existing caption
  conditioned only on that caption (SURVEY.md §1, §3.2).
* **EditNet** — a top-down (Up-Down style) two-LSTM decoder over 36x2048
  bottom-up region features with **SCMA** (Selective Copy Memory Attention
  over the caption encoder's cell states) and a **Copy-LSTM** cell whose copy
  gate chooses copy-vs-generate per word (SURVEY.md §1, §4.2).

Design principles (TPU-first, not a port):

* All decode loops are device-resident ``lax.scan`` / ``lax.while_loop``
  programs over static shapes — no host round-trips per token.
* One ``step`` function per model is the single source of numeric truth for
  teacher forcing, greedy decode, beam search, and SCST rollouts.
* Data parallelism via ``jax.sharding`` (NamedSharding over a Mesh), with XLA
  collectives over ICI; no NCCL-style code.
* Hot cells (LSTM / Copy-LSTM + SCMA + attention) have fused Pallas TPU
  kernels behind the same interface as the pure-jnp reference cells.

Layout (maps to SURVEY.md §2's layer table):

* ``captionkit.data``     — L1'/L2': vocab, tokenizer, static-shape pipeline
* ``captionkit.nn``       — L0' numerics: cells, attention, SCMA (pure jnp)
* ``captionkit.ops``      — L0' Pallas TPU kernels (fused cell/attention)
* ``captionkit.models``   — L3': DCNet / EditNet with a shared step protocol
* ``captionkit.decode``   — L5': greedy + batched beam search on device
* ``captionkit.train``    — L4': XE + SCST train steps, checkpointing
* ``captionkit.metrics``  — L6': host-side BLEU/ROUGE/CIDEr(-D) + adapters
* ``captionkit.parallel`` — mesh & sharding utilities (ICI data parallel)
* ``captionkit.convert``  — PyTorch checkpoint -> JAX pytree conversion
* ``captionkit.utils``    — config system, logging, misc

Reference provenance: ``/root/reference`` was empty at survey and build time
(SURVEY.md §0); behaviour is reconstructed from BASELINE.json and the paper.
Where reference file:line citations are required they are marked ``⟦cite⟧``
for backfill per SURVEY.md §0.
"""

__version__ = "0.1.0"

from captionkit.utils.config import (  # noqa: F401
    CaptionKitConfig,
    DataConfig,
    DecodeConfig,
    ModelConfig,
    TrainConfig,
    get_named_config,
    list_named_configs,
)
