"""Per-program TPU compiler options.

v5e cores have 128MB of VMEM. XLA splits it between "scoped" memory
(pallas kernel stacks, fusion scratch) and the alternate-memory pool its
memory-space-assignment pass uses to cache hot HBM buffers. The default
scoped limit (16MB) starves the beam-decode program both ways: the fused
vocab-head kernel is capped to small tiles, AND — measured via xprof —
MSA ping-pongs the 75MB region-feature tensor between memory spaces every
step (a full extra copy per decode step). Raising the scoped limit to
48MB was worth +10% end-to-end on the beam-5 paper-scale decode
(6,539 -> 7,187 captions/s; 32M is neutral, 80M+ regresses by starving
MSA — sweep recorded in docs/DESIGN.md).

Only the decode programs opt in; the XE train step measured slightly
NEGATIVE with it (16.9 -> 16.0 steps/s at B=256, scan_k=8), so training
keeps the default split. CAPTIONKIT_SCOPED_VMEM_KIB overrides (0
disables).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_KIB = 49152


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - no backend at all
        return False


def decode_compiler_options() -> dict[str, str]:
    """compiler_options for jitted decode programs ({} off-TPU)."""
    kib = int(os.environ.get("CAPTIONKIT_SCOPED_VMEM_KIB", _DEFAULT_KIB))
    if kib <= 0 or not _on_tpu():
        return {}
    return {"xla_tpu_scoped_vmem_limit_kib": str(kib)}
