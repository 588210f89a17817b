"""Device-resident decoding (SURVEY.md §8.1 step 4).

The reference decodes batch=1 per image with a Python step loop
(SURVEY.md §4.3 — the throughput-metric path). Here whole split batches
decode inside compiled loops with zero host round-trips:

* ``greedy_decode``  — lax.scan over max_len, argmax feedback.
* ``sample_decode``  — lax.scan with categorical sampling + per-step
  log-probs (the SCST rollout primitive).
* ``beam_search``    — batched beam=K search in one lax.while_loop with
  early exit when every beam of every image is finished; static [B, K, L]
  state, gather-based beam reorder.
"""

from captionkit.decode.greedy import greedy_decode, sample_decode  # noqa: F401
from captionkit.decode.beam import beam_search, BeamResult  # noqa: F401
from captionkit.decode.introspect import (  # noqa: F401
    AttentionTrace,
    BeamAttentionTrace,
    attention_report,
    beam_decode_with_attention,
    greedy_decode_with_attention,
)
