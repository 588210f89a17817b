"""Caption metrics (SURVEY.md §3.4) — host-side, pure Python/NumPy.

Reimplements the vendored cococaption/pycocoevalcap scorers the reference
calls after every decode: BLEU-1..4, ROUGE-L, CIDEr and CIDEr-D, matching
the toolkit's exact algorithms (clipped counts, closest-ref brevity
penalty, tf-idf with per-image df, Gaussian length penalty for -D).
METEOR/SPICE remain optional Java-jar adapters behind a clean interface
(captionkit.metrics.external) — the parity gate (CIDEr ±0.2) does not
require them (SURVEY.md §3.4 rebuild plan). When no jar/JVM exists the
evaluator reports METEOR-lite, an in-process exact+stem approximation
(captionkit.metrics.meteor) under its own key.

The SCST-critical piece is ``CiderD`` with a precomputed document-frequency
corpus (SURVEY.md §3.3 'CIDEr-D reward scorer'); it also has a C++
fast path (captionkit.metrics.fast) used when the native library is built.
"""

from captionkit.metrics.bleu import bleu_scores  # noqa: F401
from captionkit.metrics.meteor import meteor_lite, meteor_lite_score  # noqa: F401
from captionkit.metrics.rouge import rouge_l  # noqa: F401
from captionkit.metrics.cider import Cider, CiderD, NgramDocFreq  # noqa: F401
from captionkit.metrics.eval import CaptionEvaluator, evaluate_captions  # noqa: F401
