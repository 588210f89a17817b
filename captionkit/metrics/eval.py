"""COCOEvalCap-style driver (SURVEY.md §4.5): tokenize refs+hyps once, run
every scorer, return one metrics dict. Pure host-side.

METEOR and SPICE are attached only when their Java jars are discoverable
(captionkit.metrics.external); otherwise the dict simply omits them — the
reference's parity gate rides on BLEU/ROUGE/CIDEr (SURVEY.md §3.4).
"""

from __future__ import annotations

import logging
from collections.abc import Mapping, Sequence
from typing import Optional

from captionkit.data.tokenize import ptb_tokenize
from captionkit.metrics.bleu import bleu_scores
from captionkit.metrics.cider import Cider, CiderD, NgramDocFreq
from captionkit.metrics.rouge import rouge_l

log = logging.getLogger(__name__)


class CaptionEvaluator:
    """evaluate({image_id: [ref strings]}, {image_id: hyp string}) -> dict.

    The 'CIDEr' key carries CIDEr-D semantics (count clipping + Gaussian
    length penalty): that is what the vendored cococaption reports under
    the name 'CIDEr', and what every val/best-checkpoint/parity decision
    keys on (SURVEY.md §2 L6). The textbook unclipped variant is available
    as 'CIDEr-unclipped' via ``with_unclipped_cider``.
    """

    def __init__(
        self,
        *,
        df: Optional[NgramDocFreq] = None,
        with_unclipped_cider: bool = False,
        use_external: bool = True,
    ):
        self.cider = CiderD(df)
        self.cider_unclipped = Cider(df) if with_unclipped_cider else None
        self.use_external = use_external

    def evaluate(
        self,
        references: Mapping[object, Sequence[str]],
        hypotheses: Mapping[object, str],
    ) -> dict[str, float]:
        ids = sorted(hypotheses.keys(), key=str)
        missing = [i for i in ids if i not in references]
        if missing:
            raise KeyError(f"no references for image ids {missing[:5]}")
        hyp_tok = [ptb_tokenize(hypotheses[i]) for i in ids]
        ref_tok = [[ptb_tokenize(r) for r in references[i]] for i in ids]

        out: dict[str, float] = {}
        for n, b in enumerate(bleu_scores(hyp_tok, ref_tok), start=1):
            out[f"BLEU-{n}"] = b
        out["ROUGE-L"] = rouge_l(hyp_tok, ref_tok)
        out["CIDEr"], _ = self.cider.compute(hyp_tok, ref_tok)
        if self.cider_unclipped is not None:
            out["CIDEr-unclipped"], _ = self.cider_unclipped.compute(
                hyp_tok, ref_tok
            )
        if self.use_external:
            from captionkit.metrics import external

            scorers = external.available_scorers()
            for name, scorer in scorers.items():
                try:
                    out[name] = scorer(references, hypotheses)
                except Exception:  # jar run failed — metric stays absent
                    log.warning("external scorer %s failed", name,
                                exc_info=True)
            if "METEOR" not in out:
                # No jar/JVM on this host: report the in-process
                # approximation under its own honest key (exact+stem
                # stages only — see metrics/meteor.py for what it omits).
                # Same never-crash-the-evaluator stance as the jar
                # scorers: the stemmer needs nltk, which is present on
                # dev hosts but NOT a declared dependency — without it
                # the metric is simply omitted, like before it existed.
                try:
                    from captionkit.metrics.meteor import meteor_lite

                    out["METEOR-lite"], _ = meteor_lite(hyp_tok, ref_tok)
                except Exception:
                    log.warning("METEOR-lite unavailable", exc_info=True)
        return out


def evaluate_captions(
    references: Mapping[object, Sequence[str]],
    hypotheses: Mapping[object, str],
    **kw,
) -> dict[str, float]:
    return CaptionEvaluator(**kw).evaluate(references, hypotheses)
