"""Tokenizers.

The reference pipeline tokenizes captions twice:

1. Data prep: lowercase word-split of COCO captions (Karpathy JSON already
   ships tokens) — `simple_tokenize` here.
2. Metric eval: PTBTokenizer via a Stanford CoreNLP *Java subprocess*
   (SURVEY.md §3.4). We replace that with `ptb_tokenize`, a pure-Python
   reimplementation of the PTB tokenizer behaviour that pycocoevalcap
   relies on (punctuation stripping + splitting). It is host-side and
   decode-time only, so Python is the right tool; the optional Java jar
   adapter lives in captionkit.metrics.external.
"""

from __future__ import annotations

import re

# Punctuation the COCO PTBTokenizer path removes from captions. Mirrors the
# PUNCTUATIONS list used by pycocoevalcap's PTBTokenizer wrapper (SURVEY.md
# §3.4 ⟦cite: cococaption/tokenizer — mount empty⟧).
_PUNCTUATIONS = {
    "''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-",
    ".", "?", "!", ",", ":", "-", "--", "...", ";",
}

_CONTRACTION_RE = re.compile(
    r"\b(can)(not)\b|\b(d)('ye)\b|\b(gim)(me)\b|\b(gon)(na)\b|"
    r"\b(got)(ta)\b|\b(lem)(me)\b|\b(wan)(na)\b",
    re.IGNORECASE,
)
# Split off clitics the way PTB does: n't, 'll, 're, 've, 'd, 's, 'm.
_CLITIC_RE = re.compile(r"(n't|'ll|'re|'ve|'d|'s|'m)$", re.IGNORECASE)
_WORD_RE = re.compile(r"[^\s]+")
_PUNCT_SPLIT_RE = re.compile(r"([.,!?;:]+|'{2}|`{2}|\.\.\.)")


def simple_tokenize(text: str) -> list[str]:
    """Lowercase whitespace/punctuation word-split used at data-prep time."""
    text = text.lower().strip()
    text = re.sub(r"[^a-z0-9' ]+", " ", text)
    return [t for t in text.split() if t]


def ptb_tokenize(text: str) -> list[str]:
    """PTB-style tokenization matching the cococaption eval path closely
    enough for metric parity on ASCII captions: lowercase, split punctuation
    into tokens, split clitics, then drop PTB punctuation tokens."""
    text = text.lower().strip()
    pieces: list[str] = []
    for raw in _WORD_RE.findall(text):
        for part in _PUNCT_SPLIT_RE.split(raw):
            if not part:
                continue
            m = _CLITIC_RE.search(part)
            if m and m.start() > 0:
                pieces.append(part[: m.start()])
                pieces.append(part[m.start():])
            else:
                pieces.append(part)
    return [p for p in pieces if p not in _PUNCTUATIONS]


def ptb_tokenize_to_string(text: str) -> str:
    return " ".join(ptb_tokenize(text))
