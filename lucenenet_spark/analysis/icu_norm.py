"""ICU normalization role — the algorithmic core of the reference's
``Lucene.Net.Analysis.ICU`` ``ICUNormalizer2Filter`` (default mode:
NFKC + Unicode case folding, "nfkc_cf") and ``ICUFoldingFilter``
(nfkc_cf + diacritic folding), re-expressed over the standard
library's ``unicodedata`` instead of an ICU binding (not available in
this environment; the UCD tables behind ``unicodedata.normalize`` are
the same data ICU consumes).

Scope note: ICU's full Normalizer2 surface (custom .nrm tables,
script-sensitive tailorings, UTR#30) is configuration on top of the
UCD; the pinned behaviors here are the two defaults the reference's
analyzers actually instantiate.  Fixture-tested in
``tests/test_icu_norm.py``; composable with the UAX#29 tokenizer via
:func:`make_icu_analyzer`.
"""

from __future__ import annotations

import unicodedata

from lucenenet_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _token_re_for,
)


def nfkc_casefold(text: str) -> str:
    """nfkc_cf: NFKC normalization + full case folding + default-
    ignorable removal (the ICU "nfkc_cf" normalizer; Unicode §5.18
    defines NFKC_Casefold as NFKC(casefold(NFD(x))) — iterating NFKC
    + str.casefold to a fixed point reaches the same form for the
    sequences the UCD ships)."""
    prev = None
    out = text
    while out != prev:
        prev = out
        out = unicodedata.normalize("NFKC", out.casefold())
    # strip default-ignorables that survive NFKC (ZWNJ/ZWJ/word-joiner
    # class characters the ICU normalizer drops)
    return "".join(
        ch for ch in out if ch not in "​‌‍⁠﻿­"
    )


def icu_fold(text: str) -> str:
    """ICUFoldingFilter role: nfkc_cf plus diacritic folding — NFKD
    decomposition with combining marks (category Mn) removed, then
    NFKC recomposition of what remains."""
    base = nfkc_casefold(text)
    decomposed = unicodedata.normalize("NFKD", base)
    stripped = "".join(
        ch for ch in decomposed if unicodedata.category(ch) != "Mn"
    )
    return unicodedata.normalize("NFKC", stripped)


def make_icu_analyzer(fold: bool = False):
    """Standard pipeline with the ICU normalizer applied BEFORE
    tokenization (the reference chains the CharFilter/TokenFilter the
    same way: normalize, tokenize, stop-filter with position gaps)."""
    norm = icu_fold if fold else nfkc_casefold

    def analyze_icu(text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        nt = norm(text)
        toks = _token_re_for(nt).findall(nt)
        toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
        return [
            (t, i) for i, t in enumerate(toks)
            if t not in ENGLISH_STOP_WORDS
        ]

    return analyze_icu
