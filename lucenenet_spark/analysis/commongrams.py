"""CommonGramsFilter — stopword-adjacent bigrams (reference
``Analysis/CommonGrams/CommonGramsFilter.cs:40`` +
``CommonGramsQueryFilter.cs:34``): phrases containing very common words
("the batch") normally force a positions join against the most
expensive posting lists in the index; indexing the bigram ``the_batch``
as a single overlap term turns that phrase into ONE rare-term lookup.

Pinned spec (index side, ``CorpusSpec(common_grams=True)``):

- base tokens = the standard pipeline's length-filtered, lowercased
  stream; positions = raw token index (stop positions preserved)
- UNIGRAMS: non-stop tokens at their positions (the StopFilter role —
  same surviving set and positions as the default analyzer)
- BIGRAMS: for every adjacent raw pair where EITHER side is a common
  word, the term ``left_right`` at the LEFT token's position, marked
  overlap (excluded from field_length/norms — discountOverlaps), like
  the reference's posIncrement-0 gram tokens

Query side (``common_grams_query_terms``, the CommonGramsQueryFilter
role): adjacent pairs involving a common word are REPLACED by the
bigram; stop unigrams disappear; surviving tokens keep their raw
positions — ready for a PhraseQuery over mixed unigram/bigram slots.
"""

from __future__ import annotations

from lucenenet_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    _TOKEN_RE,
)


def _raw_tokens(text: str) -> list[str]:
    if not text:
        return []
    toks = _TOKEN_RE.findall(text.lower())
    return [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]


def analyze_common_grams(
    text: str, common: frozenset[str] = ENGLISH_STOP_WORDS
) -> list[tuple[str, int, bool]]:
    """[(term, position, is_overlap)] — unigrams + common-word bigrams."""
    raw = _raw_tokens(text)
    out: list[tuple[str, int, bool]] = []
    for i, t in enumerate(raw):
        if t not in common:
            out.append((t, i, False))
        if i + 1 < len(raw) and (t in common or raw[i + 1] in common):
            out.append((f"{t}_{raw[i + 1]}", i, True))
    return out


def common_grams_query_terms(
    text: str, common: frozenset[str] = ENGLISH_STOP_WORDS
) -> list[tuple[str, int]]:
    """CommonGramsQueryFilter: bigrams REPLACE the pairs they cover;
    common unigrams vanish; positions are raw indexes."""
    raw = _raw_tokens(text)
    out: list[tuple[str, int]] = []
    covered: set[int] = set()
    for i, t in enumerate(raw):
        if i + 1 < len(raw) and (t in common or raw[i + 1] in common):
            out.append((f"{t}_{raw[i + 1]}", i))
            covered.add(i)
            covered.add(i + 1)
    for i, t in enumerate(raw):
        if t not in common and i not in covered:
            out.append((t, i))
    out.sort(key=lambda p: p[1])
    return out
