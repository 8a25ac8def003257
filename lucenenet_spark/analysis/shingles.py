"""Shingles — word n-grams over the analyzed token stream (reference
``src/Lucene.Net.Analysis.Common/Analysis/Shingle/ShingleFilter.cs:47``:
joins adjacent tokens with a single-space separator, emits shingles of
sizes 2..max alongside the unigrams, substitutes the filler token
``_`` for positions a StopFilter removed, and never emits a shingle
that *starts* at a removed position or extends past the last real
token).

Pinned spec (matches the reference defaults ``outputUnigrams=true``,
``tokenSeparator=" "``, ``fillerToken="_"``):

- a shingle of size n starting at position p exists iff a REAL token
  sits at p and ``p + n - 1 <= max emitted position`` of the document;
  constituent holes inside that range render as ``_``;
- the shingle occupies position p (posIncrement 0 against its leading
  unigram), so phrase/span semantics over shingled fields behave like
  the reference's;
- shingles are overlap tokens: ``field_length``/norms count unigrams
  only (discountOverlaps — ``BM25Similarity.cs:133``).

Why it's a first-class scale feature: a shingled field turns phrase
queries into single-term lookups — at 100 TB a bigram TermQuery is one
pruned packed-block scan instead of a positions join.
"""

from __future__ import annotations

SEPARATOR = " "
FILLER = "_"


def add_shingles(
    pairs: list[tuple[str, int]], max_shingle_size: int = 2
) -> list[tuple[str, int]]:
    """Base analyzed (term, pos) pairs -> pairs + shingle tokens of
    sizes 2..max_shingle_size, each at its leading token's position.
    Input order (by position) is preserved; shingles follow their
    leading unigram."""
    if max_shingle_size < 2 or not pairs:
        return list(pairs)
    by_pos = {p: t for t, p in pairs}
    max_pos = max(by_pos)
    out: list[tuple[str, int]] = []
    for t, p in pairs:
        out.append((t, p))
        parts = [t]
        for n in range(2, max_shingle_size + 1):
            q = p + n - 1
            if q > max_pos:
                break
            parts.append(by_pos.get(q, FILLER))
            out.append((SEPARATOR.join(parts), p))
    return out
