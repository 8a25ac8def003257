"""Edge n-grams — the autocomplete/prefix-index filter (reference
``src/Lucene.Net.Analysis.Common/Analysis/NGram/
EdgeNGramTokenFilter.cs:38``): each token is REPLACED by its prefix
grams of lengths ``min_gram..max_gram`` (front edge only, the 4.8
Side.FRONT default); tokens shorter than ``min_gram`` emit nothing.

Pinned position/norm spec (4.8 semantics + discountOverlaps): all of
a token's grams share the source token's position (the first gram
carries the position increment, the rest are overlaps), so
``field_length``/norms count source tokens that produced at least one
gram — not the gram count.

Why it's a scale feature: an edge-gram field turns every prefix query
into an exact term lookup — autocomplete against 100 TB becomes one
pruned packed-block scan instead of a dictionary expansion + OR.
"""

from __future__ import annotations


def edge_ngrams(
    pairs: list[tuple[str, int]], min_gram: int = 1, max_gram: int = 4
) -> list[tuple[str, int]]:
    """Analyzed (term, pos) pairs -> edge-gram pairs (grams replace
    their source token, all at the source position)."""
    out: list[tuple[str, int]] = []
    for t, p in pairs:
        for i in range(min_gram, min(len(t), max_gram) + 1):
            out.append((t[:i], p))
    return out


def edge_field_length(pairs: list[tuple[str, int]], min_gram: int) -> int:
    """Source tokens producing >= 1 gram (the norm-counted stream)."""
    return sum(1 for t, _ in pairs if len(t) >= min_gram)


def ngrams(
    pairs: list[tuple[str, int]], min_gram: int = 1, max_gram: int = 2
) -> list[tuple[str, int]]:
    """NGramTokenFilter (``Analysis/NGram/NGramTokenFilter.cs:53``,
    4.4+ semantics): each token is REPLACED by ALL its contiguous
    n-grams of lengths ``min_gram..max_gram`` — offset-first, then
    increasing length ("abc", 1..2 -> a, ab, b, bc, c) — every gram at
    the source token's position (the first gram carries the position
    increment, the rest are overlaps). Tokens shorter than ``min_gram``
    emit nothing. Duplicate grams within a token are distinct token
    occurrences (they add to freq), exactly like the reference stream.

    Why it's a scale feature: an n-gram field turns an INFIX wildcard
    (``*lit*`` — otherwise a full-dictionary regex scan that no sort
    order can prune) into exact term lookups: ``lit`` within the gram
    range is ONE pruned packed-block read; longer literals become a
    conjunction of their max-size grams + an exact verify over just the
    candidates (search/substring.py).
    """
    out: list[tuple[str, int]] = []
    for t, p in pairs:
        L = len(t)
        for s in range(0, L - min_gram + 1):
            for n in range(min_gram, min(max_gram, L - s) + 1):
                out.append((t[s : s + n], p))
    return out
