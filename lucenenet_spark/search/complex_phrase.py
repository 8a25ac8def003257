"""ComplexPhraseQueryParser — wildcards/fuzzy/groups INSIDE phrases
(reference ``src/Lucene.Net.QueryParser/ComplexPhrase/
ComplexPhraseQueryParser.cs:47``): ``"fast (merge join) par*"~2``
parses each phrase slot into a span clause and returns the span-query
rewrite the reference builds at ``:290-356``:

- plain word            -> SpanTermQuery (analyzed)
- ``par*`` / ``w?ld``   -> SpanMultiTermQuery(Prefix/Wildcard)
- ``word~N``            -> SpanMultiTermQuery(Fuzzy)
- ``(a b c)`` group     -> SpanOrQuery of its members; ``-x`` members
                           make it SpanNot(SpanOr(ors), SpanOr(nots))
                           (``AddComplexPhraseClause``, ``:362-410``)
- no negatives          -> SpanNearQuery(clauses, slop, in_order)
- mixed ``-`` clauses   -> SpanNot(SpanNear(positives, slop + nNeg),
                           SpanNear(all, slop)) (``:322-356``)

``in_order`` defaults True (``:75``). Evaluation is
:func:`lucenenet_spark.search.spans.span_query` — one term-pruned
packed scan; multi-term clauses expand against the dictionary.
"""

from __future__ import annotations

import re

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.search.queries import (
    FuzzyQuery,
    PrefixQuery,
    WildcardQuery,
)
from lucenenet_spark.search.spans import (
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_SLOP = re.compile(r'~(\d+)\s*$')


def _leaf(word: str) -> SpanQuery | None:
    """One phrase slot word -> span clause (None if it analyzes away,
    e.g. a stopword — the slot simply vanishes, classic-parser
    leniency)."""
    fm = re.match(r"(.+?)~(\d*)$", word)
    if fm:
        edits = int(fm.group(2)) if fm.group(2) else 2
        return SpanMultiTermQuery(
            FuzzyQuery(term=fm.group(1).lower(), max_edits=edits)
        )
    if "*" in word or "?" in word:
        if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
            return SpanMultiTermQuery(PrefixQuery(prefix=word[:-1].lower()))
        return SpanMultiTermQuery(WildcardQuery(pattern=word.lower()))
    pairs = analyze(word)
    if not pairs:
        return None
    if len(pairs) == 1:
        return SpanTermQuery(term=pairs[0][0])
    # a single slot that analyzes to several tokens: adjacent near
    return SpanNearQuery(
        clauses=tuple(SpanTermQuery(term=t) for t, _ in pairs),
        slop=0,
        in_order=True,
    )


def _group(body: str) -> SpanQuery | None:
    """(a b -c) -> SpanOr / SpanNot(SpanOr, SpanOr) per the reference's
    AddComplexPhraseClause."""
    ors: list[SpanQuery] = []
    nots: list[SpanQuery] = []
    for w in body.split():
        neg = w.startswith("-")
        leaf = _leaf(w[1:] if neg else w)
        if leaf is not None:
            (nots if neg else ors).append(leaf)
    if not ors:
        return None
    soq = ors[0] if len(ors) == 1 else SpanOrQuery(clauses=tuple(ors))
    if not nots:
        return soq
    snq = nots[0] if len(nots) == 1 else SpanOrQuery(clauses=tuple(nots))
    return SpanNotQuery(include=soq, exclude=snq)


def parse_complex_phrase(s: str, in_order: bool = True) -> SpanQuery | None:
    """Parse ``"..."~N`` (quotes optional) into the span rewrite.
    Returns None when every slot analyzes away."""
    s = s.strip()
    slop = 0
    m = _SLOP.search(s)
    if m:
        slop = int(m.group(1))
        s = s[: m.start()].rstrip()
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        s = s[1:-1]
    # split into slots: groups stay whole
    slots: list[tuple[bool, str]] = []  # (negated, body-or-group)
    i, n = 0, len(s)
    while i < n:
        if s[i].isspace():
            i += 1
            continue
        neg = False
        if s[i] == "-":
            neg = True
            i += 1
        if i < n and s[i] == "(":
            j = s.find(")", i + 1)
            j = n if j < 0 else j  # lenient: EOF closes
            slots.append((neg, s[i : j + 1]))
            i = j + 1
        else:
            j = i
            while j < n and not s[j].isspace():
                j += 1
            slots.append((neg, s[i:j]))
            i = j
    clauses: list[SpanQuery] = []
    occur_neg: list[bool] = []
    for neg, body in slots:
        c = (
            _group(body[1:-1] if body.endswith(")") else body[1:])
            if body.startswith("(")
            else _leaf(body)
        )
        if c is not None:
            clauses.append(c)
            occur_neg.append(neg)
    if not clauses:
        return None
    n_neg = sum(occur_neg)
    if len(clauses) == 1 and n_neg == 0:
        return clauses[0]
    if n_neg == 0:
        return SpanNearQuery(clauses=tuple(clauses), slop=slop, in_order=in_order)
    positives = tuple(c for c, neg in zip(clauses, occur_neg) if not neg)
    if not positives:
        return None
    include: SpanQuery = (
        positives[0]
        if len(positives) == 1
        else SpanNearQuery(
            clauses=positives, slop=slop + n_neg, in_order=in_order
        )
    )
    exclude = SpanNearQuery(clauses=tuple(clauses), slop=slop, in_order=in_order)
    return SpanNotQuery(include=include, exclude=exclude)
