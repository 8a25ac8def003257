"""Synonym expansion — the SynonymFilter / analyzer-graph role
(reference ``src/Lucene.Net.Analysis.Common/Analysis/Synonym/
SynonymFilter.cs:47``: injects mapped terms at the same position,
posIncrement 0; ``SynonymMap.cs`` holds the one-way mapping).

Two placements, both pinned to this engine's analyzer contract
(injection applies to the EMITTED base tokens — post lowercase, post
length filter, post stop removal — so the same mapping drives the
index side, the query side, and the DuckDB oracle identically):

- **Index-time** (``CorpusSpec(synonyms=...)``): each emitted base
  token additionally emits its mapped synonyms at the SAME position.
  Duplicate (term, position) pairs collapse (a natural occurrence and
  an injected one at the same slot are one posting). ``field_length``
  and the norm byte count ONLY base tokens — the reference's
  ``discountOverlaps`` default (``BM25Similarity.cs:133`` /
  ``Similarities/SimilarityBase.cs:100`` discount posIncrement-0
  overlap tokens), so injection never changes document norms, only
  df/tf of the injected terms.

- **Query-time** (:func:`expand_query`): rewrites the Query AST the
  way the classic QueryParser handles stacked (posIncrement-0) tokens
  (``QueryParserBase.cs`` field-query construction): a TermQuery whose
  term has synonyms becomes a SHOULD-of-terms BooleanQuery; a
  PhraseQuery becomes a MultiPhraseQuery whose slots carry the
  alternatives (``Search/MultiPhraseQuery.cs:72``). Boost is preserved
  on the rewritten node. Boolean / dismax / constant-score recurse;
  multi-term (wildcard-family) queries pass through unchanged.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

if TYPE_CHECKING:  # import at call time: builder imports this module,
    # and search.queries pulls in the searcher package (cycle)
    from lucenenet_spark.search.queries import Query

# picklable frozen form: ((source, (syn, ...)), ...) sorted by source
SynonymMapT = tuple[tuple[str, tuple[str, ...]], ...]


def synonym_map(mapping: dict[str, list[str] | tuple[str, ...]]) -> SynonymMapT:
    """Normalize a {source: [synonyms...]} dict into the frozen,
    picklable, deterministically-ordered form CorpusSpec carries.
    Self-mappings are dropped (a term is always its own match)."""
    out = []
    for src in sorted(mapping):
        syns = tuple(
            sorted({s for s in mapping[src] if s and s != src})
        )
        if syns:
            out.append((src, syns))
    return tuple(out)


def inject_synonyms(
    pairs: list[tuple[str, int]], mapping: SynonymMapT | dict
) -> list[tuple[str, int]]:
    """Index-time injection: base (term, pos) pairs plus each mapped
    synonym at the same position; duplicate (term, pos) collapse.
    Output is position-sorted per the packed-block encoder contract."""
    m = mapping if isinstance(mapping, dict) else dict(mapping)
    out = set(pairs)
    for t, p in pairs:
        for s in m.get(t, ()):
            out.add((s, p))
    return sorted(out, key=lambda tp: (tp[1], tp[0]))


def expand_query(q: Query, mapping: SynonymMapT | dict) -> Query:
    """Query-time synonym rewrite over the Query AST (see module doc).
    Queries without any mapped term are returned unchanged (identity),
    so callers can apply this unconditionally."""
    m = mapping if isinstance(mapping, dict) else dict(mapping)
    return _expand(q, m)


def _expand(q: Query, m: dict[str, tuple[str, ...]]) -> Query:
    from lucenenet_spark.search.queries import (
        BooleanClause,
        BooleanQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        MultiPhraseQuery,
        Occur,
        PhraseQuery,
        TermQuery,
    )

    if isinstance(q, TermQuery):
        syns = m.get(q.term, ())
        if not syns:
            return q
        return BooleanQuery(
            boost=q.boost,
            clauses=tuple(
                BooleanClause(TermQuery(term=t, field=q.field), Occur.SHOULD)
                for t in (q.term, *syns)
            ),
        )
    if isinstance(q, PhraseQuery):
        if not any(t in m for t in q.phrase_terms):
            return q
        return MultiPhraseQuery(
            boost=q.boost,
            slots=tuple((t, *m.get(t, ())) for t in q.phrase_terms),
            term_positions=q.term_positions,
            slop=q.slop,
            field=q.field,
        )
    if isinstance(q, MultiPhraseQuery):
        if not any(t in m for slot in q.slots for t in slot):
            return q
        slots = tuple(
            tuple(dict.fromkeys(s for t in slot for s in (t, *m.get(t, ()))))
            for slot in q.slots
        )
        return MultiPhraseQuery(
            boost=q.boost,
            slots=slots,
            term_positions=q.term_positions,
            slop=q.slop,
            field=q.field,
        )
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            boost=q.boost,
            clauses=tuple(
                BooleanClause(_expand(c.query, m), c.occur) for c in q.clauses
            ),
            minimum_number_should_match=q.minimum_number_should_match,
        )
    if isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            boost=q.boost,
            disjuncts=tuple(_expand(d, m) for d in q.disjuncts),
            tie_breaker=q.tie_breaker,
        )
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(boost=q.boost, query=_expand(q.query, m))
    return q
