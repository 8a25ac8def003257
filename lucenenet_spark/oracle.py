"""Single-process reference implementation of index build + BM25 search.

Plays the role Lucene's test framework plays for Lucene itself
(RandomIndexWriter + CheckHits, SURVEY.md §5): an independent,
trivially-auditable implementation with the *same pinned semantics* —
same analyzer, same float32 operation order, same tie-breaks — that the
distributed engine must match rank- and score-identically
(FIXTURES.md §5).

Pure python/numpy; no Spark. Dict-of-lists inverted index.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.functions import bm25
from lucenenet_spark.functions.smallfloat import norm_byte_from_length
from lucenenet_spark.search.queries import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)


@dataclass
class OracleIndex:
    # term -> {docid: (freq, positions)}
    postings: dict[str, dict[int, tuple[int, list[int]]]]
    norms: np.ndarray  # uint8 per docid
    field_lengths: np.ndarray
    max_doc: int
    sum_total_term_freq: int

    @property
    def terms(self) -> list[str]:
        return sorted(self.postings)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, {}))


def build_oracle_index(texts: list[str]) -> OracleIndex:
    """docid = list position (caller pins the total order)."""
    postings: dict[str, dict[int, tuple[int, list[int]]]] = {}
    fls = np.zeros(len(texts), dtype=np.int64)
    for docid, text in enumerate(texts):
        pairs = analyze(text or "")
        fls[docid] = len(pairs)
        agg: dict[str, list[int]] = {}
        for t, p in pairs:
            agg.setdefault(t, []).append(p)
        for t, pos in agg.items():
            postings.setdefault(t, {})[docid] = (len(pos), pos)
    return OracleIndex(
        postings=postings,
        norms=norm_byte_from_length(fls),
        field_lengths=fls,
        max_doc=len(texts),
        sum_total_term_freq=int(fls.sum()),
    )


class OracleSearcher:
    MAX_CLAUSE_COUNT = 1024

    def __init__(self, index: OracleIndex):
        self.index = index
        self._avgdl = bm25.avg_field_length(index.sum_total_term_freq, index.max_doc)
        self._cache = bm25.norm_cache(self._avgdl)

    def search(self, query: Query, k: int = 10) -> list[tuple[int, np.float32]]:
        scores = self._score(self._expand(query.rewrite()))
        hits = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, s) for d, s in hits[:k]]

    def count(self, query: Query) -> int:
        return len(self._score(self._expand(query.rewrite())))

    # -- expansion identical to IndexSearcher._expand, driven by the
    # python predicate over the sorted term dictionary
    def _expand(self, q: Query) -> Query:
        if isinstance(q, MultiTermQuery):
            terms = [t for t in self.index.terms if q.python_predicate(t)]
            terms = terms[: self.MAX_CLAUSE_COUNT]
            from lucenenet_spark.search.queries import FuzzyQuery, _levenshtein

            if isinstance(q, FuzzyQuery):
                clauses = []
                for t in terms:
                    edits = _levenshtein(t, q.term)
                    sim = 1.0 - edits / min(len(t), len(q.term))
                    clauses.append((TermQuery(boost=q.boost * sim, term=t), Occur.SHOULD))
                return BooleanQuery.of(*clauses)
            inner = BooleanQuery.of(*[(TermQuery(term=t), Occur.SHOULD) for t in terms])
            return ConstantScoreQuery(boost=q.boost, query=inner)
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                q.boost,
                tuple(type(c)(self._expand(c.query), c.occur) for c in q.clauses),
                q.minimum_number_should_match,
            )
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                q.boost, tuple(self._expand(d) for d in q.disjuncts), q.tie_breaker
            )
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(q.boost, self._expand(q.query))
        return q

    # -- scoring: docid -> float32
    def _score(self, q: Query) -> dict[int, np.float32]:
        if isinstance(q, TermQuery):
            return self._term(q)
        if isinstance(q, MatchAllDocsQuery):
            b = np.float32(q.boost)
            return {d: b for d in range(self.index.max_doc)}
        if isinstance(q, ConstantScoreQuery):
            inner = self._score(q.query)
            b = np.float32(q.boost)
            return {d: b for d in inner}
        if isinstance(q, BooleanQuery):
            return self._boolean(q)
        if isinstance(q, DisjunctionMaxQuery):
            return self._dismax(q)
        if isinstance(q, PhraseQuery):
            return self._phrase(q)
        if isinstance(q, MultiPhraseQuery):
            return self._multi_phrase(q)
        raise NotImplementedError(type(q).__name__)

    def _multi_phrase(self, q: MultiPhraseQuery) -> dict[int, np.float32]:
        """Slot-union mirror of searcher._multi_phrase."""
        slots = [tuple(s) for s in q.slots if s]
        rels = list(q.positions())
        present = [
            [t for t in slot if t in self.index.postings] for slot in slots
        ]
        if not slots or any(not p for p in present):
            return {}
        idfs = [
            bm25.idf(self.index.df(t), self.index.max_doc)
            for slot in slots
            for t in slot
        ]
        w = bm25.term_weight(bm25.float32_ordered_sum(np.array(idfs)), q.boost)
        cand = set.intersection(
            *[set().union(*[self.index.postings[t] for t in p]) for p in present]
        )
        out = {}
        for d in sorted(cand):
            unions = []
            ok = True
            for p in present:
                arrs = [
                    np.array(self.index.postings[t][d][1], dtype=np.int64)
                    for t in p
                    if d in self.index.postings[t]
                ]
                if not arrs:
                    ok = False
                    break
                unions.append(np.unique(np.concatenate(arrs)))
            if not ok:
                continue
            if q.slop == 0:
                acc = unions[0] - rels[0]
                for u, r in zip(unions[1:], rels[1:]):
                    acc = np.intersect1d(acc, u - r, assume_unique=True)
                    if acc.size == 0:
                        break
                f = np.float32(np.count_nonzero(acc >= 0))
            else:
                from lucenenet_spark.functions.sloppy import sloppy_phrase_freq

                f = sloppy_phrase_freq(
                    unions, q.slop, offsets=rels,
                    term_keys=[tuple(s) for s in slots],
                )
            if f > 0:
                c = self._cache[int(self.index.norms[d])]
                out[d] = np.float32(w * f / (f + c))
        return out

    def _term(self, q: TermQuery) -> dict[int, np.float32]:
        plist = self.index.postings.get(q.term)
        if not plist:
            return {}
        w = bm25.term_weight(bm25.idf(len(plist), self.index.max_doc), q.boost)
        out = {}
        for docid, (freq, _pos) in plist.items():
            f = np.float32(freq)
            c = self._cache[int(self.index.norms[docid])]
            out[docid] = np.float32(w * f / (f + c))
        return out

    def _boolean(self, q: BooleanQuery) -> dict[int, np.float32]:
        must = [c for c in q.clauses if c.occur == Occur.MUST]
        should = [c for c in q.clauses if c.occur == Occur.SHOULD]
        nots = [c for c in q.clauses if c.occur == Occur.MUST_NOT]
        if not must and not should:
            return {}
        clause_scores: list[tuple[int, str, dict[int, np.float32]]] = []
        for cidx, c in enumerate(q.clauses):
            if c.occur == Occur.MUST_NOT:
                continue
            s = self._score(c.query)
            if not s and c.occur == Occur.MUST:
                return {}
            clause_scores.append((cidx, c.occur.value, s))
        candidates: set[int] = set()
        for _cidx, kind, s in clause_scores:
            candidates |= set(s)
        n_must = len(must)
        required_should = max(q.minimum_number_should_match, 0 if must else 1)
        excluded: set[int] = set()
        for c in nots:
            excluded |= set(self._score(c.query))
        out: dict[int, np.float32] = {}
        boost = np.float32(q.boost)
        for d in candidates:
            if d in excluded:
                continue
            nm = sum(1 for _i, kind, s in clause_scores if kind == "MUST" and d in s)
            ns = sum(1 for _i, kind, s in clause_scores if kind == "SHOULD" and d in s)
            if nm != n_must or ns < required_should:
                continue
            acc = np.float32(0.0)
            for _cidx, _kind, s in clause_scores:  # clause-index order
                if d in s:
                    acc = np.float32(acc + s[d])
            out[d] = np.float32(acc * boost)
        return out

    def _dismax(self, q: DisjunctionMaxQuery) -> dict[int, np.float32]:
        subs = [self._score(d) for d in q.disjuncts]
        candidates: set[int] = set()
        for s in subs:
            candidates |= set(s)
        tie, boost = np.float32(q.tie_breaker), np.float32(q.boost)
        out = {}
        for d in candidates:
            mx, acc = np.float32(0.0), np.float32(0.0)
            for s in subs:
                if d in s:
                    v = s[d]
                    acc = np.float32(acc + v)
                    if v > mx:
                        mx = v
            out[d] = np.float32((mx + np.float32(acc - mx) * tie) * boost)
        return out

    def _phrase(self, q: PhraseQuery) -> dict[int, np.float32]:
        terms, rels = list(q.phrase_terms), list(q.positions())
        if not terms or any(t not in self.index.postings for t in terms):
            return {}
        idfs = [
            bm25.idf(self.index.df(t), self.index.max_doc) for t in terms
        ]
        w = bm25.term_weight(bm25.float32_ordered_sum(np.array(idfs)), q.boost)
        docsets = [set(self.index.postings[t]) for t in set(terms)]
        cand = set.intersection(*docsets)
        out = {}
        for d in sorted(cand):
            if q.slop == 0:
                acc = np.array(self.index.postings[terms[0]][d][1], dtype=np.int64) - rels[0]
                for t, r in zip(terms[1:], rels[1:]):
                    acc = np.intersect1d(
                        acc, np.array(self.index.postings[t][d][1], dtype=np.int64) - r
                    )
                    if acc.size == 0:
                        break
                # ExactPhraseScorer: phrase start must be >= 0
                f = np.float32(np.count_nonzero(acc >= 0))
            else:
                from lucenenet_spark.functions.sloppy import sloppy_phrase_freq

                f = sloppy_phrase_freq(
                    [
                        np.array(self.index.postings[t][d][1], dtype=np.int64)
                        for t in terms
                    ],
                    q.slop,
                    offsets=list(rels),
                    term_keys=list(terms),
                )
            if f > 0:
                c = self._cache[int(self.index.norms[d])]
                out[d] = np.float32(w * f / (f + c))
        return out
