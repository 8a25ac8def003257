"""Span query family (SURVEY.md §2.9; reference ``Search/Spans/``).

Mirrors the *semantics* of SpanTermQuery (``SpanTermQuery.cs``),
N-clause ordered SpanNearQuery (``SpanNearQuery.cs:40``,
``NearSpansOrdered.cs``), SpanOrQuery (``SpanOrQuery.cs:37``),
SpanNotQuery (``SpanNotQuery.cs``), SpanFirstQuery
(``SpanFirstQuery.cs``) and SpanMultiTermQueryWrapper
(``SpanMultiTermQueryWrapper.cs``) — with a *pinned deterministic
span-count spec* (documented per node below) instead of the
reference's lazy iterator enumeration, so the result is
SQL-oracle-mirrorable.

Physical shape — the phrase scorer's: ONE packed scan filtered to all
involved terms (parquet ``term IN`` pushdown BEFORE the unpack
barrier), one ``groupBy(docid)`` positions shuffle, then a vectorized
per-doc span enumeration inside a pandas UDF. A doc's span math is
tiny (its own positions only); the distribution-heavy part — which
docs hold which terms — stays declarative. Output: ``(docid,
n_spans)`` for docs with >= 1 surviving span.

Pinned span spec (what ``n_spans`` counts):

- **SpanTerm t** — one unit span ``[p, p+1)`` per position.
- **SpanOr** — the multiset union of clause spans (sorted).
- **SpanNear ordered** — for each span of clause 1, the GREEDY chain:
  each next clause takes its minimal span starting at/after the
  previous clause's end. A chain with total gap
  ``(end_N - start_1) - Σ len_i <= slop`` yields ONE span
  ``[start_1, end_N)``. Greedy minimizes ``end_N`` over all in-order
  chains from that start, so "greedy chain fits" ⇔ "some chain fits"
  — each start is counted iff any valid chain exists (the per-start
  counting matches the two-term case shipped in round 2).
- **SpanNear unordered** — 2 clauses: one span per left-clause span
  paired with any right span within slop either side (exact match
  set). N clauses: the pinned EXISTS-window spec — one span per
  first-clause anchor for which some choice of one span per remaining
  clause (pairwise distinct) has total gap <= slop; emitted span =
  the feasible combination minimizing (width, lo, hi). The
  reference's NearSpansUnordered queue walk agrees on the match SET;
  span multiplicity around shared positions is iterator-order-defined
  there and per-anchor here (documented divergence).
- **SpanNot(include, exclude)** — include spans overlapping NO
  exclude span (overlap = ``e.start < s.end and e.end > s.start``).
- **SpanFirst(match, end)** — match spans with ``span.end <= end``.
- **SpanPositionRange(match, start, end)** — spans with
  ``start <= span.start`` and ``span.end <= end``.
- **SpanMulti(wrapped)** — SpanOr over the dictionary expansion of a
  MultiTermQuery (prefix/wildcard/fuzzy/regexp/range).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import MultiTermQuery


@dataclass(frozen=True)
class SpanQuery:
    def terms(self) -> list[str]:
        raise NotImplementedError


@dataclass(frozen=True)
class SpanTermQuery(SpanQuery):
    term: str = ""

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class SpanNearQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...] = ()
    slop: int = 0
    in_order: bool = True

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass(frozen=True)
class SpanOrQuery(SpanQuery):
    clauses: tuple[SpanQuery, ...] = ()

    def terms(self) -> list[str]:
        return [t for c in self.clauses for t in c.terms()]


@dataclass(frozen=True)
class SpanNotQuery(SpanQuery):
    include: SpanQuery = None  # type: ignore[assignment]
    exclude: SpanQuery = None  # type: ignore[assignment]

    def terms(self) -> list[str]:
        return self.include.terms() + self.exclude.terms()


@dataclass(frozen=True)
class SpanFirstQuery(SpanQuery):
    match: SpanQuery = None  # type: ignore[assignment]
    end: int = 0

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class SpanPositionRangeQuery(SpanQuery):
    """SpanPositionRangeQuery (``Search/Spans/SpanPositionRangeQuery.cs:33``):
    match spans entirely inside [start, end) — ``span.start >= start``
    and ``span.end <= end``. SpanFirstQuery is the start=0 special
    case (``SpanFirstQuery.cs:38`` extends this)."""

    match: SpanQuery = None  # type: ignore[assignment]
    start: int = 0
    end: int = 0

    def terms(self) -> list[str]:
        return self.match.terms()


@dataclass(frozen=True)
class SpanMultiTermQuery(SpanQuery):
    """SpanMultiTermQueryWrapper: expanded against the dictionary in
    :func:`span_query` (driver-side, like IndexSearcher._expand)."""

    wrapped: MultiTermQuery = None  # type: ignore[assignment]

    def terms(self) -> list[str]:  # unknown until expansion
        return []


# ------------------------------------------------------- enumeration

def _enumerate(q: SpanQuery, posmap: dict[str, np.ndarray]) -> np.ndarray:
    """Spans of ``q`` in one document -> int64 array [[start, end)...],
    sorted by (start, end). Positions arrays in ``posmap`` are sorted."""
    if isinstance(q, SpanTermQuery):
        p = posmap.get(q.term)
        if p is None or p.size == 0:
            return np.empty((0, 2), dtype=np.int64)
        return np.stack([p, p + 1], axis=1)
    if isinstance(q, SpanOrQuery):
        parts = [_enumerate(c, posmap) for c in q.clauses]
        parts = [s for s in parts if s.size]
        if not parts:
            return np.empty((0, 2), dtype=np.int64)
        allspans = np.concatenate(parts)
        order = np.lexsort((allspans[:, 1], allspans[:, 0]))
        return allspans[order]
    if isinstance(q, SpanNearQuery):
        subs = [_enumerate(c, posmap) for c in q.clauses]
        if any(s.size == 0 for s in subs):
            return np.empty((0, 2), dtype=np.int64)
        if not q.in_order:
            if len(subs) == 2:
                a, b = subs
                out = []
                for s0, e0 in a:
                    # any b-span within slop on either side, not identical
                    gap_after = b[:, 0] - e0  # b after a
                    gap_before = s0 - b[:, 1]  # b before a
                    ok = (
                        ((gap_after >= 0) & (gap_after <= q.slop))
                        | ((gap_before >= 0) & (gap_before <= q.slop))
                    ) & ~((b[:, 0] == s0) & (b[:, 1] == e0))
                    if ok.any():
                        bs, be = b[ok][0]
                        out.append((min(s0, bs), max(e0, be)))
                return _sorted_spans(out)
            # N-clause unordered, pinned EXISTS-window spec: one span
            # per FIRST-clause anchor span for which SOME choice of
            # one span per remaining clause (all pairwise distinct)
            # gives total gap (window width - Σ clause lengths)
            # <= slop — for unit spans: max(p) - min(p) - (N-1)
            # <= slop, the natural unordered-near membership test and
            # a direct EXISTS in the SQL oracle. The emitted span is
            # the feasible combination minimizing (width, lo, hi) —
            # deterministic. Exact search over the cartesian product
            # of the remaining clauses' spans: per-doc span counts
            # are document-local, so the product is tiny.
            from itertools import product

            first, rest = subs[0], subs[1:]
            out = []
            rest_lists = [list(map(tuple, sub)) for sub in rest]
            for s0, e0 in first:
                anchor = (int(s0), int(e0))
                best = None
                for combo in product(*rest_lists):
                    chosen = (anchor,) + combo
                    if len(set(chosen)) != len(chosen):
                        continue  # clauses must match distinct spans
                    lo = min(c[0] for c in chosen)
                    hi = max(c[1] for c in chosen)
                    lens = sum(c[1] - c[0] for c in chosen)
                    if (hi - lo) - lens <= q.slop:
                        key = (hi - lo, lo, hi)
                        if best is None or key < best:
                            best = key
                if best is not None:
                    out.append((best[1], best[2]))
            return _sorted_spans(out)
        # ordered: greedy minimal-END chain per first-clause span (for
        # unit-span clauses min-end == min-start, so this is exactly
        # the two-term per-start spec; for composite clauses min-end
        # maximizes feasibility of the remaining chain and is the
        # pinned deterministic choice)
        out = []
        for s0, e0 in subs[0]:
            cur_end = e0
            lens = e0 - s0
            ok = True
            for sub in subs[1:]:
                cand = sub[sub[:, 0] >= cur_end]
                if cand.size == 0:
                    ok = False
                    break
                j = int(np.argmin(cand[:, 1]))
                ns, ne = cand[j]
                lens += ne - ns
                cur_end = ne
            if ok and (cur_end - s0) - lens <= q.slop:
                out.append((s0, cur_end))
        return _sorted_spans(out)
    if isinstance(q, SpanNotQuery):
        inc = _enumerate(q.include, posmap)
        if inc.size == 0:
            return inc
        exc = _enumerate(q.exclude, posmap)
        if exc.size == 0:
            return inc
        keep = []
        for s, e in inc:
            if not np.any((exc[:, 0] < e) & (exc[:, 1] > s)):
                keep.append((s, e))
        return _sorted_spans(keep)
    if isinstance(q, SpanFirstQuery):
        sub = _enumerate(q.match, posmap)
        if sub.size == 0:
            return sub
        return sub[sub[:, 1] <= q.end]
    if isinstance(q, SpanPositionRangeQuery):
        sub = _enumerate(q.match, posmap)
        if sub.size == 0:
            return sub
        return sub[(sub[:, 0] >= q.start) & (sub[:, 1] <= q.end)]
    raise NotImplementedError(type(q).__name__)


def _sorted_spans(pairs: list[tuple[int, int]]) -> np.ndarray:
    if not pairs:
        return np.empty((0, 2), dtype=np.int64)
    arr = np.asarray(pairs, dtype=np.int64)
    order = np.lexsort((arr[:, 1], arr[:, 0]))
    return arr[order]


def _expand_multi(q: SpanQuery, searcher) -> SpanQuery:
    """Resolve SpanMultiTermQuery nodes against the term dictionary
    (the SpanMultiTermQueryWrapper rewrite)."""
    if isinstance(q, SpanMultiTermQuery):
        expanded = searcher._expand(q.wrapped.rewrite())
        from lucenenet_spark.search.queries import (
            BooleanQuery,
            ConstantScoreQuery,
            TermQuery,
        )

        inner = expanded.query if isinstance(expanded, ConstantScoreQuery) else expanded
        terms: list[str] = []
        if isinstance(inner, TermQuery):
            terms = [inner.term]
        elif isinstance(inner, BooleanQuery):
            terms = [
                c.query.term for c in inner.clauses if isinstance(c.query, TermQuery)
            ]
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in sorted(set(terms))))
    if isinstance(q, SpanNearQuery):
        return SpanNearQuery(
            tuple(_expand_multi(c, searcher) for c in q.clauses), q.slop, q.in_order
        )
    if isinstance(q, SpanOrQuery):
        return SpanOrQuery(tuple(_expand_multi(c, searcher) for c in q.clauses))
    if isinstance(q, SpanNotQuery):
        return SpanNotQuery(
            _expand_multi(q.include, searcher), _expand_multi(q.exclude, searcher)
        )
    if isinstance(q, SpanFirstQuery):
        return SpanFirstQuery(_expand_multi(q.match, searcher), q.end)
    if isinstance(q, SpanPositionRangeQuery):
        return SpanPositionRangeQuery(
            _expand_multi(q.match, searcher), q.start, q.end
        )
    return q


def _required_slots(q: SpanQuery) -> list[list[str]]:
    """Conjunctive docid-candidacy slots for ``q`` — a doc can only
    match if, for every slot, it contains >= 1 of the slot's terms.
    Always a SUPERSET certificate (SpanOr clauses are any-of; SpanNot
    excludes never shrink candidacy)."""
    if isinstance(q, SpanNearQuery) and len(q.clauses) > 1:
        return [sorted(set(c.terms())) for c in q.clauses]
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return _required_slots(q.match)
    if isinstance(q, SpanNotQuery):
        return _required_slots(q.include)
    return [sorted(set(q.terms()))]


def _bucket_span_eval(searcher, q: SpanQuery, scored: bool, wf: float):
    """Per-bucket block-grouped span evaluation — the phrase scorer's
    physical shape (``searcher._phrase_bucket_scored``): ONE packed
    scan filtered to the query's terms (parquet term-IN pushdown), ONE
    narrow shuffle of the still-compressed blocks keyed by the
    docid-disjoint bucket, then a single ``applyInPandas`` stage that
    decodes docids, intersects the required-slot candidacy, decodes
    POSITIONS only for blocks still holding a candidate (skip-list
    skipping), and enumerates spans per doc. No decoded-positions
    shuffle, no collect_list."""
    from lucenenet_spark.functions.varbyte import (
        decode_freqs,
        decode_positions_flat,
        delta_decode_docids,
        gather_ranges,
    )

    sim = searcher.sim
    all_terms = sorted(set(q.terms()))
    req = _required_slots(q)
    blocks = searcher.index.packed.where(F.col("term").isin(all_terms)).select(
        "term", "bucket", "block_id", "count",
        "docs_enc", "freqs_enc", "norms_enc", "positions_enc",
    )
    if scored:
        schema = "docid long, score float"
        empty = pd.DataFrame(
            {"docid": pd.array([], dtype="int64"),
             "score": pd.array([], dtype="float32")}
        )
    else:
        schema = "docid long, n_spans long"
        empty = pd.DataFrame(
            {"docid": pd.array([], dtype="int64"),
             "n_spans": pd.array([], dtype="int64")}
        )
    qq = q
    SHIFT = np.int64(1) << np.int64(32)

    def apply_fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["term", "block_id"])
        term_blocks: dict[str, list] = {}
        for term, de, fe, ne, pe in zip(
            pdf["term"], pdf["docs_enc"], pdf["freqs_enc"],
            pdf["norms_enc"], pdf["positions_enc"],
        ):
            term_blocks.setdefault(term, []).append(
                (delta_decode_docids(bytes(de)), fe, ne, pe)
            )
        cand = None
        for slot in req:
            arrs = [b[0] for t in slot if t in term_blocks
                    for b in term_blocks[t]]
            if not arrs:
                return empty
            sd = arrs[0] if len(arrs) == 1 else np.unique(np.concatenate(arrs))
            cand = sd if cand is None else np.intersect1d(
                cand, sd, assume_unique=True
            )
            if cand.size == 0:
                return empty
        glob: dict[str, list] = {t: [] for t in term_blocks}
        norms = np.zeros(cand.size, dtype=np.uint8)
        for term, blks in term_blocks.items():
            gl = glob[term]
            for d, fe, ne, pe in blks:
                lo = np.searchsorted(cand, d[0])
                hi = np.searchsorted(cand, d[-1], side="right")
                if lo == hi:
                    continue
                sub = cand[lo:hi]
                idx = np.searchsorted(d, sub)
                hit = d[idx] == sub
                if not hit.any():
                    continue
                # freqs ARE the per-doc position counts: one flat
                # vectorized prox decode + multi-range gather, no
                # per-doc numpy calls (the old per-doc cumsum walk was
                # the sf1 span bottleneck)
                f = decode_freqs(bytes(fe)).astype(np.int64)
                flat, starts = decode_positions_flat(bytes(pe), f)
                nb = np.frombuffer(bytes(ne), dtype=np.uint8)
                ci = np.flatnonzero(hit) + lo
                bi = idx[hit]
                norms[ci] = nb[bi]
                lens = f[bi]
                gl.append(
                    np.repeat(cand[ci] * SHIFT, lens)
                    + gather_ranges(flat, starts[bi], lens)
                )
        bases = cand * SHIFT
        unions: list[tuple[str, np.ndarray, np.ndarray, np.ndarray]] = []
        for t, arrs in glob.items():
            if not arrs:
                continue
            # blocks of one (term, bucket) from DIFFERENT segments
            # interleave docid ranges (a segment owns several
            # hash-placed docid ranges) — concatenation must be sorted
            u = arrs[0] if len(arrs) == 1 else np.sort(np.concatenate(arrs))
            unions.append(
                (t, u, np.searchsorted(u, bases),
                 np.searchsorted(u, bases + SHIFT))
            )
        # 2-term ordered fast walk (the phrase scorer's idiom): a
        # valid start p1 is one whose MINIMAL same-doc successor
        # p2 >= p1+1 satisfies p2 - p1 - 1 <= slop (greedy minimizes
        # the chain end, so "greedy fits" <=> "some chain fits" —
        # identical to _enumerate's per-start spec). One searchsorted
        # over the doc-encoded global position arrays replaces the
        # per-doc Python loop; n_spans = valid starts per doc.
        if (
            not scored
            and isinstance(qq, SpanNearQuery)
            and qq.in_order
            and len(qq.clauses) == 2
            and all(isinstance(c, SpanTermQuery) for c in qq.clauses)
        ):
            tu = {t: u for t, u, _, _ in unions}
            g1 = tu.get(qq.clauses[0].term)
            g2 = tu.get(qq.clauses[1].term)
            if g1 is None or g2 is None or g1.size == 0 or g2.size == 0:
                return empty
            nxt = np.searchsorted(g2, g1 + 1)
            ok = nxt < g2.size
            p2 = g2[np.minimum(nxt, g2.size - 1)]
            valid = (
                ok
                & ((p2 // SHIFT) == (g1 // SHIFT))
                & (p2 - g1 - 1 <= qq.slop)
            )
            if not valid.any():
                return empty
            vd, vc = np.unique(g1[valid] // SHIFT, return_counts=True)
            return pd.DataFrame(
                {"docid": vd.astype(np.int64), "n_spans": vc.astype(np.int64)}
            )

        docs_out: list[int] = []
        vals: list = []
        for j, doc in enumerate(cand):
            posmap = {}
            for t, u, los, his in unions:
                lo, hi = los[j], his[j]
                if lo < hi:
                    posmap[t] = u[lo:hi] - bases[j]
            spans = _enumerate(qq, posmap)
            n = len(spans)
            if n == 0:
                continue
            if scored:
                # SpanScorer.SetFreqCurrentDoc: float32 ordered sum of
                # 1/(1 + matchLength) over spans in enumeration order
                acc = np.float32(0.0)
                for s, e in spans:
                    acc = np.float32(
                        acc + np.float32(1.0) / np.float32(1 + (e - s))
                    )
                vals.append((acc, norms[j]))
            else:
                vals.append(n)
            docs_out.append(int(doc))
        if not docs_out:
            return empty
        if scored:
            freqs = np.array([v[0] for v in vals], dtype=np.float32)
            nrm = np.array([v[1] for v in vals], dtype=np.uint8)
            s = sim.score(freqs, nrm, np.float32(wf))
            return pd.DataFrame(
                {"docid": np.asarray(docs_out, dtype=np.int64),
                 "score": s.astype(np.float32)}
            )
        return pd.DataFrame(
            {"docid": np.asarray(docs_out, dtype=np.int64),
             "n_spans": np.asarray(vals, dtype=np.int64)}
        )

    return blocks.repartition(199, "bucket").groupBy("bucket").applyInPandas(
        lambda pdf: apply_fn(pdf), schema
    )


def span_query(searcher, q: SpanQuery) -> DataFrame:
    """Evaluate a span query -> (docid, n_spans), n_spans >= 1.

    Physical shape = the per-bucket block-grouped plan
    (:func:`_bucket_span_eval`): one packed scan with term-IN
    pushdown, one compressed-block shuffle, per-doc numpy span
    enumeration inside the bucket group."""
    q = _expand_multi(q, searcher)
    terms = sorted(set(q.terms()))
    if not terms:
        return _empty(searcher)
    return _bucket_span_eval(searcher, q, scored=False, wf=1.0)


def span_query_scored(searcher, q: SpanQuery, k: int | None = 10) -> DataFrame:
    """Scored span query — the SpanScorer/SpanWeight surface
    (``Search/Spans/SpanScorer.cs:48-76``): per doc,
    ``freq = Σ slopFactor(matchLength)`` over the enumerated spans
    with BM25's ``slopFactor(d) = 1/(1+d)`` and ``matchLength =
    end - start`` (SpanScorer.SetFreqCurrentDoc), accumulated in span
    order as a float32 ordered sum; weight = the similarity's
    multi-term form over the query's terms in sorted-unique order
    (pinned; the reference iterates its termContexts map). Score =
    ``sim.score(freq, norm, weight)`` — so a SpanNearQuery ranks like
    a proximity-weighted phrase. Output (docid, score) top-k.

    Physical shape = the per-bucket block-grouped plan
    (:func:`_bucket_span_eval`)."""
    q = _expand_multi(q, searcher)
    terms = sorted(set(q.terms()))
    if not terms:
        return searcher._empty()
    m = searcher._stats_map()
    if m is False:
        rows = searcher.index.term_stats.where(F.col("term").isin(terms)).collect()
        stats = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
    else:
        stats = {t: m[t] for t in terms if t in m}
    w = searcher.sim.weight_multi(
        [stats.get(t, (0, 0))[0] for t in terms], searcher.index.max_doc, 1.0
    )
    scored = _bucket_span_eval(searcher, q, scored=True, wf=float(w))
    out = scored.orderBy(F.col("score").desc(), F.col("docid").asc())
    return out.limit(k) if k is not None else out


def _empty(searcher) -> DataFrame:
    return searcher.index.docs.sparkSession.createDataFrame(
        [], "docid long, n_spans long"
    )
