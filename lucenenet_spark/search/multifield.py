"""Cross-field search — MultiFieldQueryParser / per-field Weight
semantics (reference
``src/Lucene.Net.QueryParser/Classic/MultiFieldQueryParser.cs:38-118``;
per-field stats freeze as in ``Search/TermQuery.cs:188``).

Every leaf (term/phrase) scores against ONE field's index with that
field's df/avgdl/norms; composites fold per-clause frames with the
same float32 combiners the single-field engine uses
(searcher.py::combine_boolean_frames / combine_dismax_frames), so
scores stay bit-reproducible and partition-count invariant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.index.multifield import MultiFieldIndex
from lucenenet_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    Occur,
    PhraseQuery,
    Query,
    TermQuery,
)
from lucenenet_spark.search.searcher import (
    IndexSearcher,
    combine_boolean_frames,
    combine_dismax_frames,
)


class MultiFieldSearcher:
    """Routes fielded query nodes to per-field :class:`IndexSearcher`
    instances and combines across fields."""

    def __init__(
        self,
        index: MultiFieldIndex,
        similarity_by_field: dict | None = None,
        **searcher_kwargs,
    ):
        """``similarity_by_field`` maps field name -> Similarity
        instance, overriding the shared ``similarity=`` kwarg for
        that field — the PerFieldSimilarityWrapper extension point
        (reference ``Search/Similarities/PerFieldSimilarityWrapper.cs:30``:
        ``Get(field)`` picks the per-field SimWeight/SimScorer; here
        each field's IndexSearcher owns its Similarity, and the
        cross-field float32 combiners are similarity-agnostic)."""
        self.index = index
        self.searchers = {}
        for name, idx in index.fields.items():
            kw = dict(searcher_kwargs)
            if similarity_by_field and name in similarity_by_field:
                kw["similarity"] = similarity_by_field[name]
            self.searchers[name] = IndexSearcher(idx, **kw)

    def _field_of(self, q: Query) -> str:
        f = getattr(q, "field", None) or self.index.default_field
        if f not in self.searchers:
            raise KeyError(f"unknown field {f!r}; have {list(self.searchers)}")
        return f

    def _leaf_scored(self, q: Query) -> DataFrame | None:
        """Compile a (possibly fielded) leaf/simple query on its
        field's searcher; None for a provably-empty result."""
        s = self.searchers[self._field_of(q)]
        expanded = s._expand(q.rewrite())
        stats = s._collect_stats(expanded)
        return s._compile(expanded, stats, top_k=None)

    def scored_docs(self, query: Query) -> DataFrame:
        s0 = self.searchers[self.index.default_field]
        if isinstance(query, BooleanQuery):
            frames = []
            neg_frames = []
            must = [c for c in query.clauses if c.occur == Occur.MUST]
            should = [c for c in query.clauses if c.occur == Occur.SHOULD]
            if not must and not should:
                return s0._empty()
            for cidx, c in enumerate(query.clauses):
                sub = self._leaf_scored(c.query)
                if c.occur == Occur.MUST_NOT:
                    if sub is not None:
                        neg_frames.append(sub.select("docid"))
                    continue
                kind = 1 if c.occur == Occur.MUST else 0
                if sub is None:
                    if kind:
                        return s0._empty()
                    continue
                frames.append(
                    sub.select(
                        "docid",
                        F.lit(cidx).alias("cidx"),
                        F.lit(kind).alias("kind"),
                        "score",
                    )
                )
            if not frames:
                return s0._empty()
            pos = frames[0]
            for fdf in frames[1:]:
                pos = pos.unionByName(fdf)
            required_should = max(
                query.minimum_number_should_match, 0 if must else 1
            )
            scored = combine_boolean_frames(pos, len(must), required_should, query.boost)
            for neg in neg_frames:
                scored = scored.join(neg.distinct(), "docid", "left_anti")
            return scored
        if isinstance(query, DisjunctionMaxQuery):
            frames = []
            for cidx, d in enumerate(query.disjuncts):
                sub = self._leaf_scored(d)
                if sub is not None:
                    frames.append(
                        sub.select("docid", F.lit(cidx).alias("cidx"), "score")
                    )
            if not frames:
                return s0._empty()
            pos = frames[0]
            for fdf in frames[1:]:
                pos = pos.unionByName(fdf)
            return combine_dismax_frames(pos, query.tie_breaker, query.boost)
        scored = self._leaf_scored(query)
        return scored if scored is not None else s0._empty()

    def search_df(self, query: Query, k: int | None = 10) -> DataFrame:
        out = self.scored_docs(query).orderBy(
            F.col("score").desc(), F.col("docid").asc()
        )
        return out.limit(k) if k is not None else out

    def explain(self, query: Query, docid: int) -> dict:
        """Cross-field Explain: each leaf explains on ITS field's
        searcher (that field's df/avgdl/norms/similarity); boolean and
        dismax nodes fold child values with exactly the float32 rules
        ``scored_docs`` executes (combine_boolean_frames /
        combine_dismax_frames), so the root value is bit-identical to
        the doc's ``search_df`` score."""
        import numpy as np

        if isinstance(query, BooleanQuery):
            kids, acc = [], np.float32(0.0)
            ok, n_should = True, 0
            for c in query.clauses:
                kn = self.explain(c.query, docid)
                kn["occur"] = c.occur.value
                kids.append(kn)
                if c.occur == Occur.MUST_NOT:
                    if kn["match"]:
                        ok = False
                    continue
                if c.occur == Occur.MUST and not kn["match"]:
                    ok = False
                if kn["match"]:
                    if c.occur == Occur.SHOULD:
                        n_should += 1
                    acc = np.float32(acc + np.float32(kn["value"]))
            must = [c for c in query.clauses if c.occur == Occur.MUST]
            required_should = max(
                query.minimum_number_should_match, 0 if must else 1
            )
            match = ok and n_should >= required_should
            val = float(np.float32(acc * np.float32(query.boost))) if match else 0.0
            return {"type": "boolean", "match": match, "value": val, "clauses": kids}
        if isinstance(query, DisjunctionMaxQuery):
            kids = [self.explain(d, docid) for d in query.disjuncts]
            matched = [k for k in kids if k["match"]]
            if not matched:
                return {"type": "dismax", "match": False, "value": 0.0,
                        "clauses": kids}
            mx, acc = np.float32(0.0), np.float32(0.0)
            for k in matched:
                s = np.float32(k["value"])
                acc = np.float32(acc + s)
                if s > mx:
                    mx = s
            val = np.float32(
                (mx + np.float32(acc - mx) * np.float32(query.tie_breaker))
                * np.float32(query.boost)
            )
            return {"type": "dismax", "match": True, "value": float(val),
                    "tie_breaker": query.tie_breaker, "clauses": kids}
        out = self.searchers[self._field_of(query)].explain(query, docid)
        out["field"] = self._field_of(query)
        return out

    def dismax_all_fields(
        self,
        query: Query,
        tie_breaker: float = 0.0,
        boosts: dict[str, float] | None = None,
        k: int | None = 10,
    ) -> DataFrame:
        """MultiFieldQueryParser.Parse(q, fields, boosts): apply an
        unfielded query to EVERY field and DisMax-combine — the
        standard 'search title and body, best field wins' shape.
        Disjunct order (= float32 fold order) is the index's declared
        field order."""
        import dataclasses

        disjuncts = []
        for name in self.index.field_order:
            boost = (boosts or {}).get(name, 1.0)
            q = dataclasses.replace(query, field=name, boost=query.boost * boost)
            disjuncts.append(q)
        dq = DisjunctionMaxQuery(disjuncts=tuple(disjuncts), tie_breaker=tie_breaker)
        return self.search_df(dq, k)
