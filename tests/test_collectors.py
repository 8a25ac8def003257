"""Collector layer: faceting, grouping, pagination, rescoring —
asserted against brute-force recomputation from the scored set."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.search import collectors as coll
from lucenenet_spark.search.queries import Occur, BooleanQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

Q = TermQuery(term="return")


@pytest.fixture(scope="module")
def searcher(spark_index):
    return IndexSearcher(spark_index)


@pytest.fixture(scope="module")
def scored(searcher):
    return {r["docid"]: r["score"] for r in searcher.scored_docs(Q).collect()}


def test_facet_counts(searcher, scored, spark_index):
    got = {r["lang"]: r["n_docs"] for r in coll.facet_counts(searcher, Q, "lang").collect()}
    docs = {r["docid"]: r["lang"] for r in spark_index.docs.select("docid", "lang").collect()}
    expect: dict[str, int] = {}
    for d in scored:
        expect[docs[d]] = expect.get(docs[d], 0) + 1
    assert got == expect


def test_grouped_topk(searcher, scored, spark_index):
    rows = coll.grouped_topk(searcher, Q, "repo", k_groups=5, k_per_group=2).collect()
    docs = {r["docid"]: r["repo"] for r in spark_index.docs.select("docid", "repo").collect()}
    # brute force
    by_grp: dict[str, list[tuple[float, int]]] = {}
    for d, s in scored.items():
        by_grp.setdefault(docs[d], []).append((-s, d))
    for v in by_grp.values():
        v.sort()
    order = sorted(by_grp, key=lambda g: by_grp[g][0])[:5]
    expect = []
    for gi, g in enumerate(order, 1):
        for di, (negs, d) in enumerate(by_grp[g][:2], 1):
            expect.append((g, gi, di, d))
    got = [(r["grp"], r["group_rank"], r["doc_rank"], r["docid"]) for r in rows]
    assert got == expect


def test_search_after_is_next_page(searcher):
    full = searcher.search(Q, 20)
    last10 = full[9]
    page2 = coll.search_after(searcher, Q, 10, last10.score, last10.docid).collect()
    assert [(r["docid"], r["score"]) for r in page2] == [
        (h.docid, h.score) for h in full[10:20]
    ]


def test_rescore_combines_float32(searcher, scored):
    second_q = TermQuery(term="value")
    second = {r["docid"]: r["score"] for r in searcher.scored_docs(second_q).collect()}
    rows = coll.rescore(searcher, Q, second_q, k_first=50, k_final=10,
                        weight_first=1.0, weight_second=2.0).collect()
    first_top = {h.docid: h.score for h in searcher.search(Q, 50)}
    for r in rows:
        s1 = np.float32(first_top[r["docid"]])
        s2 = np.float32(second.get(r["docid"], 0.0))
        expect = np.float32(np.float32(1.0) * s1 + np.float32(2.0) * s2)
        assert np.float32(r["score"]) == expect
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_total_hit_count(searcher, scored):
    assert coll.total_hit_count(searcher, Q) == len(scored)
    both = BooleanQuery.of(
        (TermQuery(term="return"), Occur.SHOULD), (TermQuery(term="value"), Occur.SHOULD)
    )
    assert coll.total_hit_count(searcher, both) >= len(scored)
