"""Surround query language (QueryParsers/Surround): grammar shapes,
distance mapping (nW/nN -> slop n-1), and search-path equivalences."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.search.spans import (
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucenenet_spark.search.surround import parse_surround, run_surround


def test_infix_distance_and_fold():
    q = parse_surround("table 3w hash")
    assert q == SpanNearQuery(
        (SpanTermQuery("table"), SpanTermQuery("hash")), slop=2, in_order=True
    )
    # same-op chain folds to one 3-clause near (the reference parser
    # collects same-operator lists the same way)
    q3 = parse_surround("table w hash w scan")
    assert len(q3.clauses) == 3 and q3.slop == 0 and q3.in_order
    # mixed ops nest
    qm = parse_surround("table w hash 4n scan")
    assert isinstance(qm.clauses[0], SpanNearQuery) and qm.slop == 3 and not qm.in_order


def test_prefix_forms_and_or_leaf():
    assert parse_surround("2n(table, hash)") == SpanNearQuery(
        (SpanTermQuery("table"), SpanTermQuery("hash")), slop=1, in_order=False
    )
    q = parse_surround("(merge OR sort) 2w hash")
    assert isinstance(q.clauses[0], SpanOrQuery)
    t = parse_surround("tab* 2w hash")
    assert isinstance(t.clauses[0], SpanMultiTermQuery)


def test_boolean_only():
    q = parse_surround("spark OR merge")
    assert isinstance(q, BooleanQuery)
    assert all(c.occur == Occur.SHOULD for c in q.clauses)
    q = parse_surround("spark AND merge NOT window")
    assert q.clauses[0].occur == Occur.MUST


def test_errors():
    with pytest.raises(NotImplementedError):
        parse_surround("(spark AND merge) 2w hash")
    with pytest.raises(ValueError):
        parse_surround("0w(a, b)")
    with pytest.raises(ValueError):
        parse_surround("a b")  # two adjacent terms, no operator


@pytest.fixture(scope="module")
def sr(spark):
    rows = [
        ("r", "a", "c", "table scan hash join"),
        ("r", "b", "c", "hash table merge"),
        ("r", "c", "c", "sort key hash"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    return IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit"))).cache()
    )


def test_run_surround_matches_direct_span(sr):
    from lucenenet_spark.search import spans as sp

    got = {
        (r.docid, r.n_spans)
        for r in run_surround(sr, "table 3w hash").collect()
    }
    want = {
        (r.docid, r.n_spans)
        for r in sp.span_query(
            sr,
            SpanNearQuery(
                (SpanTermQuery("table"), SpanTermQuery("hash")), slop=2, in_order=True
            ),
        ).collect()
    }
    assert got == want and got  # doc 0: table..hash within 3
    # boolean path returns scored rows identical to a direct search
    direct = sr.search_df(
        BooleanQuery.of(
            (TermQuery(term="hash"), Occur.MUST), (TermQuery(term="table"), Occur.MUST)
        ),
        5,
    ).collect()
    via = run_surround(sr, "hash AND table", 5).collect()
    assert [(r.docid, r.score) for r in via] == [(r.docid, r.score) for r in direct]
