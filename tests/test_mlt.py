"""MoreLikeThis + CommonTermsQuery planner rules."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.search.mlt import (
    common_terms_query,
    doc_term_freqs,
    interesting_terms,
    more_like_this,
)
from lucenenet_spark.search.queries import Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def searcher(spark_index):
    return IndexSearcher(spark_index)


def test_doc_term_freqs_match_analyzer(searcher, corpus_rows):
    from lucenenet_spark.analysis.analyzer import analyze

    got = {r["term"]: r["freq"] for r in doc_term_freqs(searcher, 5).collect()}
    expect: dict[str, int] = {}
    for t, _p in analyze(corpus_rows[5]["content"]):
        expect[t] = expect.get(t, 0) + 1
    assert got == expect


def test_interesting_terms_ranked_and_thresholded(searcher):
    sel = interesting_terms(searcher, docid=5, max_query_terms=10, min_term_freq=2, min_doc_freq=3)
    n = searcher.index.max_doc
    scores = [s for (_, _, _, s) in sel]
    assert scores == sorted(scores, reverse=True)
    for t, tf, df, score in sel:
        assert tf >= 2 and df >= 3
        assert score == tf * (math.log(n / (df + 1)) + 1.0)
    assert len(sel) <= 10


def test_more_like_this_retrieves_source_doc(searcher):
    q = more_like_this(searcher, docid=5, min_term_freq=1, min_doc_freq=1)
    hits = searcher.search(q, 10)
    assert 5 in [h.docid for h in hits]  # a doc is most like itself


def test_common_terms_split(searcher):
    q = common_terms_query(
        searcher, ["return", "value", "x"], max_term_frequency=0.99,
        low_freq_occur=Occur.MUST,
    )
    # with a 0.99 cutoff everything is low-freq -> all MUST
    assert all(c.occur == Occur.MUST for c in q.clauses)
    q2 = common_terms_query(
        searcher, ["return", "value", "x"], max_term_frequency=0.0001,
        low_freq_occur=Occur.MUST,
    )
    # with a near-zero cutoff everything is high-freq -> all SHOULD
    assert all(c.occur == Occur.SHOULD for c in q2.clauses)
    assert all(isinstance(c.query, TermQuery) for c in q2.clauses)
