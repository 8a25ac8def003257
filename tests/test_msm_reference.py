"""TestBooleanMinShouldMatch.cs fixture port (reference
src/Lucene.Net.Tests/Search/TestBooleanMinShouldMatch.cs:57-333): the
8-doc all/data corpus and its 13 deterministic minimumNumberShouldMatch
scenarios, single-field form ('all' joins the data tokens; queries use
the same tokens, and 'all' is not a stopword so counts carry over)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

DATA = ["A 1 2 3 4 5 6", "Z       4 5 6", None, "B   2   4 5 6",
        "Y     3   5 6", None, "C     3     6", "X       4 5 6"]


@pytest.fixture(scope="module")
def msm_searcher(spark):
    rows = [(i, ("all " + d) if d else "all") for i, d in enumerate(DATA)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(spark, docs, CorpusSpec(text_col="text", id_col="doc_id")).cache()
    return IndexSearcher(idx)


def bq(msm, *clauses):
    return BooleanQuery.of(*clauses, min_should_match=msm)


def T(t, occur):
    return (TermQuery(term=t), occur)


S, M, N = Occur.SHOULD, Occur.MUST, Occur.MUST_NOT

SCENARIOS = [
    # (name, expected hits, msm, clauses)
    ("all_optional", 2, 2, [T(str(i), S) for i in (1, 2, 3, 4)]),
    ("one_req_some_opt", 5, 2, [T("all", M), T("5", S), T("4", S), T("3", S)]),
    ("some_req_some_opt", 5, 2,
     [T("all", M), T("6", M), T("5", S), T("4", S), T("3", S)]),
    ("one_prohib_some_opt", 1, 2, [T("1", S), T("2", S), T("3", N), T("4", S)]),
    ("some_prohib_some_opt", 1, 2,
     [T("1", S), T("2", S), T("3", N), T("4", S), T("c", N)]),
    ("one_req_one_prohib_some_opt", 1, 3,
     [T("6", M), T("5", S), T("4", S), T("3", N), T("2", S), T("1", S)]),
    ("some_req_one_prohib_some_opt", 1, 3,
     [T("all", M), T("6", M), T("5", S), T("4", S), T("3", N), T("2", S), T("1", S)]),
    ("one_req_some_prohib_some_opt", 1, 3,
     [T("6", M), T("5", S), T("4", S), T("3", N), T("2", S), T("1", S), T("c", N)]),
    ("some_req_some_prohib_some_opt", 1, 3,
     [T("all", M), T("6", M), T("5", S), T("4", S), T("3", N), T("2", S), T("1", S), T("c", N)]),
    ("min_higher_than_num_optional", 0, 90,
     [T("all", M), T("6", M), T("5", S), T("4", S), T("3", N), T("2", S), T("1", S), T("c", N)]),
    ("min_equal_to_num_optional", 1, 2,
     [T("all", S), T("6", M), T("3", M), T("2", S)]),
    ("one_optional_equal_to_min", 1, 1, [T("all", M), T("3", S), T("2", M)]),
    ("no_optional_but_min", 0, 1, [T("all", M), T("2", M)]),
    ("no_optional_but_min2", 0, 1, [T("all", M)]),
]


@pytest.mark.parametrize("name,expected,msm,clauses",
                         SCENARIOS, ids=[s[0] for s in SCENARIOS])
def test_min_should_match_scenarios(msm_searcher, name, expected, msm, clauses):
    hits = msm_searcher.search(bq(msm, *clauses), 100)
    assert len(hits) == expected, name
