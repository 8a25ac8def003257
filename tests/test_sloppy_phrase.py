"""Sloppy phrase (slop>0): unit tests of the shared matcher + Spark vs
oracle identity."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.functions.sloppy import sloppy_phrase_freq
from lucenenet_spark.oracle import OracleSearcher
from lucenenet_spark.search.parser import parse_query
from lucenenet_spark.search.queries import PhraseQuery
from lucenenet_spark.search.searcher import IndexSearcher


def f(lists, slop):
    return float(sloppy_phrase_freq([np.array(x) for x in lists], slop))


def test_matcher_exact_adjacency():
    # "a b" at offsets: a@[0], b@[1] -> offset-adjusted both 0 -> L=0
    assert f([[0], [0]], 0) == 1.0
    assert f([[0], [0]], 2) == 1.0


def test_matcher_slop_distance_weighting():
    # one gap: L=1 -> 1/2
    assert f([[0], [1]], 1) == 0.5
    # L=2 within slop 2 -> 1/3
    assert f([[0], [2]], 2) == pytest.approx(1 / 3)
    # out of slop -> no match
    assert f([[0], [3]], 2) == 0.0


def test_matcher_multiple_nonoverlapping_matches():
    # two exact matches -> 2.0
    assert f([[0, 10], [0, 10]], 0) == 2.0
    # one exact + one at distance 1 with slop 1 -> 1 + 0.5
    assert f([[0, 10], [0, 11]], 1) == 1.5


def test_matcher_three_terms():
    # window [0,0,0] exact
    assert f([[0], [0], [0]], 0) == 1.0
    # spread window max-min = 2
    assert f([[0], [1], [2]], 2) == pytest.approx(1 / 3)
    assert f([[0], [1], [2]], 1) == 0.0


def test_sloppy_rank_and_score_identical_to_oracle(spark_index, oracle_index):
    spark_s = IndexSearcher(spark_index)
    oracle_s = OracleSearcher(oracle_index)
    for slop in (1, 2, 4):
        q = PhraseQuery(phrase_terms=("return", "value"), slop=slop)
        got = [(h.docid, h.score) for h in spark_s.search(q, 10)]
        expect = [(d, float(s)) for d, s in oracle_s.search(q, 10)]
        assert got == expect, f"slop={slop}"
        assert got, f"slop={slop} found no hits"


def test_sloppy_superset_of_exact(spark_index):
    s = IndexSearcher(spark_index)
    exact_ids = {h.docid for h in s.search(PhraseQuery(phrase_terms=("return", "value")), 200)}
    sloppy_ids = {
        h.docid
        for h in s.search(PhraseQuery(phrase_terms=("return", "value"), slop=3), 200)
    }
    assert exact_ids <= sloppy_ids


def test_parser_wires_slop(spark_index):
    q = parse_query('"return value"~2').rewrite()
    assert isinstance(q, PhraseQuery)
    assert q.slop == 2
