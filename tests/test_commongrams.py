"""CommonGramsFilter / CommonGramsQueryFilter (Analysis/CommonGrams):
bigram overlap terms, norms discount, query rewrite equivalence."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.commongrams import (
    analyze_common_grams,
    common_grams_query_terms,
)
from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search.queries import PhraseQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


def test_analyze_common_grams():
    got = analyze_common_grams("hash the batch runs")
    assert got == [
        ("hash", 0, False),
        ("hash_the", 0, True),
        ("the_batch", 1, True),
        ("batch", 2, False),
        ("runs", 3, False),
    ]
    # no common word adjacent -> no bigrams
    assert analyze_common_grams("hash batch") == [
        ("hash", 0, False), ("batch", 1, False)
    ]


def test_query_filter_covers_pairs():
    assert common_grams_query_terms("hash the batch") == [
        ("hash_the", 0), ("the_batch", 1)
    ]
    assert common_grams_query_terms("hash batch") == [("hash", 0), ("batch", 1)]


@pytest.fixture(scope="module")
def cg(spark):
    rows = [
        ("r", "a", "c", "hash the batch runs fine"),
        ("r", "b", "c", "the batch is late"),
        ("r", "c", "c", "hash batch no stopword"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    return IndexSearcher(
        build_index(
            spark, df, CorpusSpec(order_cols=("repo", "path", "commit"), common_grams=True)
        ).cache()
    )


def test_bigram_term_lookup(cg):
    hits = cg.search(TermQuery(term="the_batch"), 10)
    assert sorted(h.docid for h in hits) == [0, 1]


def test_norms_discount_overlaps(cg):
    # doc 0 'hash the batch runs fine': 4 non-stop unigrams
    assert cg.index.docs.where("docid = 0").first().field_length == 4


def test_phrase_over_bigram_slots(cg):
    pairs = common_grams_query_terms("hash the batch")
    q = PhraseQuery(
        phrase_terms=tuple(t for t, _ in pairs),
        term_positions=tuple(p for _, p in pairs),
    )
    hits = cg.search(q, 10)
    assert [h.docid for h in hits] == [0]
