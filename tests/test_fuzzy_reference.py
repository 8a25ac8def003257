"""TestFuzzyQuery.cs fixture port (reference
src/Lucene.Net.Tests/Search/TestFuzzyQuery.cs:45-120 TestFuzziness):
prefix-length windows, maxExpansions truncation, closest-first order.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.search.queries import FuzzyQuery
from lucenenet_spark.search.searcher import IndexSearcher

WORDS = ["aaaaa", "aaaab", "aaabb", "aabbb", "abbbb", "bbbbb", "ddddd"]


@pytest.fixture(scope="module")
def fuzzy_searcher(spark):
    rows = [(i, w) for i, w in enumerate(WORDS)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(spark, docs, CorpusSpec(text_col="text", id_col="doc_id")).cache()
    return IndexSearcher(idx)


def _texts(searcher, hits):
    return [WORDS[h.docid] for h in hits]


def test_fuzziness_prefix_length_windows(fuzzy_searcher):
    # reference asserts 3 hits for prefixLength 0..3, then 2, then 1, 1
    expect = {0: 3, 1: 3, 2: 3, 3: 3, 4: 2, 5: 1, 6: 1}
    for p, n in expect.items():
        hits = fuzzy_searcher.search(
            FuzzyQuery(term="aaaaa", max_edits=2, prefix_length=p), 10
        )
        assert len(hits) == n, f"prefixLength={p}"
    # p=4 keeps exactly the two terms sharing 'aaaa'
    hits = fuzzy_searcher.search(
        FuzzyQuery(term="aaaaa", max_edits=2, prefix_length=4), 10
    )
    assert set(_texts(fuzzy_searcher, hits)) == {"aaaaa", "aaaab"}


def test_fuzziness_closest_first_and_max_expansions(fuzzy_searcher):
    hits = fuzzy_searcher.search(FuzzyQuery(term="bbbbb", max_edits=2), 10)
    assert _texts(fuzzy_searcher, hits) == ["bbbbb", "abbbb", "aabbb"]
    # reference: maxExpansions=2 -> "only 2 documents should match"
    hits = fuzzy_searcher.search(
        FuzzyQuery(term="bbbbb", max_edits=2, max_expansions=2), 10
    )
    assert _texts(fuzzy_searcher, hits) == ["bbbbb", "abbbb"]


def test_fuzziness_no_match(fuzzy_searcher):
    assert fuzzy_searcher.search(FuzzyQuery(term="xxxxx", max_edits=2), 10) == []
    # 'aaccc' is distance 3 from 'aaaaa' -> no hit at maxEdits 2
    assert fuzzy_searcher.search(FuzzyQuery(term="aaccc", max_edits=2), 10) == []
