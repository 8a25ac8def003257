"""MultiPhraseQuery + RegexpQuery (reference tests mirrored:
src/Lucene.Net.Tests/Search/TestMultiPhraseQuery.cs basics)."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search.queries import (
    MultiPhraseQuery,
    PhraseQuery,
    RegexpQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def mp_searcher(spark):
    rows = [
        ("r", "a", "c", "blueberry pie is the best pie"),
        ("r", "b", "c", "blueberry strudel beats apple strudel"),
        ("r", "c", "c", "blue raspberry pie and blueberry pizza"),
        ("r", "d", "c", "piccadilly circus has no blueberry"),
        ("r", "e", "c", "blueberry pizza beats blueberry pie daily"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    idx = build_index(
        spark, df, CorpusSpec(order_cols=("repo", "path", "commit"))
    ).cache()
    return IndexSearcher(idx)


def test_singleton_slots_equal_plain_phrase(mp_searcher):
    s = mp_searcher
    mp = MultiPhraseQuery(slots=(("blueberry",), ("pie",)))
    ph = PhraseQuery(phrase_terms=("blueberry", "pie"))
    a = [(h.docid, np.float32(h.score)) for h in s.search(mp, 10)]
    b = [(h.docid, np.float32(h.score)) for h in s.search(ph, 10)]
    assert a == b and len(a) == 2


def test_alternatives_union_matches(mp_searcher):
    """TestMultiPhraseQuery: 'blueberry (pie|pizza)' matches docs with
    either continuation; freq counts all matching start positions."""
    s = mp_searcher
    mp = MultiPhraseQuery(slots=(("blueberry",), ("pie", "pizza")))
    hits = s.search(mp, 10)
    # docs 0 (pie), 2 (pizza), 4 (pizza AND pie -> freq 2, ranks first)
    assert {h.docid for h in hits} == {0, 2, 4}
    assert hits[0].docid == 4  # two phrase occurrences outrank one


def test_missing_alternative_is_ignored_but_absent_slot_kills(mp_searcher):
    s = mp_searcher
    # one alternative missing from the index: slot still matches via the other
    mp = MultiPhraseQuery(slots=(("blueberry",), ("pie", "zzznothere")))
    assert {h.docid for h in s.search(mp, 10)} == {0, 4}
    # a slot with NO indexed alternative matches nothing
    mp2 = MultiPhraseQuery(slots=(("blueberry",), ("zzznothere",)))
    assert s.search(mp2, 10) == []


def test_multi_phrase_sloppy(mp_searcher):
    s = mp_searcher
    # 'blue pie'~2: doc 2 has 'blue raspberry pie' (one gap)
    mp = MultiPhraseQuery(slots=(("blue",), ("pie", "pizza")), slop=2)
    assert 2 in {h.docid for h in s.search(mp, 10)}


def test_regexp_query_expands_and_scores(mp_searcher):
    s = mp_searcher
    q = RegexpQuery(pattern="blue(berry)?")
    # constant-score rewrite: docs containing 'blue' or 'blueberry'
    docids = {h.docid for h in s.search(q, 10)}
    assert docids == {0, 1, 2, 3, 4}
    # anchored full-match: 'raspberry' must NOT match '.*berry' partials
    q2 = RegexpQuery(pattern="berry")
    assert s.search(q2, 10) == []
