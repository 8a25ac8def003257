"""TestWildcard.cs fixture port (reference
src/Lucene.Net.Tests/Search/TestWildcard.cs:160-225 TestAsterisk /
TestQuestionmark), plus the TestEscapes pattern semantics at the
compiler level (our analyzer never emits *,?,\\ inside terms, so the
escaped-literal corpus scenarios run against python_predicate)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery, WildcardQuery
from lucenenet_spark.search.searcher import IndexSearcher


def _searcher_over(spark, words):
    rows = [(i, w) for i, w in enumerate(words)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return IndexSearcher(
        build_index(spark, docs, CorpusSpec(text_col="text", id_col="doc_id")).cache()
    )


@pytest.fixture(scope="module")
def asterisk_searcher(spark):
    return _searcher_over(spark, ["metal", "metals"])


@pytest.fixture(scope="module")
def qmark_searcher(spark):
    return _searcher_over(spark, ["metal", "metals", "mxtals", "mxtxls"])


def test_asterisk(asterisk_searcher):
    s = asterisk_searcher
    cases = [
        (TermQuery(term="metal"), 1),
        (WildcardQuery(pattern="metal*"), 2),
        (WildcardQuery(pattern="m*tal"), 1),
        (WildcardQuery(pattern="m*tal*"), 2),
        (WildcardQuery(pattern="m*tals"), 1),
        (BooleanQuery.of((WildcardQuery(pattern="m*tals"), Occur.SHOULD)), 1),
        (BooleanQuery.of(
            (WildcardQuery(pattern="m*tal"), Occur.SHOULD),
            (WildcardQuery(pattern="m*tals"), Occur.SHOULD),
        ), 2),
        # queries do not auto-lowercase: uppercase pattern misses
        (WildcardQuery(pattern="M*tal*"), 0),
        (WildcardQuery(pattern="*tall"), 0),
        (WildcardQuery(pattern="*tal"), 1),
        (WildcardQuery(pattern="*tal*"), 2),
    ]
    for q, n in cases:
        assert len(s.search(q, 10)) == n, q


def test_questionmark(qmark_searcher):
    s = qmark_searcher
    cases = [
        (WildcardQuery(pattern="m?tal"), 1),
        (WildcardQuery(pattern="metal?"), 1),
        (WildcardQuery(pattern="metals?"), 0),
        (WildcardQuery(pattern="m?t?ls"), 3),
        (WildcardQuery(pattern="M?t?ls"), 0),
        # 'meta??' matches 'metals' not 'metal'
        (WildcardQuery(pattern="meta??"), 1),
    ]
    for q, n in cases:
        assert len(s.search(q, 10)) == n, q


def test_escapes_pattern_semantics():
    """TestEscapes.cs scenarios against the pattern compiler: the
    reference corpus holds literal *,?,\\ inside terms."""
    terms = ["foo*bar", "foo??bar", "fooCDbar", "fooSOMETHINGbar", "foo\\"]

    def matches(pattern):
        q = WildcardQuery(pattern=pattern)
        return [t for t in terms if q.python_predicate(t)]

    assert len(matches("foo*bar")) == 4          # unescaped * spans anything
    assert matches("foo\\*bar") == ["foo*bar"]   # escaped: literal * only
    assert len(matches("foo??bar")) == 2          # ?? = any two chars
    assert matches("foo\\?\\?bar") == ["foo??bar"]
    assert matches("foo\\") == ["foo\\"]          # trailing escape, lenient
