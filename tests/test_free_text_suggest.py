"""FreeTextSuggester (Suggest/Analyzing/FreeTextSuggester.cs) and
SpanPositionRangeQuery — hand-computed oracles."""

from __future__ import annotations

import pytest

from lucenenet_spark.search.suggest import free_text_suggest


@pytest.fixture(scope="module")
def ft_docs(spark):
    rows = [
        (0, "open the door open the window open the door"),
        (1, "shut the door quickly"),
        (2, "open a window now"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_trigram_beats_backoff(ft_docs):
    # context 'open the', no prefix, grams=3
    # trigrams 'open the X': door x2, window x1; ctx 'open the' count 3
    out = free_text_suggest(ft_docs, ["open", "the"], "", 5, grams=3).collect()
    by_term = {r.term: (r.ord, r.score) for r in out}
    assert by_term["door"][0] == 3
    assert by_term["door"][1] == pytest.approx(2 / 3)
    assert by_term["window"][1] == pytest.approx(1 / 3)
    # ranked door first
    assert out[0].term == "door"


def test_backoff_order_and_alpha(ft_docs):
    # context 'shut the': trigram 'shut the door' x1 / ctx 1 -> door@3 = 1.0
    # bigram backoff adds 'the window' etc at alpha*bigram — but door
    # keeps its HIGHEST order score
    out = free_text_suggest(ft_docs, ["shut", "the"], "", 10, grams=3).collect()
    by_term = {r.term: (r.ord, r.score) for r in out}
    assert by_term["door"] == (3, 1.0)
    # 'window' never follows 'shut the'; backoff to bigram 'the window':
    # count 1 / ctx('the') 4, alpha 0.4
    assert by_term["window"][0] == 2
    assert by_term["window"][1] == pytest.approx(0.4 * (1 / 4))


def test_prefix_filter(ft_docs):
    out = free_text_suggest(ft_docs, ["open", "the"], "w", 5, grams=3).collect()
    assert [r.term for r in out] == ["window"]


def test_unigram_fallback_when_no_context(ft_docs):
    # unseen context backs off to unigram frequencies: alpha^2 * c/N
    out = free_text_suggest(ft_docs, ["zzz", "qqq"], "door", 5, grams=3).collect()
    assert len(out) == 1 and out[0].ord == 1
    n_tokens = 9 + 4 + 4
    assert out[0].score == pytest.approx(0.4 * 0.4 * (3 / n_tokens))


def test_span_position_range(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search import spans as sp
    from lucenenet_spark.search.searcher import IndexSearcher

    df = spark.createDataFrame(
        [("r", "a", "c", "alpha beta alpha gamma alpha")],
        "repo string, path string, commit string, content string",
    )
    s = IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit")))
    )
    # alpha at positions 0, 2, 4; range [1, 4) keeps only pos 2
    q = sp.SpanPositionRangeQuery(sp.SpanTermQuery("alpha"), start=1, end=3)
    rows = sp.span_query(s, q).collect()
    assert len(rows) == 1 and rows[0].n_spans == 1
