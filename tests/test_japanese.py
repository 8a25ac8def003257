"""Kuromoji-role Japanese segmentation (analysis/japanese.py) —
min-cost lattice over the pinned compact vocabulary (reference
``src/Lucene.Net.Analysis.Kuromoji/JapaneseTokenizer.cs``: Viterbi
over dictionary + unknown character-class edges).

Hand-checked segmentation fixtures pin the algorithm; the index-level
test drives CorpusSpec(ja=True) end-to-end; the recall test records
the measured bigram-vs-segmentation tradeoff (SURVEY §8l).
"""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.japanese import analyze_ja, segment_ja

# (input, expected segmentation) — hand-derived under the pinned cost
# model: constant cost per dictionary word (fewer words win), unknown
# runs strictly worse than any dictionary covering.
SEG_FIXTURES = [
    ("日本語の形態素解析を実行する",
     ["日本語", "の", "形態素", "解析", "を", "実行", "する"]),
    ("検索システムはデータを高速に処理する",
     ["検索", "システム", "は", "データ", "を", "高速", "に", "処理", "する"]),
    ("テーブルのハッシュ索引を構築した",
     ["テーブル", "の", "ハッシュ", "索引", "を", "構築", "した"]),
    ("東京大学で情報検索を研究する",
     ["東京", "大学", "で", "情報", "検索", "を", "研究", "する"]),
    # 日本語 (one word) preferred over 日本+語: constant per-word cost
    ("日本語", ["日本語"]),
    # unknown katakana tail: データ (vocab) + ベース (unknown run)
    ("データベース", ["データ", "ベース"]),
    # unknown hiragana between vocab words
    ("これはテストです", ["これ", "は", "テスト", "です"]),
    # pure unknown kanji run groups as one token
    ("麒麟", ["麒麟"]),
    ("", []),
]


@pytest.mark.parametrize("text,want", SEG_FIXTURES)
def test_segment_fixtures(text, want):
    assert segment_ja(text) == want


def test_mixed_text_pipeline():
    toks = [t for t, _ in analyze_ja("Spark で日本語の検索を実行します")]
    assert toks == ["spark", "で", "日本語", "の", "検索", "を", "実行", "します"]
    # positions sequential, gap-free (no stop filter)
    assert [p for _, p in analyze_ja("spark の検索")] == [0, 1, 2]


def test_segmentation_deterministic():
    from lucenenet_spark.sources.synthetic import JA_TEMPLATES

    for s in JA_TEMPLATES:
        assert analyze_ja(s) == analyze_ja(s)
        assert all(t for t, _ in analyze_ja(s))


def test_ja_index_end_to_end(spark):
    """CorpusSpec(ja=True): multi-char dictionary words are WHOLE
    dictionary terms and BM25-searchable."""
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "日本語の形態素解析を実行する"), (1, "データを保存する")],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id", ja=True)
    ).cache()
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert {"形態素", "解析", "実行", "データ", "保存"} <= terms
    s = IndexSearcher(idx)
    assert [h.docid for h in s.search(TermQuery(term="形態素"), 5)] == [0]


def test_bigram_vs_segmentation_recall(spark):
    """The measured tradeoff SURVEY §8l records: a user searching the
    word 検索 as ONE term gets a direct dictionary hit on the ja
    index; on the CJK bigram index the word exists only as the bigram
    検索 WHEN the two chars are adjacent — but cross-word bigrams
    (e.g. 報検 from 情報+検索) also match phrase-adjacent noise, and
    any 3+ char dictionary word (形態素) is NOT a term at all, only
    its bigrams 形態/態素 are."""
    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.createDataFrame(
        [(0, "形態素解析の検索"), (1, "情報検索の研究")],
        "doc_id long, text string",
    )
    ja_idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id", ja=True)
    ).cache()
    bi_idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id", cjk=True)
    ).cache()
    ja_terms = {r["term"] for r in ja_idx.term_stats.collect()}
    bi_terms = {r["term"] for r in bi_idx.term_stats.collect()}
    # the 3-char dictionary word exists ONLY on the ja index
    assert "形態素" in ja_terms and "形態素" not in bi_terms
    # the ja index has no cross-word noise bigrams
    assert "報検" in bi_terms and "報検" not in ja_terms
    # both can hit 検索, but on ja it is a real word with exact df=2
    ja_df = {r["term"]: r["df"] for r in ja_idx.term_stats.collect()}
    assert ja_df["検索"] == 2


def test_ja_exclusive_with_other_flags(spark):
    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_index(
            spark,
            docs,
            CorpusSpec(text_col="text", id_col="doc_id", ja=True, cjk=True),
        )
