"""SmartCn-role Chinese segmentation (analysis/chinese.py) — min-cost
word-DAG path over the pinned vocabulary (reference
``src/Lucene.Net.Analysis.SmartCn/HHMMSegmenter.cs`` shortest-path
segmentation). Hand-checked fixtures pin the algorithm; the
index-level test drives CorpusSpec(zh=True) end-to-end.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.chinese import analyze_zh, segment_zh

SEG_FIXTURES = [
    ("我们使用分布式系统处理大规模数据",
     ["我们", "使用", "分布式", "系统", "处理", "大规模", "数据"]),
    ("中文分词是信息检索的技术",
     ["中文", "分词", "是", "信息", "检索", "的", "技术"]),
    ("在北京大学研究机器学习",
     ["在", "北京", "大学", "研究", "机器", "学习"]),
    # 数据库 (one word) preferred over 数据+库: constant per-word cost
    ("数据库", ["数据库"]),
    # unknown kanji run groups as one token
    ("麒麟", ["麒麟"]),
    ("", []),
]


@pytest.mark.parametrize("text,want", SEG_FIXTURES)
def test_segment_fixtures(text, want):
    assert segment_zh(text) == want


def test_mixed_text_pipeline():
    toks = [t for t, _ in analyze_zh("Spark 引擎支持高速查询")]
    assert toks == ["spark", "引擎", "支持", "高速", "查询"]
    assert [p for _, p in analyze_zh("spark 的查询")] == [0, 1, 2]


def test_zh_index_end_to_end(spark):
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "中文分词是信息检索的技术"), (1, "数据库保存用户的信息")],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id", zh=True)
    ).cache()
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert {"分词", "检索", "数据库", "信息"} <= terms
    s = IndexSearcher(idx)
    assert [h.docid for h in s.search(TermQuery(term="检索"), 5)] == [0]
    # 信息 appears in both docs
    assert len(s.search(TermQuery(term="信息"), 5)) == 2


def test_zh_exclusive_with_other_flags(spark):
    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_index(
            spark,
            docs,
            CorpusSpec(text_col="text", id_col="doc_id", zh=True, ja=True),
        )
