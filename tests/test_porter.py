"""Porter stemmer + stemmed-analyzer option (reference
Analysis/En/PorterStemFilter.cs role). Fixture vocabulary = the worked
examples from Porter (1980)."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.analyzer import analyze, analyze_stemmed
from lucenenet_spark.analysis.porter import porter_stem

PAPER_CASES = {
    # step 1a/1b/1c
    "caresses": "caress", "ponies": "poni", "ties": "ti", "cats": "cat",
    "feed": "feed", "agreed": "agre", "plastered": "plaster", "bled": "bled",
    "motoring": "motor", "sing": "sing", "conflated": "conflat",
    "troubled": "troubl", "sized": "size", "hopping": "hop", "tanned": "tan",
    "falling": "fall", "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    # step 2
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "digitizer": "digit", "conformabli": "conform",
    "vileli": "vile", "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    # step 3
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good",
    # step 4
    "revival": "reviv", "allowance": "allow", "inference": "infer",
    "airliner": "airlin", "gyroscopic": "gyroscop", "adjustable": "adjust",
    "defensible": "defens", "irritant": "irrit", "replacement": "replac",
    "adjustment": "adjust", "dependent": "depend", "adoption": "adopt",
    "communism": "commun", "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect", "bowdlerize": "bowdler",
    # step 5
    "probate": "probat", "rate": "rate", "cease": "ceas",
    "controll": "control", "roll": "roll",
}


def test_porter_paper_vocabulary():
    for w, expect in PAPER_CASES.items():
        assert porter_stem(w) == expect, w


def test_analyze_stemmed_pipeline_order():
    # stop removal first (positions gap), then stemming
    got = analyze_stemmed("the running dogs are jumping")
    # 'the'(0) 'are'(3) are stopwords -> gaps; running->run, dogs->dog
    assert got == [("run", 1), ("dog", 2), ("jump", 4)]
    # unstemmed pipeline unchanged
    assert analyze("the running dogs")[0] == ("running", 1)


def test_analyze_cjk_bigrams():
    from lucenenet_spark.analysis.analyzer import analyze_cjk

    # pure CJK run -> overlapping bigrams at consecutive positions
    got = analyze_cjk("upstream 数据处理 pipeline")
    assert got == [
        ("upstream", 0), ("数据", 1), ("据处", 2), ("处理", 3), ("pipeline", 4)
    ]
    # single isolated CJK char emits itself; stopwords still gap
    got2 = analyze_cjk("the 工 system")
    assert got2 == [("工", 1), ("system", 2)]
    # hangul + ascii mix
    got3 = analyze_cjk("한국어 tokenizer")
    assert got3 == [("한국", 0), ("국어", 1), ("tokenizer", 2)]


def test_cjk_index_end_to_end(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        ("r", "a", "c", "分布式搜索引擎 based on spark"),
        ("r", "b", "c", "搜索 quality matters"),
        ("r", "c", "c", "nothing relevant"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, content string")
    idx = build_index(
        spark, df, CorpusSpec(order_cols=("repo", "path", "commit"), cjk=True)
    )
    s = IndexSearcher(idx)
    # bigram '搜索' appears in docs 0 and 1
    hits = s.search(TermQuery(term="搜索"), 10)
    assert {h.docid for h in hits} == {0, 1}
    import pytest as _pt

    with _pt.raises(ValueError):
        build_index(
            spark, df,
            CorpusSpec(order_cols=("repo", "path", "commit"), cjk=True, stem=True),
        ).docs.count()


def test_stemmed_index_matches_morphological_variants(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.parser import parse_query
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        ("r", "a", "c", "the runner was running quickly"),
        ("r", "b", "c", "she runs every morning"),
        ("r", "c", "c", "completely unrelated text here"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, content string")
    idx = build_index(
        spark, df, CorpusSpec(order_cols=("repo", "path", "commit"), stem=True)
    )
    s = IndexSearcher(idx)
    hits = s.search(parse_query("running", stem=True), 10)
    # 'running'->'run' matches doc a (running) and doc b (runs->run)
    assert {h.docid for h in hits} == {0, 1}
    # dictionary holds stems, not surface forms
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert "run" in terms and "running" not in terms
