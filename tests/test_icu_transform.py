"""ICUTransformFilter role — fixtures ported from the reference's
TestICUTransformFilter.cs (basic IDs, compound IDs, custom rules with
ICU cursor/context semantics) plus the analyzer/builder integration.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.icu_transform import (
    get_transform,
    make_transform_analyzer,
    transform_from_rules,
)


# ---- TestICUTransformFilter.cs:34-45 TestBasicFunctionality ----

@pytest.mark.parametrize(
    "transform_id,text,expected",
    [
        ("Traditional-Simplified", "簡化字", "简化字"),
        ("Katakana-Hiragana", "ヒラガナ", "ひらがな"),
        ("Fullwidth-Halfwidth", "アルアノリウ", "ｱﾙｱﾉﾘｳ"),
        ("Any-Latin", "Αλφαβητικός Κατάλογος", "Alphabētikós Katálogos"),
        (
            "NFD; [:Nonspacing Mark:] Remove",
            "Alphabētikós Katálogos",
            "Alphabetikos Katalogos",
        ),
        ("Han-Latin", "中国", "zhōng guó"),
    ],
)
def test_basic_functionality(transform_id, text, expected):
    assert get_transform(transform_id)(text) == expected


# ---- TestICUTransformFilter.cs:47-57 custom rules ----

def test_custom_rules_cursor_semantics():
    """'a > b; b > c;' on 'abacadaba' -> 'bcbcbdbcb': replacement text
    is skipped by the cursor, so rule-1 output never feeds rule 2."""
    assert transform_from_rules("a > b; b > c;")("abacadaba") == "bcbcbdbcb"


def test_custom_rules_left_context():
    """'c { a > b; a > d;' on 'caa' -> 'cbd': the left context matches
    against the post-replacement buffer."""
    assert transform_from_rules("c { a > b; a > d;")("caa") == "cbd"


def test_custom_rules_surrogate_escape():
    # TestOptimizerSurrogate rule string parses and applies
    t = transform_from_rules("\\U00020087 > x;")
    assert t("\U00020087y") == "xy"


# ---- TestICUTransformFilter.cs:70-73 TestOptimizer2 (compound) ----

def test_compound_id_casefold():
    assert (
        get_transform("Traditional-Simplified; CaseFold")("ABCDE") == "abcde"
    )


def test_fullwidth_ascii_block():
    assert get_transform("Fullwidth-Halfwidth")("Ｈｅｌｌｏ　Ｗ１") == "Hello W1"


def test_fullwidth_voiced_katakana():
    assert get_transform("Fullwidth-Halfwidth")("ガパ") == "ｶﾞﾊﾟ"


def test_hiragana_katakana_roundtrip():
    assert get_transform("Hiragana-Katakana")("ひらがな") == "ヒラガナ"


def test_serbian_cyrillic_to_latin():
    assert get_transform("Any-Latin")("Љубљана је чист") == "Ljubljana je čist"


def test_unknown_id_raises():
    with pytest.raises(ValueError):
        get_transform("Klingon-Latin")


# ---- analyzer + builder integration ----

def test_transform_analyzer_tokens_and_positions():
    a = make_transform_analyzer("Any-Latin")
    toks = a("ο αλφαβητικός κατάλογος")
    assert toks == [("o", 0), ("alphabētikós", 1), ("katálogos", 2)]


def test_transform_analyzer_no_stop_filter():
    # 'the' survives: the reference transform chain has no stop filter
    a = make_transform_analyzer("NFD; [:Nonspacing Mark:] Remove")
    assert a("the café") == [("the", 0), ("cafe", 1)]


def test_corpus_spec_translit_exclusive():
    from lucenenet_spark.index.builder import CorpusSpec, build_index

    with pytest.raises(ValueError):
        build_index(None, None, CorpusSpec(translit="Any-Latin", stem=True))


def test_corpus_spec_translit_unknown_id_fails_driver_side():
    from lucenenet_spark.index.builder import CorpusSpec, build_index

    with pytest.raises(ValueError):
        build_index(None, None, CorpusSpec(translit="Klingon-Latin"))


def test_translit_index_end_to_end(spark):
    """Greek corpus indexed under CorpusSpec(translit='Any-Latin'):
    the Latin query term matches; the Greek surface form does not."""
    from pyspark.sql import functions as F

    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher
    from lucenenet_spark.sources.synthetic import EL_TEMPLATES

    rows = [(i, EL_TEMPLATES[i % len(EL_TEMPLATES)]) for i in range(16)]
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    spec = CorpusSpec(text_col="text", id_col="doc_id", translit="Any-Latin")
    s = IndexSearcher(build_index(spark, corpus, spec))
    hits = s.search(TermQuery(term="katálogos"), 10)
    assert hits, "transliterated term must match"
    assert not s.search(TermQuery(term="κατάλογος"), 10)
    # doc 0 contains 'κατάλογος' -> its docid must be among the hits
    assert 0 in {h.docid for h in hits}
