"""Full UAX#29 ASCII Mid*-class word-break rules — verbatim port of
the reference ``TestStandardAnalyzer.cs:254-298`` (TestMid) fixtures,
plus the Armenian "4,600" MidNum fixture (``:52-54``), run against
``UAX29_TOKEN_PATTERN`` / ``analyze_uax29`` (CorpusSpec(uax29=True)).

The reference fixtures exercise the raw tokenizer (no lowercase/stop
filter), so the pattern-level tests assert findall() verbatim; the
pipeline- and index-level tests cover the lowercased stop-filtered
path and the oracle mirror.
"""

from __future__ import annotations

import re

import pytest

from lucenenet_spark.analysis.analyzer import (
    TOKEN_PATTERN,
    UAX29_TOKEN_PATTERN,
    analyze,
    analyze_uax29,
)

_RE = re.compile(UAX29_TOKEN_PATTERN)

# (input, expected tokens) — TestStandardAnalyzer.cs TestMid, verbatim
MID_FIXTURES = [
    # ':' is MidLetter: joins single, letters both sides
    ("A:B", ["A:B"]),
    ("A::B", ["A", "B"]),
    # '.' is MidNumLet: joins letters or digits
    ("1.2", ["1.2"]),
    ("A.B", ["A.B"]),
    ("1..2", ["1", "2"]),
    ("A..B", ["A", "B"]),
    # ',' is MidNum: digits both sides
    ("1,2", ["1,2"]),
    ("1,,2", ["1", "2"]),
    # mixed consecutive mid chars split
    ("A.:B", ["A", "B"]),
    ("A:.B", ["A", "B"]),
    ("1,.2", ["1", "2"]),
    ("1.,2", ["1", "2"]),
    # '_' is ExtendNumLet
    ("A:B_A:B", ["A:B_A:B"]),
    ("A:B_A::B", ["A:B_A", "B"]),
    ("1.2_1.2", ["1.2_1.2"]),
    ("A.B_A.B", ["A.B_A.B"]),
    ("1.2_1..2", ["1.2_1", "2"]),
    ("A.B_A..B", ["A.B_A", "B"]),
    ("1,2_1,2", ["1,2_1,2"]),
    ("1,2_1,,2", ["1,2_1", "2"]),
    ("C_A.:B", ["C_A", "B"]),
    ("C_A:.B", ["C_A", "B"]),
    ("3_1,.2", ["3_1", "2"]),
    ("3_1.,2", ["3_1", "2"]),
]


@pytest.mark.parametrize("text,want", MID_FIXTURES)
def test_mid_fixtures(text, want):
    assert _RE.findall(text) == want


def test_duckdb_re2_matches_python():
    """The exact pattern string tokenizes identically under DuckDB's
    RE2 — the property the SQL oracles rely on."""
    import duckdb

    from lucenenet_spark.analysis.analyzer import _sql_quote_regex

    pat = _sql_quote_regex(UAX29_TOKEN_PATTERN)
    for text, want in MID_FIXTURES + [
        ("4,600", ["4,600"]),
        ("don't", ["don't"]),
        ("127.0.0.1", ["127.0.0.1"]),
        ("O'Reilly's", ["O'Reilly's"]),
        ("1;2", ["1;2"]),  # ';' is MidNum too (Unicode 6.3)
    ]:
        got = duckdb.sql(
            "select regexp_extract_all('"
            + text.replace("'", "''")
            + f"', '{pat}')"
        ).fetchone()[0]
        assert got == want == _RE.findall(text), text


def test_armenian_midnum_fixture():
    """TestStandardAnalyzer.cs:52-54 (TestArmenian): '4,600' stays one
    token inside Armenian text — the script-extended UAX#29 variant."""
    text = (
        "Վիքիպեդիայի 13 միլիոն հոդվածները (4,600` հայերեն "
        "վիքիպեդիայում) գրվել են կամավորների կողմից"
    )
    toks = [t for t, _ in analyze_uax29(text)]
    assert "4,600" in toks
    assert "13" in toks
    assert "վիքիպեդիայի" in toks  # lowercased Armenian survives


def test_pipeline_semantics_match_default():
    """On Mid*-free text analyze_uax29 == analyze (same stop/length/
    position semantics)."""
    text = "The quick. brown fox_jumps over 127.0.0.1 don't stop"
    # note "quick." has no letter after the dot -> identical splits
    assert analyze_uax29(text) == analyze(text)


def test_divergence_classes():
    """The documented closures: colon and comma forms that the pinned
    default splits stay whole under uax29."""
    assert [t for t, _ in analyze_uax29("A:B 4,600")] == ["a:b", "4,600"]
    assert [t for t, _ in analyze("A:B 4,600")] == ["b", "4", "600"]
    # ("a" from the A:B split is an English stopword -> dropped, gap kept)
    assert [p for _, p in analyze("A:B 4,600")] == [1, 2, 3]


def test_uax29_index_build(spark):
    """CorpusSpec(uax29=True) end-to-end: the colon term is a real
    dictionary entry and BM25-searchable."""
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "price 4,600 for mrg:srt build"), (1, "plain words only here")],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id", uax29=True)
    ).cache()
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert "4,600" in terms and "mrg:srt" in terms
    s = IndexSearcher(idx)
    assert [h.docid for h in s.search(TermQuery(term="mrg:srt"), 5)] == [0]


def test_uax29_exclusive_with_other_flags(spark):
    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        build_index(
            spark,
            docs,
            CorpusSpec(text_col="text", id_col="doc_id", uax29=True, stem=True),
        )
