"""Analyzer golden fixtures (FIXTURES.md §3) + Python↔DuckDB parity —
pins StandardAnalyzer-4.8-style semantics (StandardAnalyzer.cs:102-110,
StopAnalyzer.cs:52-55, DocInverterPerField.cs:133-198)."""

import duckdb
import pytest

from lucenenet_spark.analysis import (
    ENGLISH_STOP_WORDS,
    analyze,
    duckdb_token_sql,
)

GOLDEN = [
    ("The Quick-Brown fox", [("quick", 1), ("brown", 2), ("fox", 3)]),
    (
        "snake_case_id = camelCase.method(arg0)",
        [("snake_case_id", 0), ("camelcase", 1), ("method", 2), ("arg0", 3)],
    ),
    ("HTTP2 127.0.0.1 3.14", [("http2", 0), ("127.0.0.1", 1), ("3.14", 2)]),
    ("don't stop", [("don't", 0), ("stop", 1)]),
    ("a an and of to", []),
    ("x" * 256 + " kept", [("kept", 0)]),  # >255 chars dropped pre-position
    ("", []),
    ("return if class def", [("return", 0), ("class", 2), ("def", 3)]),  # 'if' stopped
]


@pytest.mark.parametrize("text,expected", GOLDEN)
def test_golden_tokens(text, expected):
    assert analyze(text) == expected


def test_stop_set_is_lucene_433():
    assert len(ENGLISH_STOP_WORDS) == 33
    assert "the" in ENGLISH_STOP_WORDS and "with" in ENGLISH_STOP_WORDS


def test_field_length_counts_survivors():
    assert len(analyze("a an and of to")) == 0
    assert len(analyze("the quick fox")) == 2


def test_duckdb_parity():
    con = duckdb.connect()
    rows = [(i, t) for i, (t, _) in enumerate(GOLDEN)]
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    sql = (
        "WITH tok AS ("
        + duckdb_token_sql(with_positions=True)
        + ") SELECT docid, term, pos FROM tok ORDER BY docid, pos"
    )
    got = {}
    for docid, term, pos in con.sql(sql).fetchall():
        got.setdefault(docid, []).append((term, pos))
    for i, (text, expected) in enumerate(GOLDEN):
        assert got.get(i, []) == expected, f"doc {i}: {text[:40]!r}"


def test_cjk_non_cjk_runs_match_base_analyzer():
    """ADVICE r2 regression (contract updated in r4): the mixed regex
    must tokenize non-CJK text with the SAME semantics as analyze().
    Since the r4 UAX#29 script extension both pipelines admit accented
    Latin / Cyrillic / etc. word runs — what matters is that they stay
    in lockstep (the reference CJKAnalyzer wraps the same
    StandardTokenizer DFA)."""
    from lucenenet_spark.analysis.analyzer import analyze, analyze_cjk

    for text in (
        "café naïve Ĳsselmeer москва tokyo42 don't 3.14",
        "café résumé ｶﾀ plain_ascii",
    ):
        non_cjk = [t for t, _ in analyze_cjk(text)]
        base = [t for t, _ in analyze(text)]
        # CJK text absent here -> token STREAMS must be identical
        assert non_cjk == base, text


def test_cjk_bigrams_with_ascii_mix():
    from lucenenet_spark.analysis.analyzer import analyze_cjk

    toks = [t for t, _ in analyze_cjk("spark引擎构建 fast")]
    assert toks == ["spark", "引擎", "擎构", "构建", "fast"]
