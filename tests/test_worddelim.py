"""WordDelimiterFilter fixtures lifted from the reference
``TestWordDelimiterFilter.cs`` (doSplit :128, TestSplits :141,
TestPossessives :191, TestPositionIncrements :233,
TestLotsOfConcatenating :287/:313) plus the oracle-mirrored
code-split chain's engine==SQL parity."""

from __future__ import annotations

import re

import pytest

from lucenenet_spark.analysis.worddelim import (
    CODE_SPLIT_RULES,
    WordDelimiterFlags,
    analyze_code,
    code_split,
    code_split_sql,
    word_delimiter_tokens,
)

SPLIT = WordDelimiterFlags()  # generate parts + split case/numerics + possessive


def terms(tok, flags=SPLIT, **kw):
    return [t for t, _ in word_delimiter_tokens(tok, flags, **kw)]


# ------------------------------------------------- TestSplits (ref :141-174)
@pytest.mark.parametrize(
    "token,expected",
    [
        ("basic-split", ["basic", "split"]),
        ("camelCase", ["camel", "Case"]),
        ("บ้าน", ["บ้าน"]),  # Thai NSM
        ("test's'", ["test"]),
        ("Роберт", ["Роберт"]),
        ("РобЕрт", ["Роб", "Ерт"]),
        ("aǅungla", ["aǅungla"]),  # composed titlecase
        ("test⃝", ["test⃝"]),  # enclosing mark
        ("हिन्दी", ["हिन्दी"]),  # virama
        ("١٢٣٤", ["١٢٣٤"]),  # non-ascii digits
        ("𠀀𠀀", ["𠀀𠀀"]),  # supplementary plane
        ("PowerShot", ["Power", "Shot"]),
        ("SD500", ["SD", "500"]),
        ("wi-fi", ["wi", "fi"]),
        ("USBPort", ["USBPort"]),  # UPPER->letter never splits
        ("O'Neil's", ["O", "Neil"]),
        ("//hello---there", ["hello", "there"]),
        ("500-42", ["500", "42"]),
    ],
)
def test_splits(token, expected):
    assert terms(token) == expected


# --------------------------------------------- TestPossessives (ref :191-196)
def test_possessive_stemmed():
    assert terms("ra's") == ["ra"]


def test_possessive_unstemmed():
    assert terms("ra's", WordDelimiterFlags(stem_english_possessive=False)) == [
        "ra",
        "s",
    ]


# ------------------------------------- TestLotsOfConcatenating (ref :287-341)
CAT = WordDelimiterFlags(catenate_words=True, catenate_numbers=True, catenate_all=True)


def test_concatenating():
    assert word_delimiter_tokens("abc-def-123-456", CAT) == [
        ("abc", 1),
        ("abcdef", 0),
        ("abcdef123456", 0),
        ("def", 1),
        ("123", 1),
        ("123456", 0),
        ("456", 1),
    ]


def test_concatenating_preserve_original():
    flags = WordDelimiterFlags(
        catenate_words=True,
        catenate_numbers=True,
        catenate_all=True,
        preserve_original=True,
    )
    assert word_delimiter_tokens("abc-def-123-456", flags) == [
        ("abc-def-123-456", 1),
        ("abc", 0),
        ("abcdef", 0),
        ("abcdef123456", 0),
        ("def", 1),
        ("123", 1),
        ("123456", 0),
        ("456", 1),
    ]


# -------------------------------------- TestPositionIncrements (ref :233-287)
CATALL = WordDelimiterFlags(catenate_all=True)


def test_posinc_case_split_with_catall():
    # "LUCENE / solR" -> sol(1) solR(0) R(1) for the solR token
    assert word_delimiter_tokens("solR", CATALL) == [
        ("sol", 1),
        ("solR", 0),
        ("R", 1),
    ]


def test_posinc_intra_word_delim_with_catall():
    # "lucene.solr" -> lucene(1) lucenesolr(0) solr(1)
    assert word_delimiter_tokens("lucene.solr", CATALL) == [
        ("lucene", 1),
        ("lucenesolr", 0),
        ("solr", 1),
    ]


def test_protected_word_passes_through():
    assert word_delimiter_tokens("NUTCH", CATALL, protected=frozenset({"NUTCH"})) == [
        ("NUTCH", 1)
    ]


def test_plain_word_passes_through():
    assert word_delimiter_tokens("SOLR", CATALL) == [("SOLR", 1)]
    assert word_delimiter_tokens("LUCENE", CATALL) == [("LUCENE", 1)]


def test_all_delim_token_vanishes():
    assert word_delimiter_tokens("/", CATALL) == []
    assert word_delimiter_tokens("---", WordDelimiterFlags(preserve_original=True)) == [
        ("---", 1)
    ]


def test_incoming_increment_carried():
    assert word_delimiter_tokens("solR", CATALL, pos_inc_in=11) == [
        ("sol", 11),
        ("solR", 0),
        ("R", 1),
    ]


# -------------------------------------------------- code-split chain (pinned)
def test_code_split_boundaries():
    assert code_split("getUserName_42") == "get User Name 42"
    assert code_split("parseHTTPResponse") == "parse HTTPResponse"
    assert code_split("v2Parser") == "v 2 Parser"


def test_analyze_code_terms():
    assert [t for t, _ in analyze_code("getUserName_42 snake_case_id")] == [
        "get",
        "user",
        "name",
        "42",
        "snake",
        "case",
        "id",
    ]


def test_code_split_sql_matches_python():
    duckdb = pytest.importorskip("duckdb")
    samples = [
        "getUserName_42",
        "parseHTTPResponse readFile2Buffer",
        "SimpleHTTPServer v2Parser __init__ a_b_c",
        "MixedCASEWords camelCase snake_case99",
    ]
    con = duckdb.connect()
    expr = code_split_sql("t")
    for s in samples:
        (got,) = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [s]).fetchone()
        assert got == code_split(s), s


def test_code_split_spark_rules_are_java_compatible():
    # the chain's patterns use no Python-only syntax; compiling under
    # `re` with ASCII classes == Java/RE2 semantics for these patterns
    for pat, _ in CODE_SPLIT_RULES:
        re.compile(pat)
