"""ComplexPhraseQueryParser port (QueryParser/ComplexPhrase/
ComplexPhraseQueryParser.cs): wildcard/fuzzy/group slots -> span
rewrite, verified against brute-force position scans."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search import spans as sp
from lucenenet_spark.search.complex_phrase import parse_complex_phrase
from lucenenet_spark.search.queries import FuzzyQuery, PrefixQuery
from lucenenet_spark.search.searcher import IndexSearcher

ROWS = [
    ("r", "a", "c", "table hash join wins"),
    ("r", "b", "c", "table hashing is different"),  # 'hashing' matches ha*
    ("r", "c", "c", "table scan then hash"),
    ("r", "d", "c", "fast merge table here"),
    ("r", "e", "c", "fast join table cluster"),
    ("r", "f", "c", "fast table merge nope"),
]


@pytest.fixture(scope="module")
def cs(spark):
    df = spark.createDataFrame(
        ROWS, "repo string, path string, commit string, content string"
    )
    return IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit")))
    )


def test_parse_shapes():
    q = parse_complex_phrase('"fast (merge join) par*"~2')
    assert isinstance(q, sp.SpanNearQuery) and q.slop == 2 and q.in_order
    assert isinstance(q.clauses[0], sp.SpanTermQuery)
    assert isinstance(q.clauses[1], sp.SpanOrQuery)
    assert isinstance(q.clauses[2], sp.SpanMultiTermQuery)
    assert isinstance(q.clauses[2].wrapped, PrefixQuery)
    f = parse_complex_phrase('"merge~1 table"')
    assert isinstance(f.clauses[0], sp.SpanMultiTermQuery)
    assert isinstance(f.clauses[0].wrapped, FuzzyQuery)


def test_negative_clause_rewrite():
    q = parse_complex_phrase('"table -hash scan"~1')
    assert isinstance(q, sp.SpanNotQuery)
    assert isinstance(q.include, sp.SpanNearQuery) and q.include.slop == 2
    assert len(q.include.clauses) == 2
    assert len(q.exclude.clauses) == 3 and q.exclude.slop == 1


def test_prefix_in_phrase(cs):
    got = {r.docid for r in sp.span_query(
        cs, parse_complex_phrase('"table ha*"')).collect()}
    assert got == {0, 1}  # 'table hash' and 'table hashing' adjacent


def test_group_slot(cs):
    q = parse_complex_phrase('"fast (merge join) table"')
    got = {r.docid for r in sp.span_query(cs, q).collect()}
    assert got == {3, 4}  # fast merge table / fast join table


def test_empty_expansion_matches_nothing(cs):
    # 'zzz*' expands to no dictionary terms -> the slot can never
    # match (the reference's dummy-term behavior)
    q = parse_complex_phrase('"table zzz*"')
    assert sp.span_query(cs, q).count() == 0


def test_all_stopword_phrase_is_none():
    assert parse_complex_phrase('"the a of"') is None
