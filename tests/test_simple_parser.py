"""SimpleQueryParser port (QueryParser/Simple/SimpleQueryParser.cs):
lenient syntax, BuildQueryTree op-change nesting, NOT wrapper."""

from __future__ import annotations

import pytest

from lucenenet_spark.search.simple_parser import parse_simple
from lucenenet_spark.search.queries import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)


def occurs(q):
    return [c.occur for c in q.clauses]


def test_and_run_flattens():
    q = parse_simple("spark + merge + batch")
    assert isinstance(q, BooleanQuery) and len(q.clauses) == 3
    assert occurs(q) == [Occur.MUST] * 3


def test_op_change_nests_left():
    q = parse_simple("spark + merge | batch")
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    inner = q.clauses[0].query
    assert occurs(inner) == [Occur.MUST, Occur.MUST]
    assert [c.query.term for c in inner.clauses] == ["spark", "merge"]
    assert q.clauses[1].query == TermQuery(term="batch")


def test_default_operator_should_and_override():
    q = parse_simple("spark merge")
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    q2 = parse_simple("spark merge", default_operator=Occur.MUST)
    assert occurs(q2) == [Occur.MUST, Occur.MUST]


def test_not_wrapper_and_double_negation():
    q = parse_simple("-spark")
    assert occurs(q) == [Occur.MUST_NOT, Occur.SHOULD]
    assert isinstance(q.clauses[1].query, MatchAllDocsQuery)
    q2 = parse_simple("--spark")
    assert q2 == TermQuery(term="spark")


def test_phrase_slop_prefix_fuzzy():
    q = parse_simple('"table hash"~2')
    assert q == PhraseQuery(
        phrase_terms=("table", "hash"), term_positions=(0, 1), slop=2
    )
    assert parse_simple("fast*") == PrefixQuery(prefix="fast")
    assert parse_simple("merge~1") == FuzzyQuery(term="merge", max_edits=1)
    assert parse_simple("merge~") == FuzzyQuery(term="merge", max_edits=2)


def test_lenient_degradation():
    # never raises: unbalanced parens/quotes, stray operators, empties
    assert parse_simple("(((") == BooleanQuery()
    assert parse_simple("") == BooleanQuery()
    assert parse_simple(")spark(") == TermQuery(term="spark")
    assert parse_simple('"unterminated phrase').terms() == [
        "unterminated", "phrase"
    ]
    assert parse_simple("+ | -") == BooleanQuery()


def test_escape_makes_literal():
    # escaped specials join the token and flow through the analyzer
    q = parse_simple(r"spark\+merge")
    assert q.terms() == ["spark", "merge"]  # analyzer splits on '+'
    assert isinstance(q, PhraseQuery)


def test_stopword_clause_vanishes():
    # 'a' is a stopword: the clause disappears, the operator resets
    assert parse_simple("a + spark") == TermQuery(term="spark")


def test_engine_runs_parsed_shapes(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        ("r", "a", "c", "spark merge pipelines"),
        ("r", "b", "c", "spark batch jobs"),
        ("r", "c", "c", "batch only lines"),
        ("r", "d", "c", "nothing matching"),
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    s = IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit")))
    )
    got = {h.docid for h in s.search(parse_simple("spark + merge | batch"), 10)}
    assert got == {0, 1, 2}  # (spark AND merge)=doc0, batch=docs 1,2
    neg = {h.docid for h in s.search(parse_simple("spark -merge"), 10)}
    assert neg == {0, 1, 2, 3}  # SHOULD spark, SHOULD (NOT merge wrapper)
