"""XML query parser (QueryParsers/Xml/CoreParser.cs) — parse trees
must equal the hand-built AST, and parsed queries must score
identically to their programmatic twins (the reference's
TestParser.cs dumpResults assertions)."""

from __future__ import annotations

import pytest

from lucenenet_spark.search.queries import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    TermQuery,
    TermRangeQuery,
)
from lucenenet_spark.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
)
from lucenenet_spark.search.xmlparser import parse_xml_query


def test_term_query():
    q = parse_xml_query('<TermQuery fieldName="contents" boost="2.5">Bank</TermQuery>')
    assert q == TermQuery(term="bank", field="contents", boost=2.5)


def test_boolean_query_reference_fixture():
    # the reference's Xml/BooleanQuery.xml shape
    q = parse_xml_query(
        """<BooleanQuery fieldName="contents">
             <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
             <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
             <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
           </BooleanQuery>"""
    )
    assert q == BooleanQuery.of(
        (TermQuery(term="merger"), Occur.SHOULD),
        (TermQuery(term="sumitomo"), Occur.MUST_NOT),
        (TermQuery(term="bank"), Occur.MUST),
    )


def test_terms_query_analyzes():
    q = parse_xml_query(
        '<TermsQuery fieldName="c" minimumNumberShouldMatch="2">The Merge, Sort!</TermsQuery>'
    )
    # 'the' is a stopword; punctuation split by the analyzer
    assert q == BooleanQuery.of(
        (TermQuery(term="merge"), Occur.SHOULD),
        (TermQuery(term="sort"), Occur.SHOULD),
        min_should_match=2,
    )


def test_dismax_and_nesting():
    q = parse_xml_query(
        """<DisjunctionMaxQuery tieBreaker="0.1">
             <TermQuery>merge</TermQuery>
             <BooleanQuery><Clause occurs="must"><TermQuery>sort</TermQuery></Clause></BooleanQuery>
           </DisjunctionMaxQuery>"""
    )
    assert isinstance(q, DisjunctionMaxQuery)
    assert q.tie_breaker == pytest.approx(0.1)
    assert q.disjuncts[0] == TermQuery(term="merge")


def test_constant_score_range_filter():
    q = parse_xml_query(
        """<ConstantScoreQuery boost="3.0">
             <RangeFilter fieldName="date" lowerTerm="a" upperTerm="c" includeUpper="false"/>
           </ConstantScoreQuery>"""
    )
    assert q == ConstantScoreQuery(
        boost=3.0,
        query=TermRangeQuery(lower="a", upper="c", include_upper=False),
    )


def test_match_all_and_user_query():
    assert parse_xml_query("<MatchAllDocsQuery/>") == MatchAllDocsQuery()
    q = parse_xml_query("<UserQuery>merge AND sort</UserQuery>")
    assert isinstance(q, BooleanQuery)


def test_span_tree_reference_fixture():
    q = parse_xml_query(
        """<SpanNear slop="8" inOrder="false">
             <SpanOr><SpanTerm>killed</SpanTerm><SpanTerm>died</SpanTerm></SpanOr>
             <SpanOrTerms>miner miners</SpanOrTerms>
           </SpanNear>"""
    )
    assert q == SpanNearQuery(
        clauses=(
            SpanOrQuery(clauses=(SpanTermQuery(term="killed"), SpanTermQuery(term="died"))),
            SpanOrQuery(clauses=(SpanTermQuery(term="miner"), SpanTermQuery(term="miners"))),
        ),
        slop=8,
        in_order=False,
    )


def test_span_not_and_first():
    q = parse_xml_query(
        """<SpanNot>
             <Include><SpanNear slop="1" inOrder="true">
               <SpanTerm>table</SpanTerm><SpanTerm>hash</SpanTerm></SpanNear></Include>
             <Exclude><SpanTerm>merge</SpanTerm></Exclude>
           </SpanNot>"""
    )
    assert q == SpanNotQuery(
        include=SpanNearQuery(
            clauses=(SpanTermQuery(term="table"), SpanTermQuery(term="hash")),
            slop=1, in_order=True,
        ),
        exclude=SpanTermQuery(term="merge"),
    )
    q = parse_xml_query('<SpanFirst end="5"><SpanTerm>key</SpanTerm></SpanFirst>')
    assert q == SpanFirstQuery(match=SpanTermQuery(term="key"), end=5)


def test_unknown_element_raises():
    with pytest.raises(ValueError, match="no builder"):
        parse_xml_query("<FuzzyLikeThisQuery>x</FuzzyLikeThisQuery>")
    with pytest.raises(ValueError, match="slop"):
        parse_xml_query("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>")


def test_parsed_equals_programmatic_scores(spark_index):
    """Parsed XML and the hand-built AST produce bit-identical results."""
    from lucenenet_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark_index)
    xml = """<BooleanQuery>
               <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
               <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
               <Clause occurs="mustnot"><TermQuery>data0</TermQuery></Clause>
             </BooleanQuery>"""
    want = BooleanQuery.of(
        (TermQuery(term="table"), Occur.MUST),
        (TermQuery(term="merge"), Occur.SHOULD),
        (TermQuery(term="data0"), Occur.MUST_NOT),
    )
    got = parse_xml_query(xml)
    assert got == want
    a = s.search(got, 10)
    b = s.search(want, 10)
    assert [(h.docid, h.score) for h in a] == [(h.docid, h.score) for h in b]
