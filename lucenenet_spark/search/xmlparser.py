"""XML query parser — the ``Lucene.Net.QueryParser/Xml/CoreParser.cs``
surface: an XML element tree where each element name selects a query
builder. Covered builders (reference ``CoreParser.cs:70-106``):

- ``TermQuery`` (``Builders/TermQueryBuilder.cs:27``): fieldName attr,
  text = term, ``boost`` attr.
- ``TermsQuery`` (``TermsQueryBuilder.cs``): text analyzed with the
  standard pipeline; each token a SHOULD TermQuery;
  ``minimumNumberShouldMatch`` attr.
- ``BooleanQuery`` (``BooleanQueryBuilder.cs``): ``Clause`` children
  with ``occurs`` = must | should | mustNot (case-insensitive),
  ``minimumNumberShouldMatch``/``boost`` attrs.
- ``DisjunctionMaxQuery`` (``DisjunctionMaxQueryBuilder.cs``):
  ``tieBreaker`` attr, children = any queries.
- ``MatchAllDocsQuery``, ``ConstantScoreQuery`` (children: a filter —
  ``RangeFilter`` or ``TermsFilter``), ``UserQuery`` (text handed to
  the classic parser, ``UserInputQueryBuilder.cs``).
- Spans (``SpanTermBuilder`` / ``SpanOrBuilder`` / ``SpanOrTermsBuilder``
  / ``SpanNearBuilder`` / ``SpanNotBuilder`` / ``SpanFirstBuilder``):
  build the span AST for :func:`lucenenet_spark.search.spans.span_query`.

Unsupported elements raise ``ValueError`` with the element name (the
reference throws ParserException for unknown builders). BoostingTermQuery,
FuzzyLikeThisQuery, LikeThisQuery, BoostingQuery, NumericRange*, and the
filter-cache builders are intentionally out of scope here — their
engines exist as separate surfaces (payloads.py, mlt.py, collectors
filtered_topk) but are not reachable from one Query AST node.

Scale note: parsing is driver-side string work on a query, O(query
size); the produced AST compiles to the same single-scan plans as the
programmatic API — the parser adds zero Spark stages.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.search.queries import (
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllDocsQuery,
    Occur,
    Query,
    TermQuery,
    TermRangeQuery,
)
from lucenenet_spark.search.spans import (
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_SPAN_TAGS = {"SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot", "SpanFirst"}


def parse_xml_query(xml_text: str) -> "Query | SpanQuery":
    """Parse one XML query document to the engine's Query / SpanQuery
    AST. Span-rooted documents return a SpanQuery — run those through
    ``spans.span_query(searcher, q)``; everything else through
    ``searcher.search_df``."""
    root = ET.fromstring(xml_text)
    if root.tag in _SPAN_TAGS:
        return _span(root)
    return _query(root)


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ValueError(f"<{e.tag}> requires non-blank text")
    return t


def _boost(e: ET.Element) -> float:
    return float(e.get("boost", "1.0"))


def _children(e: ET.Element) -> list[ET.Element]:
    return list(e)


def _query(e: ET.Element) -> Query:
    tag = e.tag
    if tag == "TermQuery":
        return TermQuery(
            term=_text(e).lower(), field=e.get("fieldName"), boost=_boost(e)
        )
    if tag == "TermsQuery":
        toks = [t for t, _ in analyze(_text(e))]
        return BooleanQuery.of(
            *[(TermQuery(term=t), Occur.SHOULD) for t in toks],
            boost=_boost(e),
            min_should_match=int(e.get("minimumNumberShouldMatch", "0")),
        )
    if tag == "MatchAllDocsQuery":
        return MatchAllDocsQuery(boost=_boost(e))
    if tag == "BooleanQuery":
        pairs = []
        for clause in e:
            if clause.tag != "Clause":
                continue
            occs = clause.get("occurs", "should").lower()
            occur = {
                "must": Occur.MUST,
                "mustnot": Occur.MUST_NOT,
                "should": Occur.SHOULD,
            }.get(occs)
            if occur is None:
                raise ValueError(f"invalid occurs value: {occs!r}")
            kids = _children(clause)
            if not kids:
                raise ValueError("<Clause> requires a child query")
            pairs.append((_query(kids[0]), occur))
        return BooleanQuery.of(
            *pairs,
            boost=_boost(e),
            min_should_match=int(e.get("minimumNumberShouldMatch", "0")),
        )
    if tag == "DisjunctionMaxQuery":
        return DisjunctionMaxQuery(
            disjuncts=tuple(_query(k) for k in _children(e)),
            tie_breaker=float(e.get("tieBreaker", "0.0")),
            boost=_boost(e),
        )
    if tag == "ConstantScoreQuery":
        kids = _children(e)
        if not kids:
            raise ValueError("<ConstantScoreQuery> requires a filter child")
        return ConstantScoreQuery(query=_filter(kids[0]), boost=_boost(e))
    if tag == "UserQuery":
        from lucenenet_spark.search.parser import parse_query

        return parse_query(_text(e))
    if tag in _SPAN_TAGS:
        raise ValueError(
            f"<{tag}> is a span query — parse_xml_query returns the span "
            "AST only when it is the document root"
        )
    raise ValueError(f"no builder for element <{tag}>")


def _filter(e: ET.Element) -> Query:
    """Filter builders usable under ConstantScoreQuery: the docid-set
    producers (``RangeFilterBuilder.cs``, ``TermsFilterBuilder.cs``)."""
    if e.tag == "RangeFilter":
        return TermRangeQuery(
            lower=e.get("lowerTerm"),
            upper=e.get("upperTerm"),
            include_lower=e.get("includeLower", "true").lower() == "true",
            include_upper=e.get("includeUpper", "true").lower() == "true",
        )
    if e.tag == "TermsFilter":
        toks = [t for t, _ in analyze(_text(e))]
        return BooleanQuery.of(*[(TermQuery(term=t), Occur.SHOULD) for t in toks])
    raise ValueError(f"no filter builder for element <{e.tag}>")


def _span(e: ET.Element) -> SpanQuery:
    tag = e.tag
    if tag == "SpanTerm":
        return SpanTermQuery(term=_text(e).lower())
    if tag == "SpanOrTerms":
        toks = [t for t, _ in analyze(_text(e))]
        return SpanOrQuery(clauses=tuple(SpanTermQuery(term=t) for t in toks))
    if tag == "SpanOr":
        return SpanOrQuery(clauses=tuple(_span(k) for k in _children(e)))
    if tag == "SpanNear":
        slop = e.get("slop")
        if slop is None:
            raise ValueError("<SpanNear> requires a slop attribute")
        return SpanNearQuery(
            clauses=tuple(_span(k) for k in _children(e)),
            slop=int(slop),
            in_order=e.get("inOrder", "false").lower() == "true",
        )
    if tag == "SpanNot":
        incl = e.find("Include")
        excl = e.find("Exclude")
        if incl is None or excl is None:
            raise ValueError("<SpanNot> requires Include and Exclude children")
        return SpanNotQuery(
            include=_span(_children(incl)[0]), exclude=_span(_children(excl)[0])
        )
    if tag == "SpanFirst":
        kids = _children(e)
        if not kids:
            raise ValueError("<SpanFirst> requires a child span")
        return SpanFirstQuery(match=_span(kids[0]), end=int(e.get("end", "0")))
    raise ValueError(f"no span builder for element <{tag}>")
