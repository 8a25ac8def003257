"""Flexible StandardQueryParser port
(QueryParser/Flexible/Standard/StandardQueryParser.cs;
Flexible/Standard/Parser/StandardSyntaxParser.cs precedence grammar;
behaviors cross-checked against
Lucene.Net.Tests.QueryParser/Flexible/Standard/TestStandardQP.cs)."""

from __future__ import annotations

import pytest

from lucenenet_spark.search.parser import parse_query
from lucenenet_spark.search.queries import (
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search.standard_parser import (
    StandardQueryConfig,
    parse_standard,
)


def occurs(q):
    return [c.occur for c in q.clauses]


def test_or_and_precedence():
    """a OR b AND c == a OR (b AND c) — the StandardSyntaxParser
    grammar comment's headline difference vs Classic."""
    q = parse_standard("spark OR merge AND batch")
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    assert q.clauses[0].query == TermQuery(term="spark")
    inner = q.clauses[1].query
    assert occurs(inner) == [Occur.MUST, Occur.MUST]
    assert [c.query.term for c in inner.clauses] == ["merge", "batch"]


def test_classic_diverges_on_same_input():
    """The Classic parser flat-folds the same string — keep the two
    dialects distinguishable so the oracle entry actually pins the
    flexible semantics."""
    q = parse_query("spark OR merge AND batch")
    assert occurs(q) == [Occur.SHOULD, Occur.MUST, Occur.MUST]


def test_and_binds_tighter_both_sides():
    q = parse_standard("aa AND bb OR cc AND dd")
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    left, right = q.clauses[0].query, q.clauses[1].query
    assert [c.query.term for c in left.clauses] == ["aa", "bb"]
    assert [c.query.term for c in right.clauses] == ["cc", "dd"]
    assert occurs(left) == occurs(right) == [Occur.MUST, Occur.MUST]


def test_juxtaposition_uses_default_operator():
    q = parse_standard("spark merge")
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    q2 = parse_standard(
        "spark merge", StandardQueryConfig(default_operator="AND")
    )
    assert occurs(q2) == [Occur.MUST, Occur.MUST]


def test_default_operator_does_not_touch_explicit_groups():
    """TestStandardQP.TestOperatorVsWhitespace analog: AND-default
    applies to juxtaposition only; an explicit OR keeps SHOULD."""
    q = parse_standard(
        "spark OR merge", StandardQueryConfig(default_operator="AND")
    )
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]


def test_single_clause_collapses():
    assert parse_standard("spark") == TermQuery(term="spark")


def test_modifiers_survive_conjunction():
    q = parse_standard("spark AND -merge")
    assert occurs(q) == [Occur.MUST, Occur.MUST_NOT]
    q2 = parse_standard("spark AND NOT merge")
    assert occurs(q2) == [Occur.MUST, Occur.MUST_NOT]
    q3 = parse_standard("-spark OR merge")
    assert occurs(q3) == [Occur.MUST_NOT, Occur.SHOULD]


def test_plus_modifier_on_disjunct():
    q = parse_standard("+spark merge")
    assert occurs(q) == [Occur.MUST, Occur.SHOULD]


def test_groups_reenter_precedence_grammar():
    q = parse_standard("(spark OR merge) AND batch")
    assert occurs(q) == [Occur.MUST, Occur.MUST]
    inner = q.clauses[0].query
    assert occurs(inner) == [Occur.SHOULD, Occur.SHOULD]


def test_group_boost():
    q = parse_standard("(spark merge)^2 batch")
    assert q.clauses[0].query.boost == pytest.approx(2.0)


def test_leading_wildcard_rejected_by_default():
    """AllowLeadingWildcardProcessor.cs:49 — the flexible default is
    FALSE, unlike our permissive Classic surface."""
    with pytest.raises(ValueError, match="leading wildcard"):
        parse_standard("*ark")
    q = parse_standard(
        "*ark", StandardQueryConfig(allow_leading_wildcard=True)
    )
    assert q == WildcardQuery(pattern="*ark")


def test_fuzzy_config_defaults():
    cfg = StandardQueryConfig(fuzzy_max_edits=1, fuzzy_prefix_length=2)
    q = parse_standard("spork~", cfg)
    assert q == FuzzyQuery(term="spork", max_edits=1, prefix_length=2)
    # explicit ~N overrides the config edits but keeps prefix_length
    q2 = parse_standard("spork~2", cfg)
    assert q2 == FuzzyQuery(term="spork", max_edits=2, prefix_length=2)


def test_phrase_slop_config():
    q = parse_standard('"fast merge"', StandardQueryConfig(phrase_slop=3))
    assert isinstance(q, PhraseQuery) and q.slop == 3
    # explicit ~N wins
    q2 = parse_standard(
        '"fast merge"~1', StandardQueryConfig(phrase_slop=3)
    )
    assert q2.slop == 1


def test_regexp_leaf():
    assert parse_standard("/sp[aeiou]rk/") == RegexpQuery(
        pattern="sp[aeiou]rk"
    )
    q = parse_standard("/sp.rk/^3")
    assert q == RegexpQuery(boost=3.0, pattern="sp.rk")
    # field-prefixed regexp parses (field dropped, single-field engine)
    assert parse_standard("body:/sp.rk/") == RegexpQuery(pattern="sp.rk")
    # escaped slash stays inside the pattern
    assert parse_standard(r"/a\/b/") == RegexpQuery(pattern=r"a\/b")


def test_multi_fields_expansion_with_boosts():
    cfg = StandardQueryConfig(
        multi_fields=("title", "body"), fields_boost={"title": 2.0}
    )
    q = parse_standard("spark", cfg)
    assert occurs(q) == [Occur.SHOULD, Occur.SHOULD]
    t, b = q.clauses[0].query, q.clauses[1].query
    assert (t.field, t.boost) == ("title", 2.0)
    assert (b.field, b.boost) == ("body", 1.0)
    # explicit field wins over the multi-field expansion
    q2 = parse_standard("body:spark", cfg)
    assert q2 == TermQuery(term="spark", field="body")


def test_range_prefix_and_symbol_operators():
    q = parse_standard("[aaa TO mmm] && fast*")
    assert occurs(q) == [Occur.MUST, Occur.MUST]
    assert isinstance(q.clauses[0].query, TermRangeQuery)
    assert q.clauses[1].query == PrefixQuery(prefix="fast")
    q2 = parse_standard("spark || merge")
    assert occurs(q2) == [Occur.SHOULD, Occur.SHOULD]
    q3 = parse_standard("spark && !merge")
    assert occurs(q3) == [Occur.MUST, Occur.MUST_NOT]


def test_stopword_clause_vanishes():
    q = parse_standard("the spark")
    assert q == TermQuery(term="spark")


def test_execution_matches_hand_built_tree(spark_index):
    """End-to-end: the parsed precedence tree scores identically to
    the explicitly constructed nested BooleanQuery."""
    from lucenenet_spark.search.queries import BooleanClause
    from lucenenet_spark.search.searcher import IndexSearcher

    s = IndexSearcher(spark_index)
    parsed = parse_standard("return OR value AND data0")
    manual = BooleanQuery(
        clauses=(
            BooleanClause(TermQuery(term="return"), Occur.SHOULD),
            BooleanClause(
                BooleanQuery(
                    clauses=(
                        BooleanClause(TermQuery(term="value"), Occur.MUST),
                        BooleanClause(TermQuery(term="data0"), Occur.MUST),
                    )
                ),
                Occur.SHOULD,
            ),
        )
    )
    got = s.search_df(parsed, 10).collect()
    want = s.search_df(manual, 10).collect()
    assert len(got) == 10
    assert [(r.docid, r.score) for r in got] == [
        (r.docid, r.score) for r in want
    ]
