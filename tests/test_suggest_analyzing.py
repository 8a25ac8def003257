"""AnalyzingSuggester / FuzzySuggester semantics."""

from __future__ import annotations

import pytest

from lucenenet_spark.search.suggest import AnalyzingSuggester


@pytest.fixture(scope="module")
def sugg(spark):
    rows = [
        ("The Merge Planner", 90),
        ("merge batch tables", 70),
        ("Margo the merge cat", 50),  # key: 'margo merge cat'
        ("spark streaming", 99),
        ("", 10),
    ]
    df = spark.createDataFrame(rows, "surface string, weight long")
    return AnalyzingSuggester(df, "surface", "weight")


def test_analyzed_keys_drop_stopwords_and_case(sugg):
    rows = {r["surface"]: r["key"] for r in sugg.table.collect()}
    # 'The' is a stopword -> key starts at 'merge'; lowercased
    assert rows["The Merge Planner"] == "merge planner"
    assert rows["Margo the merge cat"] == "margo merge cat"
    assert "" not in {r["surface"] for r in sugg.table.collect()}


def test_lookup_ranks_by_weight(sugg):
    got = [(r["surface"], r["weight"]) for r in sugg.lookup("merge", 5).collect()]
    # both 'merge'-keyed surfaces, weight desc; 'Margo...' keys under
    # 'margo' and does not match
    assert got == [("The Merge Planner", 90), ("merge batch tables", 70)]
    # the analyzed prefix lowercases + stop-filters the input too
    assert [r["surface"] for r in sugg.lookup("the MERGE", 5).collect()] == [
        "The Merge Planner",
        "merge batch tables",
    ]


def test_fuzzy_lookup_allows_edits(sugg):
    got = [(r["surface"], r["distance"]) for r in sugg.fuzzy_lookup("marge", 5, 1).collect()]
    # 'merge*' keys are 1 edit from 'marge'; 'margo' also 1 edit
    surfaces = {s for s, _ in got}
    assert {"The Merge Planner", "merge batch tables", "Margo the merge cat"} == surfaces
    assert all(d == 1 for _, d in got)
    # zero-edit lookup finds nothing (no key starts with 'marge')
    assert sugg.lookup("marge", 5).collect() == []


# --------------------------------------------------------------------
# AnalyzingInfixSuggester / BlendedInfixSuggester
# (Suggest/Analyzing/AnalyzingInfixSuggester.cs, BlendedInfixSuggester.cs)
# --------------------------------------------------------------------

from lucenenet_spark.search.suggest import (  # noqa: E402
    AnalyzingInfixSuggester,
    suggest_stop_analyze,
)


@pytest.fixture(scope="module")
def infix(spark):
    rows = [
        ("quick sort routines", 80),
        ("merge sort of tables", 60),
        ("tape sort archive", 40),
        ("sorted output", 20),
        ("the sort", 10),
        ("", 5),
    ]
    df = spark.createDataFrame(rows, "surface string, weight long")
    return AnalyzingInfixSuggester(df, "surface", "weight")


def test_suggest_stop_analyze_trailing_token_rules():
    # unfinished last token -> prefix; stopwords dropped from the rest
    assert suggest_stop_analyze("sort ta") == (["sort"], "ta")
    # a trailing STOPWORD that reaches the end of the key is kept as
    # the prefix (SuggestStopFilter's still-typing rule)
    assert suggest_stop_analyze("find the") == (["find"], "the")
    # trailing whitespace -> last token is finished, stop-filters away
    assert suggest_stop_analyze("find the ") == (["find"], None)
    assert suggest_stop_analyze("") == ([], None)


def test_infix_lookup_matches_tokens_anywhere(infix):
    got = [(r["surface"], r["weight"]) for r in infix.lookup("sort ta", 5).collect()]
    # needs exact token 'sort' AND some token starting 'ta' — infix,
    # not prefix-of-surface; ranked purely by weight desc
    assert got == [("merge sort of tables", 60), ("tape sort archive", 40)]


def test_infix_lookup_finished_token_is_exact(infix):
    # trailing space -> 'sort' is a finished token: 'sorted' must NOT match
    got = [r["surface"] for r in infix.lookup("sort ", 5).collect()]
    assert got == [
        "quick sort routines",
        "merge sort of tables",
        "tape sort archive",
        "the sort",
    ]


def test_infix_lookup_or_semantics(infix):
    got = [r["surface"] for r in infix.lookup(
        "quick tape ", 5, all_terms_required=False
    ).collect()]
    assert got == ["quick sort routines", "tape sort archive"]


def test_infix_highlight_wraps_whole_and_prefix_matches(infix):
    got = {
        r["surface"]: r["highlighted"]
        for r in infix.lookup("sort ta", 5, do_highlight=True).collect()
    }
    assert got["merge sort of tables"] == "merge <b>sort</b> of <b>ta</b>bles"
    assert got["tape sort archive"] == "<b>ta</b>pe <b>sort</b> archive"


def test_blended_linear_positions(infix):
    got = [
        (r["surface"], r["first_pos"], r["score"])
        for r in infix.lookup_blended("sort", 5, blender="linear").collect()
    ]
    # prefix 'sort' matches 'sort' and 'sorted'; coefficient 1-0.1*pos
    # from the FIRST matching analyzed position (stopword gaps count:
    # 'the sort' puts 'sort' at position 1)
    assert got == [
        ("quick sort routines", 1, 72),
        ("merge sort of tables", 1, 54),
        ("tape sort archive", 1, 36),
        ("sorted output", 0, 20),
        ("the sort", 1, 9),
    ]


def test_blended_reciprocal_positions(infix):
    got = [
        (r["surface"], r["score"])
        for r in infix.lookup_blended("sort", 5, blender="reciprocal").collect()
    ]
    # 1/(1+pos); weight ties broken by surface asc
    assert got == [
        ("quick sort routines", 40),
        ("merge sort of tables", 30),
        ("sorted output", 20),
        ("tape sort archive", 20),
        ("the sort", 5),
    ]
