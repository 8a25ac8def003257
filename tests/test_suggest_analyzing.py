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
