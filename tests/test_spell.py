"""WordBreakSpellChecker analog (search/spell.py) vs a brute-force
recompute of the reference recursion (WordBreakSpellChecker.cs:264)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search import spell
from lucenenet_spark.search.searcher import IndexSearcher

ROWS = [
    ("r", "a", "c", "spark merge sort table scan"),
    ("r", "b", "c", "table scan key value"),
    ("r", "c", "c", "key value window big"),
]


@pytest.fixture(scope="module")
def sp(spark):
    df = spark.createDataFrame(
        ROWS, "repo string, path string, commit string, content string"
    )
    idx = build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit"))).cache()
    return IndexSearcher(idx)


def test_break_candidates_match_reference_recursion():
    # left part fixed, recurse right only, every part >= min length
    got = spell._break_candidates("abcd", 1, 2)
    assert ("a", "bcd") in got and ("a", "b", "cd") in got
    # NOT (a+bc, d) reached via splitting the MIDDLE out of order —
    # the recursion always splits the rightmost remainder
    assert ("ab", "cd") in got and ("abc", "d") in got
    assert ("a", "bc", "d") in got and ("ab", "c", "d") in got
    # min length 2 prunes short parts
    got2 = spell._break_candidates("abcd", 2, 2)
    assert got2 == [("ab", "cd")]


def test_word_breaks(sp):
    out = spell.suggest_word_breaks(
        sp, ["tablescan", "sparkmergesort", "zzz"], max_changes=2, min_break_length=2
    ).collect()
    by_word = {}
    for r in out:
        by_word.setdefault(r.word, []).append((r.rank, r.suggestion, r.n_changes))
    assert by_word["tablescan"] == [(1, "table scan", 1)]
    assert by_word["sparkmergesort"] == [(1, "spark merge sort", 2)]
    assert "zzz" not in by_word


def test_word_breaks_min_frequency(sp):
    # df(big) = 1 < 2: 'windowbig' must not break at min_freq=2
    out = spell.suggest_word_breaks(
        sp, ["windowbig"], min_suggestion_frequency=2, min_break_length=3
    ).collect()
    assert out == []
    out = spell.suggest_word_breaks(
        sp, ["windowbig"], min_suggestion_frequency=1, min_break_length=3
    ).collect()
    assert [(r.suggestion, r.freq) for r in out] == [("window big", 2)]


def test_word_combinations(sp):
    out = spell.suggest_word_combinations(
        sp, ("tab", "le", "sc", "an", "key"), max_changes=2
    ).collect()
    # 'table' (tab+le) and 'scan' (sc+an) combine; 'lesc', 'ankey' etc do not
    got = {(r.start, r.length, r.combined) for r in out}
    assert got == {(0, 2, "table"), (2, 2, "scan")}


def test_direct_spell(sp):
    out = spell.direct_spell_suggest(
        sp, ["tabel", "windoe", "tab", "table"], num_sug=5
    ).collect()
    by_word = {}
    for r in out:
        by_word.setdefault(r.word, []).append((r.rank, r.suggestion, r.score, r.df))
    # default internal (OSA) distance: the el->le transposition is ONE
    # edit, min len 5 -> score 0.8 (LuceneLevenshteinDistance)
    assert by_word["tabel"][0][1] == "table"
    assert abs(by_word["tabel"][0][2] - (1.0 - 1.0 / 5.0)) < 1e-6
    # the selectable plain-Levenshtein dialect counts the swap as 2
    lev = spell.direct_spell_suggest(
        sp, ["tabel"], num_sug=5, distance="levenshtein"
    ).collect()
    assert abs(lev[0].score - (1.0 - 2.0 / 5.0)) < 1e-6
    # single substitution
    assert by_word["windoe"][0][1] == "window"
    # below min_query_length -> no suggestions
    assert "tab" not in by_word
    # already in the dictionary -> when_not_in_index drops it
    assert "table" not in by_word


def test_direct_spell_always_mode_and_accuracy(sp):
    # always mode suggests for in-dictionary words too (excluding self)
    out = spell.direct_spell_suggest(
        sp, ["table"], num_sug=5, suggest_mode="always", max_query_frequency=100.0
    ).collect()
    assert all(r.suggestion != "table" for r in out)
    # accuracy gate: raising it above the best score empties the result
    out2 = spell.direct_spell_suggest(sp, ["tabel"], num_sug=5, accuracy=0.9).collect()
    assert out2 == []


def test_direct_spell_absolute_max_query_frequency(sp):
    # mqf >= 1 is an absolute docfreq ceiling: 'table' (df=2) is
    # "common enough to be correct" under mqf=1 even in always mode
    out = spell.direct_spell_suggest(
        sp, ["table"], num_sug=5, suggest_mode="always", max_query_frequency=1.0
    ).collect()
    assert out == []

def test_direct_spell_plan_is_hash_join(sp):
    # The prefix-share predicate is expressed as an equi-join key, so
    # the word batch hash-joins against the dictionary; a
    # BroadcastNestedLoopJoin here would cost |words| x |dict| at scale.
    for kwargs in ({"min_prefix": 1}, {"min_prefix": 0}):
        df = spell.direct_spell_suggest(sp, ["tabel", "windoe"], **kwargs)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "BroadcastHashJoin" in plan


def test_direct_spell_min_prefix_zero(sp):
    # min_prefix=0 (length-band key path) still finds the suggestion
    out = spell.direct_spell_suggest(sp, ["windoe"], num_sug=5, min_prefix=0).collect()
    assert out and out[0].suggestion == "window"
