"""HighFreqTerms (Misc/HighFreqTerms.cs), DuplicateFilter
(Sandbox/Queries/DuplicateFilter.cs), BoostingQuery
(Queries/BoostingQuery.cs) — brute-force verified on a tiny corpus."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search import collectors as coll
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

ROWS = [
    ("g1", "a", "c", "spark merge table"),
    ("g1", "b", "c", "spark table scan"),
    ("g2", "c", "c", "spark spark spark"),
    ("g2", "d", "c", "merge only here"),
]


@pytest.fixture(scope="module")
def ms(spark):
    df = spark.createDataFrame(
        ROWS, "repo string, path string, commit string, content string"
    )
    idx = build_index(
        spark,
        df,
        CorpusSpec(order_cols=("repo", "path", "commit"), meta_cols=("repo",)),
    ).cache()
    return IndexSearcher(idx)


def test_high_freq_terms_by_df_and_ttf(ms):
    by_df = [(r.term, r.df) for r in coll.high_freq_terms(ms, 2, "df").collect()]
    assert by_df == [("spark", 3), ("merge", 2)]
    by_ttf = [(r.term, r.ttf) for r in coll.high_freq_terms(ms, 1, "ttf").collect()]
    assert by_ttf == [("spark", 5)]


def test_duplicate_filter_first_and_last(ms):
    # key = repo: first keeps docids {0, 2}, last keeps {1, 3}
    first = {r.docid for r in coll.duplicate_filter(
        ms, TermQuery(term="spark"), "repo", "first", 10).collect()}
    assert first == {0, 2}
    last = {r.docid for r in coll.duplicate_filter(
        ms, TermQuery(term="spark"), "repo", "last", 10).collect()}
    assert last == {1}  # doc 3 has no 'spark'


def test_boosting_query_demotes_context(ms):
    plain = {h.docid: np.float32(h.score)
             for h in ms.search(TermQuery(term="spark"), 10)}
    rows = coll.boosting_query(
        ms, TermQuery(term="spark"), TermQuery(term="merge"), 0.25, 10
    ).collect()
    got = {r.docid: np.float32(r.score) for r in rows}
    assert set(got) == set(plain)  # recall untouched
    # doc 0 matches context 'merge' -> exact f32 demotion; others equal
    assert got[0] == np.float32(plain[0] * np.float32(0.25))
    assert got[1] == plain[1] and got[2] == plain[2]


def test_reverse_index_leading_wildcard(spark):
    """ReverseStringFilter (Analysis/Reverse/ReverseStringFilter.cs:34):
    leading wildcard over the reversed companion index == WildcardQuery
    over the base index, doc-for-doc."""
    from lucenenet_spark.search.queries import (
        WildcardQuery,
        leading_wildcard_query,
    )

    df = spark.createDataFrame(
        ROWS, "repo string, path string, commit string, content string"
    )
    base = IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit"))).cache()
    )
    rev = IndexSearcher(
        build_index(
            spark, df, CorpusSpec(order_cols=("repo", "path", "commit"), reverse=True)
        ).cache()
    )
    want = sorted(h.docid for h in base.search(WildcardQuery(pattern="*le"), 100))
    got = sorted(h.docid for h in rev.search(leading_wildcard_query("*le"), 100))
    assert want and got == want
    # reversed index stores reversed terms at the same positions
    terms = {r.term for r in rev.index.term_stats.collect()}
    assert "elbat" in terms and "kraps" in terms


def test_leading_wildcard_rejects_non_suffix_shapes():
    from lucenenet_spark.search.queries import leading_wildcard_query

    with pytest.raises(ValueError):
        leading_wildcard_query("foo*")
    with pytest.raises(ValueError):
        leading_wildcard_query("*a*b")


def test_to_parent_join_with_children(ms):
    """ToParentBlockJoinCollector: parents ranked by the fold; each
    parent's children ranked by their own scores, capped per parent."""
    from lucenenet_spark.search.join import (
        to_parent_join,
        to_parent_join_with_children,
    )
    import pyspark.sql.functions as F

    parent = F.col("docid") - F.pmod(F.col("docid"), 2)
    rows = to_parent_join_with_children(
        ms, TermQuery(term="spark"), parent, "max", k=5, children_per_parent=1
    ).collect()
    # parent ranks/scores must agree with the plain parent join
    plain = to_parent_join(ms, TermQuery(term="spark"), parent, "max", 5).collect()
    want = [(r.docid, r.score) for r in plain]
    got = sorted({(r.parent, r.parent_score) for r in rows}, key=lambda t: -t[1])
    assert [p for p, _ in got] == [p for p, _ in want]
    for r in rows:
        assert r.child_rank == 1  # capped at one child per parent
        assert r.child % 2 == 1  # children are the odd docids here


def test_chained_filter_ops(ms):
    from pyspark.sql import functions as F

    def ids(filters, ops):
        return sorted(
            r.docid for r in coll.chained_filter(ms, filters, ops).collect()
        )

    spark_q, merge_q = TermQuery(term="spark"), TermQuery(term="merge")
    # leading OR folds from the empty set
    assert ids([spark_q, merge_q], ["or", "or"]) == [0, 1, 2, 3]
    # leading AND starts from filter 0's set (InitialResult :70)
    assert ids([F.col("repo") == "g1", spark_q], ["and", "xor"]) == [2]
    # leading ANDNOT starts from the complement of filter 0
    assert ids([spark_q, merge_q], ["andnot", "and"]) == [3]
    # leading XOR == the set itself
    assert ids([spark_q], ["xor"]) == [0, 1, 2]
    with pytest.raises(ValueError):
        coll.chained_filter(ms, [spark_q], ["or", "and"])


def test_custom_score_matches_manual_fold(ms):
    import numpy as np
    from pyspark.sql import functions as F

    base = {r.docid: np.float32(r.score) for r in ms.search_df(
        TermQuery(term="spark"), k=None).collect()}
    fl = {r.docid: r.field_length for r in ms.index.docs.select(
        "docid", "field_length").collect()}
    out = coll.custom_score_topk(
        ms,
        TermQuery(term="spark"),
        [F.sqrt(F.col("field_length")),
         F.lit(1.0) + (F.col("docid") % 3) / F.lit(4.0)],
        k=10,
    ).collect()
    for r in out:
        v0 = np.float32(np.sqrt(np.float64(fl[r.docid])))
        v1 = np.float32(1.0 + (r.docid % 3) / 4.0)
        exp = np.float32(np.float32(base[r.docid] * v0) * v1)
        assert np.float32(r.score) == exp


def test_scale_function_bounds_and_degenerate(ms):
    import numpy as np
    from pyspark.sql import functions as F

    out = coll.scale_function_topk(ms, TermQuery(term="spark"), "field_length",
                                   0.0, 1.0, k=10).collect()
    fl = {r.docid: r.field_length for r in ms.index.docs.select(
        "docid", "field_length").collect()}
    mn, mx = min(fl.values()), max(fl.values())
    base = {r.docid: np.float32(r.score) for r in ms.search_df(
        TermQuery(term="spark"), k=None).collect()}
    for r in out:
        if mx == mn:
            scale = np.float32(0.0)
        else:
            scale = np.float32(np.float32(1.0) / np.float32(np.float32(mx) - np.float32(mn)))
        v = np.float32(np.float32(np.float32(fl[r.docid]) - np.float32(mn)) * scale)
        assert np.float32(r.score) == np.float32(base[r.docid] * np.float32(v + np.float32(0.0)))
    # degenerate max==min -> scale 0 -> every value collapses to min_target
    one = coll.scale_function_topk(ms, TermQuery(term="only"), "docid", 2.0, 5.0, k=5)
    rows = one.collect()
    assert all(abs(r.score) >= 0 for r in rows)  # runs without div-by-zero


def test_phrase_snippets_marks_only_real_occurrences(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search import collectors as c2
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        (0, "Merge Sort beats bubble merge sort again"),
        (1, "merge everything then sort later"),          # terms apart, no phrase
        (2, "sort merge is the reverse phrase"),          # reversed, no match
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id")
    ).cache()
    s = IndexSearcher(idx)
    out = c2.phrase_snippets(s, ["merge", "sort"], docs).collect()
    assert {r.docid for r in out} == {0}
    spans = sorted((r.pos, r.matched) for r in out)
    assert spans == [(0, "merge sort"), (4, "merge sort")]
    for r in out:
        lt = rows[0][1].lower()
        assert lt[r.start_char:r.end_char] == r.matched
