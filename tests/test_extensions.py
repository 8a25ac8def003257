"""Round-2 extension surfaces: pluggable similarity (Classic/TFIDF),
highlighter, range facets, group-distinct, suggesters, function query."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.functions.similarity import BM25Similarity, ClassicSimilarity
from lucenenet_spark.functions.smallfloat import byte315_to_float
from lucenenet_spark.search import collectors as coll
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher

Q = TermQuery(term="return")


@pytest.fixture(scope="module")
def classic(spark_index):
    return IndexSearcher(spark_index, similarity=ClassicSimilarity())


def test_classic_scores_match_bruteforce(classic, spark_index, oracle_index):
    hits = classic.search(Q, 10)
    assert hits
    max_doc = spark_index.max_doc
    df = oracle_index.df("return")
    idf = np.float32(np.log(max_doc / (df + 1.0)) + 1.0)
    w = np.float32(np.float32(idf * idf) * np.float32(1.0))
    for h in hits:
        freq = oracle_index.postings["return"][h.docid][0]
        nb = int(oracle_index.norms[h.docid])
        tf = np.float32(np.sqrt(np.float64(freq)))
        nd = byte315_to_float(np.array([nb], dtype=np.uint8))[0]
        expect = np.float32(np.float32(np.float32(w) * tf) * nd)
        assert np.float32(h.score) == expect, h


def test_classic_and_bm25_rank_differently_but_both_sane(classic, spark_index):
    bm = IndexSearcher(spark_index)
    a = bm.search(Q, 100000)
    b = classic.search(Q, 100000)
    assert {h.docid for h in a} == {h.docid for h in b}  # same match set
    # boolean under classic: sum of classic clause scores
    qb = BooleanQuery.of(
        (TermQuery(term="return"), Occur.MUST), (TermQuery(term="value"), Occur.MUST)
    )
    hits = classic.search(qb, 5)
    s1 = {h.docid: np.float32(h.score) for h in classic.search(TermQuery(term="return"), 1000)}
    s2 = {h.docid: np.float32(h.score) for h in classic.search(TermQuery(term="value"), 1000)}
    for h in hits:
        expect = np.float32(
            np.float32(np.float32(0.0) + s1[h.docid]) + s2[h.docid]
        )
        assert np.float32(h.score) == expect


def test_highlight_best_window(searcher_ext, spark_index, oracle_index):
    q = BooleanQuery.of(
        (TermQuery(term="return"), Occur.SHOULD), (TermQuery(term="value"), Occur.SHOULD)
    )
    window = 8
    rows = coll.highlight(searcher_ext, q, window=window, k=5).collect()
    assert rows
    for r in rows:
        pos = []
        for t in ("return", "value"):
            if r["docid"] in oracle_index.postings.get(t, {}):
                pos.extend(oracle_index.postings[t][r["docid"]][1])
        pos = sorted(pos)
        best = max(
            ((sum(1 for x in pos if p <= x < p + window), -p) for p in pos),
        )
        assert r["n_hits"] == best[0] and r["frag_start"] == -best[1]
        assert r["frag_end"] == r["frag_start"] + window - 1


@pytest.fixture(scope="module")
def searcher_ext(spark_index):
    return IndexSearcher(spark_index)


def test_facet_ranges_counts(searcher_ext, spark_index):
    ranges = [("short", 0, 25), ("long", 25, 10000), ("overlap", 0, 10000)]
    got = {r["label"]: r["n_docs"] for r in coll.facet_ranges(searcher_ext, Q, "field_length", ranges).collect()}
    fl = {r["docid"]: r["field_length"] for r in spark_index.docs.select("docid", "field_length").collect()}
    matched = {r["docid"] for r in searcher_ext.matching_docids(Q).collect()}
    for label, lo, hi in ranges:
        assert got[label] == sum(1 for d in matched if lo <= fl[d] < hi)
    assert got["overlap"] == got["short"] + got["long"]  # overlap allowed


def test_drill_sideways_counts(searcher_ext, spark_index):
    docs = {
        r["docid"]: (r["repo"], r["lang"])
        for r in spark_index.docs.select("docid", "repo", "lang").collect()
    }
    matched = {r["docid"] for r in searcher_ext.matching_docids(Q).collect()}
    repo0 = docs[next(iter(matched))][0]
    lang0 = docs[next(iter(matched))][1]
    rows = coll.drill_sideways(searcher_ext, Q, {"repo": repo0, "lang": lang0}).collect()
    got = {(r["dim"], r["value"]): r["n_docs"] for r in rows}
    # repo dim: counts under the OTHER constraint (lang == lang0)
    for (dim, val), n in got.items():
        if dim == "repo":
            assert n == sum(1 for d in matched if docs[d][1] == lang0 and docs[d][0] == val)
        elif dim == "lang":
            assert n == sum(1 for d in matched if docs[d][0] == repo0 and docs[d][1] == val)
    assert got[("__hits__", "")] == sum(
        1 for d in matched if docs[d] == (repo0, lang0)
    )


def test_group_distinct_pairs(searcher_ext, spark_index):
    got = {(r["grp"], r["val"]) for r in coll.group_distinct(searcher_ext, Q, "repo", "lang").collect()}
    docs = {
        r["docid"]: (r["repo"], r["lang"])
        for r in spark_index.docs.select("docid", "repo", "lang").collect()
    }
    matched = {r["docid"] for r in searcher_ext.matching_docids(Q).collect()}
    assert got == {docs[d] for d in matched}


def test_suggest_similar_ranking(searcher_ext):
    from lucenenet_spark.search.suggest import suggest_similar

    rows = suggest_similar(searcher_ext, "retur", max_suggestions=5, max_edits=2).collect()
    assert rows and rows[0]["term"] == "return"  # distance 1 beats distance 2
    dists = [r["distance"] for r in rows]
    assert dists == sorted(dists)
    assert all(r["term"] != "retur" for r in rows)


def test_complete_prefix_by_df(searcher_ext, spark_index):
    from lucenenet_spark.search.suggest import complete_prefix

    rows = complete_prefix(searcher_ext, "re", max_suggestions=3).collect()
    assert all(r["term"].startswith("re") for r in rows)
    dfs = [r["df"] for r in rows]
    assert dfs == sorted(dfs, reverse=True)


def test_expression_compiler_and_topk(searcher_ext, spark_index):
    from lucenenet_spark.functions.expressions import compile_expression, expression_sql

    rows = coll.expression_topk(
        searcher_ext, Q, "score * sqrt(field_length) + 0.5", 5
    ).collect()
    base = {h.docid: h.score for h in searcher_ext.search(Q, 100000)}
    fl = {r["docid"]: r["field_length"] for r in spark_index.docs.select("docid", "field_length").collect()}
    expect = sorted(
        ((-(s * np.sqrt(float(fl[d])) + 0.5), d) for d, s in base.items())
    )[:5]
    assert [(r["docid"], r["expr_score"]) for r in rows] == [
        (d, -v) for v, d in expect
    ]
    # rejected syntax: calls to unknown fns, attributes, comparisons
    with pytest.raises(ValueError):
        compile_expression("__import__('os')", {})
    with pytest.raises(ValueError):
        compile_expression("score > 1", {"score": None})
    with pytest.raises(ValueError):
        expression_sql("evil(1)", {})


def test_facet_taxonomy_rollup(searcher_ext, spark_index):
    got = {
        (r["depth"], r["path"]): r["n_docs"]
        for r in coll.facet_taxonomy(searcher_ext, Q, ["repo", "lang"]).collect()
    }
    docs = {
        r["docid"]: (r["repo"], r["lang"])
        for r in spark_index.docs.select("docid", "repo", "lang").collect()
    }
    matched = {r["docid"] for r in searcher_ext.matching_docids(Q).collect()}
    assert got[(0, "")] == len(matched)  # root total
    for d in matched:
        repo, lang = docs[d]
        assert got[(1, repo)] == sum(1 for x in matched if docs[x][0] == repo)
        assert got[(2, f"{repo}/{lang}")] == sum(
            1 for x in matched if docs[x] == (repo, lang)
        )


def test_join_query_modes(searcher_ext, spark_index):
    from lucenenet_spark.search.join import join_query

    docs = {
        r["docid"]: r["repo"]
        for r in spark_index.docs.select("docid", "repo").collect()
    }
    from_scores = {h.docid: np.float32(h.score) for h in searcher_ext.search(Q, 100000)}
    per_repo: dict[str, list] = {}
    for d, s in from_scores.items():
        per_repo.setdefault(docs[d], []).append((d, s))
    rows = join_query(searcher_ext, Q, "repo", "repo", "max", k=None).collect()
    got = {r["docid"]: np.float32(r["score"]) for r in rows}
    assert set(got) == {d for d, r in docs.items() if r in per_repo}
    for d, s in got.items():
        assert s == max(x for _, x in per_repo[docs[d]])
    # total: float32 docid-ordered fold
    rows_t = join_query(searcher_ext, Q, "repo", "repo", "total", k=None).collect()
    for r in rows_t:
        acc = np.float32(0.0)
        for _, x in sorted(per_repo[docs[r["docid"]]]):
            acc = np.float32(acc + x)
        assert np.float32(r["score"]) == acc
    with pytest.raises(ValueError):
        join_query(searcher_ext, Q, "repo", "repo", "bogus")


def test_doc_retrieval_and_sorted_pagination(searcher_ext, spark_index):
    d = searcher_ext.doc(0)
    assert d is not None and d["docid"] == 0 and "repo" in d
    assert searcher_ext.doc(10**9) is None
    bulk = {r["docid"] for r in searcher_ext.docs_df([0, 1, 2]).collect()}
    assert bulk == {0, 1, 2}
    # sorted pagination: page1 + page2 under (field_length asc, docid)
    # must equal the top-20 of the same sort with no overlap
    page1 = coll.sort_topk(searcher_ext, Q, [coll.SortField("field_length")], 10).collect()
    last = page1[-1]
    page2 = coll.sort_search_after(
        searcher_ext, Q, coll.SortField("field_length"),
        last["field_length"], last["docid"], 10,
    ).collect()
    top20 = coll.sort_topk(searcher_ext, Q, [coll.SortField("field_length")], 20).collect()
    assert [r["docid"] for r in page1] + [r["docid"] for r in page2] == [
        r["docid"] for r in top20
    ]


def test_to_parent_block_join(searcher_ext, spark_index):
    from pyspark.sql import functions as F

    from lucenenet_spark.search.join import to_parent_join

    parent = F.col("docid") - F.pmod(F.col("docid"), 10)
    rows = to_parent_join(searcher_ext, Q, parent, "avg", k=None).collect()
    child = {h.docid: np.float32(h.score) for h in searcher_ext.search(Q, 100000)}
    per_parent: dict[int, list] = {}
    for d, s in child.items():
        p = d - d % 10
        if p != d:
            per_parent.setdefault(p, []).append((d, s))
    got = {r["docid"]: np.float32(r["score"]) for r in rows}
    assert set(got) == set(per_parent)
    for p, kids in per_parent.items():
        acc = np.float32(0.0)
        for _, s in sorted(kids):
            acc = np.float32(acc + s)
        assert got[p] == np.float32(acc / np.float32(len(kids)))
    # parents score even when the parent doc itself doesn't match;
    # children never appear in the output
    assert all(d % 10 == 0 for d in got)


def test_sort_rescore_reorders_first_pass(searcher_ext, spark_index):
    first = {r["docid"] for r in searcher_ext.search_df(Q, 20).collect()}
    rows = coll.sort_rescore(searcher_ext, Q, [coll.SortField("field_length")], 20, 5).collect()
    fl = {r["docid"]: r["field_length"] for r in spark_index.docs.select("docid", "field_length").collect()}
    assert all(r["docid"] in first for r in rows)  # rescore never adds docs
    vals = [(r["field_length"], r["docid"]) for r in rows]
    assert vals == sorted((fl[d], d) for d in first)[:5]


def test_term_vector_matches_analyzer(searcher_ext, corpus_rows):
    from lucenenet_spark.analysis.analyzer import analyze
    from lucenenet_spark.search.mlt import term_vector

    rows = term_vector(searcher_ext, 0).collect()
    # doc 0 = first row in the pinned (repo, path, commit) order
    ordered = sorted(corpus_rows, key=lambda r: (r["repo"], r["path"], r["commit"]))
    pairs = analyze(ordered[0]["content"])
    expect = {}
    for t, p in pairs:
        expect.setdefault(t, []).append(p)
    got = {}
    for r in rows:
        got.setdefault(r["term"], []).append(r["pos"])
        assert r["freq"] == len(expect[r["term"]])
    assert {t: sorted(v) for t, v in got.items()} == expect


def test_boost_by_value_math(searcher_ext, spark_index):
    rows = coll.boost_by_value(searcher_ext, Q, "field_length", 10).collect()
    base = {h.docid: np.float32(h.score) for h in searcher_ext.search(Q, 100000)}
    fl = {r["docid"]: r["field_length"] for r in spark_index.docs.select("docid", "field_length").collect()}
    for r in rows:
        factor = np.float32(np.log(1.0 + np.float64(fl[r["docid"]])))
        assert np.float32(r["score"]) == np.float32(base[r["docid"]] * factor)
