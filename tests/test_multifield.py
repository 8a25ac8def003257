"""Multi-field indexing: per-field stats, fielded routing, cross-field
dismax/boolean (reference FieldInfos / MultiFieldQueryParser;
reference test mirrored:
src/Lucene.Net.Tests.QueryParser/Classic/TestMultiFieldQueryParser.cs)."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.index.builder import CorpusSpec
from lucenenet_spark.index.multifield import MultiFieldIndex, build_multi_field_index
from lucenenet_spark.search.multifield import MultiFieldSearcher
from lucenenet_spark.search.parser import parse_query
from lucenenet_spark.search.queries import BooleanQuery, Occur, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def mf(spark):
    rows = [
        # (repo, path, commit, title, body)
        ("r", "a", "c", "spark engine", "the merge sort implementation for spark"),
        ("r", "b", "c", "merge planner", "spark spark spark everywhere in this body"),
        ("r", "c", "c", "unrelated doc", "nothing relevant here at all today"),
        ("r", "d", "c", "spark spark", "merge merge merge merge"),
    ]
    df = spark.createDataFrame(rows, "repo string, path string, commit string, title string, body string")
    idx = build_multi_field_index(
        spark, df, {"title": "title", "body": "body"},
        CorpusSpec(order_cols=("repo", "path", "commit")),
        default_field="body",
    ).cache()
    return MultiFieldSearcher(idx), idx


def test_per_field_stats_are_independent(mf):
    _, idx = mf
    t_df = {r["term"]: r["df"] for r in idx["title"].term_stats.collect()}
    b_df = {r["term"]: r["df"] for r in idx["body"].term_stats.collect()}
    assert t_df["spark"] == 2 and b_df["spark"] == 2
    assert t_df["merge"] == 1 and b_df["merge"] == 2
    # avgdl differs: titles are short
    assert idx["title"].sum_total_term_freq < idx["body"].sum_total_term_freq
    assert idx["title"].max_doc == idx["body"].max_doc == 4


def test_fielded_term_query_scores_with_field_stats(mf):
    mfs, idx = mf
    hits = mfs.search_df(TermQuery(term="spark", field="title"), 10).collect()
    # only docs 0 and 3 have 'spark' in the title
    docs = {r["path"]: r["docid"] for r in idx["title"].docs.select("docid", "path").collect()} \
        if "path" in [f.name for f in idx["title"].docs.schema.fields] else None
    assert len(hits) == 2
    # scores must equal the single-field searcher over the title index
    solo = IndexSearcher(idx["title"]).search_df(TermQuery(term="spark"), 10).collect()
    assert [(r["docid"], np.float32(r["score"])) for r in hits] == [
        (r["docid"], np.float32(r["score"])) for r in solo
    ]


def test_unknown_field_raises(mf):
    mfs, _ = mf
    with pytest.raises(KeyError):
        mfs.search_df(TermQuery(term="x", field="nope"), 5).collect()


def test_cross_field_boolean_and(mf):
    mfs, _ = mf
    q = BooleanQuery.of(
        (TermQuery(term="spark", field="title"), Occur.MUST),
        (TermQuery(term="merge", field="body"), Occur.MUST),
    )
    hits = mfs.search_df(q, 10).collect()
    # docs 0 (title spark + body merge) and 3 qualify
    assert len(hits) == 2
    # score = f32(title_score + body_score) — verify against leaves
    ts = {r["docid"]: r["score"] for r in mfs.searchers["title"].scored_docs(TermQuery(term="spark")).collect()}
    bs = {r["docid"]: r["score"] for r in mfs.searchers["body"].scored_docs(TermQuery(term="merge")).collect()}
    for h in hits:
        expect = np.float32(
            np.float32(np.float32(0.0) + np.float32(ts[h["docid"]])) + np.float32(bs[h["docid"]])
        )
        assert np.float32(h["score"]) == expect


def test_dismax_all_fields_max_semantics(mf):
    mfs, _ = mf
    hits = mfs.dismax_all_fields(TermQuery(term="spark"), tie_breaker=0.0, k=10).collect()
    ts = {r["docid"]: np.float32(r["score"]) for r in mfs.searchers["title"].scored_docs(TermQuery(term="spark")).collect()}
    bs = {r["docid"]: np.float32(r["score"]) for r in mfs.searchers["body"].scored_docs(TermQuery(term="spark")).collect()}
    for h in hits:
        expect = max(ts.get(h["docid"], np.float32(0)), bs.get(h["docid"], np.float32(0)))
        assert np.float32(h["score"]) == expect


def test_parser_routes_fields(mf):
    mfs, _ = mf
    q = parse_query("title:spark AND body:merge")
    hits = mfs.search_df(q, 10).collect()
    assert len(hits) == 2
    # equivalent to the explicitly-fielded boolean
    q2 = BooleanQuery.of(
        (TermQuery(term="spark", field="title"), Occur.MUST),
        (TermQuery(term="merge", field="body"), Occur.MUST),
    )
    hits2 = mfs.search_df(q2, 10).collect()
    assert [(r["docid"], r["score"]) for r in hits] == [
        (r["docid"], r["score"]) for r in hits2
    ]


def test_parser_fielded_phrase(mf):
    mfs, _ = mf
    q = parse_query('title:"merge planner"')
    hits = mfs.search_df(q, 5).collect()
    assert [r["docid"] for r in hits] and len(hits) == 1
    # same phrase in the default (body) field matches nothing
    assert mfs.search_df(parse_query('"merge planner"'), 5).collect() == []


def test_save_load_roundtrip(mf, tmp_path):
    mfs, idx = mf
    path = str(tmp_path / "mfidx")
    idx.save(path)
    loaded = MultiFieldIndex.load(idx["body"].docs.sparkSession, path)
    mfs2 = MultiFieldSearcher(loaded)
    a = mfs.dismax_all_fields(TermQuery(term="spark"), 0.5, k=5).collect()
    b = mfs2.dismax_all_fields(TermQuery(term="spark"), 0.5, k=5).collect()
    assert [(r["docid"], r["score"]) for r in a] == [(r["docid"], r["score"]) for r in b]


def test_multifield_explain_matches_search(mf):
    """Cross-field Explain root value == search_df score, per field
    stats (title vs body df/norms differ)."""
    from pyspark.sql import functions as F

    mfs, _ = mf
    q = BooleanQuery.of(
        (TermQuery(term="spark", field="title"), Occur.MUST),
        (TermQuery(term="merge", field="body"), Occur.SHOULD),
    )
    rows = mfs.search_df(q, 5).collect()
    assert rows
    for r in rows:
        e = mfs.explain(q, r["docid"])
        assert e["match"] and e["value"] == r["score"]
        assert {c.get("field") for c in e["clauses"]} == {"title", "body"}
    # dismax across fields
    dq = mfs.dismax_all_fields(TermQuery(term="spark"), 0.4, k=5)
    import dataclasses
    from lucenenet_spark.search.queries import DisjunctionMaxQuery

    disjuncts = tuple(
        dataclasses.replace(TermQuery(term="spark"), field=n)
        for n in mfs.index.field_order
    )
    q2 = DisjunctionMaxQuery(disjuncts=disjuncts, tie_breaker=0.4)
    for r in dq.collect():
        e = mfs.explain(q2, r["docid"])
        assert e["match"] and e["value"] == r["score"]


def test_per_field_similarity_wrapper(mf):
    """PerFieldSimilarityWrapper analog: a field override routes that
    field's leaves through its own Similarity while other fields keep
    the default — a fielded term query under the wrapper is
    bit-identical to a plain searcher over that field's index with
    the same Similarity installed."""
    from lucenenet_spark.functions.similarity import ClassicSimilarity

    _, idx = mf
    mfs = MultiFieldSearcher(idx, similarity_by_field={"title": ClassicSimilarity()})
    wrapped = [
        (r["docid"], r["score"])
        for r in mfs.search_df(TermQuery(term="spark", field="title"), 5).collect()
    ]
    direct = IndexSearcher(idx["title"], similarity=ClassicSimilarity())
    expect = [(h.docid, h.score) for h in direct.search(TermQuery(term="spark"), 5)]
    assert wrapped == expect
    # the body field still scores BM25 (default)
    body = [
        (r["docid"], r["score"])
        for r in mfs.search_df(TermQuery(term="spark", field="body"), 5).collect()
    ]
    bm25 = IndexSearcher(idx["body"])
    assert body == [(h.docid, h.score) for h in bm25.search(TermQuery(term="spark"), 5)]
