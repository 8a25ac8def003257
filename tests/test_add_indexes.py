"""IndexWriter.AddIndexes analog: graft pre-built indexes into a
sharded warehouse without re-analysis; scores == monolithic build."""

from __future__ import annotations

import pytest

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.index.addindexes import add_indexes
from lucenenet_spark.index.checkpoint import check_index, read_manifest
from lucenenet_spark.search.queries import PhraseQuery, TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.streaming import load_live

SPEC = CorpusSpec(
    text_col="content",
    order_cols=("repo", "path", "commit"),
    meta_cols=("path",),
)


@pytest.fixture()
def grafted(spark, corpus_rows, tmp_path):
    half = len(corpus_rows) // 2
    srcs = []
    for i, part in enumerate((corpus_rows[:half], corpus_rows[half:])):
        idx = build_index(spark, spark.createDataFrame(part), SPEC)
        p = str(tmp_path / f"src{i}")
        idx.save(p)
        srcs.append(p)
    wh = str(tmp_path / "wh")
    recs = add_indexes(spark, wh, srcs)
    return wh, recs


def test_add_indexes_scores_match_monolithic(spark, corpus_rows, grafted):
    wh, recs = grafted
    assert [r["shard"] for r in recs] == [0, 1]
    assert recs[1]["docid_offset"] > recs[0]["doc_max"]

    idx, tombs = load_live(spark, wh)
    merged = IndexSearcher(idx, tombstones=tombs)

    # monolithic build over the SAME concatenated corpus
    mono_idx = build_index(spark, spark.createDataFrame(corpus_rows), SPEC)
    mono = IndexSearcher(mono_idx)

    path_of_m = {r["docid"]: r["path"] for r in merged.index.docs.collect()}
    path_of_s = {r["docid"]: r["path"] for r in mono.index.docs.collect()}
    for q in (
        TermQuery(term="return"),
        TermQuery(term="value"),
        PhraseQuery(phrase_terms=("return", "value")),
    ):
        got = [(path_of_m[h.docid], h.score) for h in merged.search(q, 20)]
        want = [(path_of_s[h.docid], h.score) for h in mono.search(q, 20)]
        # same docs with bit-identical scores; order may differ only
        # within exact-score ties (docid tie-break values shift)
        assert sorted(got) == sorted(want)

    # lineage: counters reconcile CheckIndex-style on both shards
    report = check_index(spark, wh)
    assert all(v["ok"] for v in report.values())
    assert sorted(read_manifest(wh)) == [0, 1]


def test_add_indexes_then_append(spark, corpus_rows, grafted):
    """A grafted warehouse keeps working as a normal warehouse: new
    appends land above the grafted docid space."""
    from lucenenet_spark.streaming import append_batch

    wh, recs = grafted
    extra = [("rZ", "pZ", "c", "freshly appended return value doc")]
    rec = append_batch(
        spark.createDataFrame(
            extra, "repo string, path string, commit string, content string"
        ),
        wh, SPEC, batch_id=99,
    )
    assert rec["doc_base"] > recs[1]["doc_max"]
    idx, tombs = load_live(spark, wh)
    s = IndexSearcher(idx, tombstones=tombs)
    hits = {r["docid"] for r in s.search_df(
        PhraseQuery(phrase_terms=("appended", "return")), 5).collect()}
    assert hits == {rec["doc_base"]}
