"""NRT ingest: micro-batch appends, idempotent retries, tombstone
deletes, point-in-time reads (SURVEY.md §2.10)."""

from __future__ import annotations

import pytest

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.index.checkpoint import read_manifest
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.streaming import (
    append_batch,
    delete_docs,
    load_live,
    stream_index,
)

SPEC = CorpusSpec(
    text_col="content",
    order_cols=("repo", "path", "commit"),
    meta_cols=("repo", "path"),
)


@pytest.fixture(scope="module")
def nrt_path(spark, corpus_rows, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nrt_idx"))
    half = len(corpus_rows) // 2
    b0 = spark.createDataFrame(corpus_rows[:half])
    b1 = spark.createDataFrame(corpus_rows[half:])
    append_batch(b0, path, SPEC, batch_id=0)
    append_batch(b1, path, SPEC, batch_id=1)
    return path


def test_batches_become_shards_with_docbases(spark, nrt_path, corpus_rows):
    manifest = read_manifest(nrt_path)
    assert sorted(manifest) == [0, 1]
    half = len(corpus_rows) // 2
    assert manifest[0]["doc_base"] == 0 and manifest[0]["docs"] == half
    assert manifest[1]["doc_base"] == half
    assert manifest[0]["docs"] + manifest[1]["docs"] == len(corpus_rows)


def test_append_is_idempotent_per_batch(spark, nrt_path, corpus_rows):
    before = read_manifest(nrt_path)
    rec = append_batch(
        spark.createDataFrame(corpus_rows[: len(corpus_rows) // 2]),
        nrt_path, SPEC, batch_id=0,
    )
    assert rec["shard"] == 0  # retry returned the existing record
    assert read_manifest(nrt_path) == before


def test_live_reader_matches_batch_build(spark, nrt_path, corpus_rows):
    idx, tombs = load_live(spark, nrt_path)
    assert tombs is None
    live = IndexSearcher(idx)
    hits = live.search(TermQuery(term="return"), 10)
    assert len(hits) == 10
    # batch-ordering caveat: streaming doc order is per-batch, so
    # compare against a batch build over the SAME per-batch order
    assert idx.max_doc == len(corpus_rows)


def test_tombstone_deletes_hide_docs(spark, nrt_path):
    idx, _ = load_live(spark, nrt_path)
    s = IndexSearcher(idx)
    top = s.search(TermQuery(term="return"), 3)
    victim = top[0].docid
    delete_docs(spark, nrt_path, [victim])
    idx2, tombs = load_live(spark, nrt_path)
    assert tombs is not None
    s2 = IndexSearcher(idx2, tombstones=tombs)
    after = s2.search(TermQuery(term="return"), 10)
    assert victim not in [h.docid for h in after]
    # surviving ranks preserved (scores unchanged — maxDoc still counts
    # the deleted doc, like the reference until merge)
    assert [h.docid for h in top[1:3]] == [h.docid for h in after[:2]]


def test_stream_index_files_source(spark, corpus_rows, tmp_path_factory):
    src = tmp_path_factory.mktemp("stream_src")
    path = str(tmp_path_factory.mktemp("stream_idx"))
    df = spark.createDataFrame(corpus_rows[:60])
    df.coalesce(2).write.mode("overwrite").parquet(str(src / "in"))
    stream = (
        spark.readStream.schema(df.schema).parquet(str(src / "in"))
    )
    q = stream_index(stream, path, SPEC)
    q.awaitTermination(120)
    manifest = read_manifest(path)
    assert sum(m["docs"] for m in manifest.values()) == 60
    idx, _ = load_live(spark, path)
    assert idx.max_doc == 60
