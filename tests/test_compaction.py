"""Compaction: shard merge + tombstone purge (the tiered-merge role)."""

from __future__ import annotations

import os

import pytest

from lucenenet_spark.index import CorpusSpec
from lucenenet_spark.index.checkpoint import check_index, read_manifest
from lucenenet_spark.index.compaction import compact_shards
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.streaming import append_batch, delete_docs, load_live

SPEC = CorpusSpec(
    text_col="content",
    order_cols=("repo", "path", "commit"),
    meta_cols=("repo", "path"),
)


@pytest.fixture()
def fragmented(spark, corpus_rows, tmp_path):
    path = str(tmp_path / "frag_idx")
    third = len(corpus_rows) // 3
    for bid, lo in enumerate(range(0, len(corpus_rows), third)):
        batch = corpus_rows[lo : lo + third]
        if batch:
            append_batch(spark.createDataFrame(batch), path, SPEC, batch_id=bid)
    return path


def test_compaction_merges_and_purges(spark, fragmented):
    path = fragmented
    idx, _ = load_live(spark, path)
    before = IndexSearcher(idx)
    q = TermQuery(term="return")
    top_before = before.search(q, 10)
    victim = top_before[0].docid
    delete_docs(spark, path, [victim])

    rec = compact_shards(spark, path)
    manifest = read_manifest(path)
    assert list(manifest) == [rec["shard"]]  # single surviving shard
    assert not os.path.exists(os.path.join(path, "tombstones"))

    idx2, tombs = load_live(spark, path)
    assert tombs is None
    after = IndexSearcher(idx2)
    hits = after.search(q, 10)
    assert victim not in [h.docid for h in hits]
    # surviving rank order preserved (scores shift: maxDoc dropped by 1)
    assert [h.docid for h in top_before[1:6]] == [h.docid for h in hits[:5]]
    # stats now exclude the deleted doc, like a Lucene merge
    assert idx2.max_doc == idx.max_doc - 1
    # counters still reconcile CheckIndex-style
    report = check_index(spark, path)
    assert all(v["ok"] for v in report.values())


def test_compaction_without_tombstones_is_pure_merge(spark, fragmented):
    path = fragmented
    idx, _ = load_live(spark, path)
    s = IndexSearcher(idx)
    q = TermQuery(term="value")
    before = [(h.docid, h.score) for h in s.search(q, 10)]
    compact_shards(spark, path)
    idx2, _ = load_live(spark, path)
    after = [(h.docid, h.score) for h in IndexSearcher(idx2).search(q, 10)]
    assert before == after  # pure merge: identical docids AND score bits
