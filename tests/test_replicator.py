"""Replicator: revision snapshot, incremental shard diff-copy, atomic
switch, tombstone sync, retirement (Lucene.Net.Replicator roles:
ReplicationClient.UpdateNow / IndexRevision / IndexReplicationHandler)."""

from __future__ import annotations

import os

import pytest

from lucenenet_spark.index import CorpusSpec
from lucenenet_spark.index.checkpoint import read_manifest
from lucenenet_spark.index.compaction import compact_shards
from lucenenet_spark.index.replicator import replicate, snapshot, update_now
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.streaming import append_batch, delete_docs, load_live

SPEC = CorpusSpec(
    text_col="content",
    order_cols=("repo", "path", "commit"),
    meta_cols=("repo", "path"),
)


@pytest.fixture()
def primary(spark, corpus_rows, tmp_path):
    path = str(tmp_path / "primary")
    half = len(corpus_rows) // 2
    append_batch(spark.createDataFrame(corpus_rows[:half]), path, SPEC, batch_id=0)
    append_batch(spark.createDataFrame(corpus_rows[half:]), path, SPEC, batch_id=1)
    return path


def _top(spark, path, term="return", k=10):
    idx, tombs = load_live(spark, path)
    s = IndexSearcher(idx, tombstones=tombs)
    return [(h.docid, h.score) for h in s.search(TermQuery(term=term), k)]


def test_replicate_then_incremental(spark, primary, tmp_path):
    replica = str(tmp_path / "replica")
    r1 = replicate(spark, primary, replica)
    assert r1["changed"] and r1["files"] > 0 and not r1["skipped"]
    assert _top(spark, replica) == _top(spark, primary)
    assert snapshot(replica)["version"] == snapshot(primary)["version"]

    # no-op poll: nothing copied
    r2 = update_now(spark, primary, replica)
    assert r2["changed"] is False

    # incremental: new batch at primary -> only the new shard ships
    extra = [("r9", f"p{i}", "c", "fresh replicated shard content return")
             for i in range(4)]
    append_batch(spark.createDataFrame(
        extra, "repo string, path string, commit string, content string"
    ), primary, SPEC, batch_id=2)
    before = set(read_manifest(replica))
    r3 = update_now(spark, primary, replica)
    assert r3["changed"] and set(r3["copied"]) == set(read_manifest(primary)) - before
    assert set(r3["skipped"]) == before
    assert _top(spark, replica) == _top(spark, primary)


def test_replicate_tombstones_and_compaction(spark, primary, tmp_path):
    replica = str(tmp_path / "replica")
    replicate(spark, primary, replica)

    victim = _top(spark, primary)[0][0]
    delete_docs(spark, primary, [victim])
    r = update_now(spark, primary, replica)
    assert r["changed"]  # tombstone-only change is detected
    assert victim not in [d for d, _ in _top(spark, replica)]

    # compaction at the primary: replica retires superseded shards
    compact_shards(spark, primary)
    r2 = update_now(spark, primary, replica)
    assert r2["changed"]
    assert sorted(read_manifest(replica)) == sorted(read_manifest(primary))
    assert _top(spark, replica) == _top(spark, primary)
    # superseded shard dirs are gc'd at the replica
    live = {str(s) for s in read_manifest(replica)}
    on_disk = {d for d in os.listdir(os.path.join(replica, "shards"))
               if not d.endswith(".tmp")}
    assert on_disk == live


def test_point_in_time_revision(spark, primary, tmp_path):
    """Replicating a captured revision ignores later primary writes —
    the reference's session-pinned revision semantics."""
    rev = snapshot(primary)
    append_batch(spark.createDataFrame(
        [("rX", "pX", "c", "late arrival return")],
        "repo string, path string, commit string, content string",
    ), primary, SPEC, batch_id=7)
    replica = str(tmp_path / "replica_pit")
    r = replicate(spark, primary, replica, revision=rev)
    assert r["version"] == rev["version"]
    assert sorted(read_manifest(replica)) == sorted(rev["shards"])
    assert snapshot(primary)["version"] != rev["version"]
