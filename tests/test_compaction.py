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


def test_append_after_compaction_never_reuses_docids(spark, fragmented, corpus_rows):
    """Regression: docBase must be the docid high-water mark, not the
    sum of per-shard doc counts — after a tombstoned compaction the
    surviving docids are sparse, and a count-sum base would hand a new
    document an existing docid (postings merge across documents)."""
    path = fragmented
    idx, _ = load_live(spark, path)
    s = IndexSearcher(idx)
    victims = [h.docid for h in s.search(TermQuery(term="return"), 5)]
    delete_docs(spark, path, victims)
    compact_shards(spark, path)

    old_ids = {r["docid"] for r in load_live(spark, path)[0].docs.select("docid").collect()}
    append_batch(spark.createDataFrame(corpus_rows[:20]), path, SPEC, batch_id=99)
    idx2, _ = load_live(spark, path)
    all_ids = [r["docid"] for r in idx2.docs.select("docid").collect()]
    assert len(all_ids) == len(set(all_ids))  # no collisions
    assert min(set(all_ids) - old_ids) > max(old_ids)  # strictly above the mark
    report = check_index(spark, path)
    assert all(v["ok"] for v in report.values())


def test_crash_between_commit_and_retire_does_not_double_docs(spark, fragmented):
    """Crash window: the compacted shard's manifest is committed but
    the superseded inputs were not yet removed. Readers must see ONLY
    the compacted shard (supersedes metadata), and gc reclaims the
    leftovers."""
    import json
    import shutil

    from lucenenet_spark.index.checkpoint import gc_orphan_shards

    path = fragmented
    n_docs = load_live(spark, path)[0].max_doc
    old = read_manifest(path)
    # snapshot old shards + manifests, compact, then restore them to
    # simulate the crash-before-retire state
    snap = {}
    for shard in old:
        with open(os.path.join(path, "manifest", f"shard_{shard}.json")) as f:
            snap[shard] = f.read()
        shutil.copytree(
            os.path.join(path, "shards", str(shard)),
            os.path.join(path, "_snap", str(shard)),
        )
    rec = compact_shards(spark, path)
    assert sorted(rec["supersedes"]) == sorted(old)
    for shard, txt in snap.items():
        with open(os.path.join(path, "manifest", f"shard_{shard}.json"), "w") as f:
            f.write(txt)
        shutil.copytree(
            os.path.join(path, "_snap", str(shard)),
            os.path.join(path, "shards", str(shard)),
        )
    # stale inputs present on disk, but readers ignore them
    assert sorted(read_manifest(path)) == [rec["shard"]]
    assert load_live(spark, path)[0].max_doc == n_docs
    removed = gc_orphan_shards(path)
    assert len(removed) == 2 * len(old)
    assert sorted(read_manifest(path)) == [rec["shard"]]


def test_orphan_shard_dir_is_invisible(spark, fragmented):
    """A shard directory with no manifest (crash between data write and
    manifest commit) must not be read."""
    path = fragmented
    n_docs = load_live(spark, path)[0].max_doc
    import shutil

    shutil.copytree(
        os.path.join(path, "shards", "0"), os.path.join(path, "shards", "7")
    )
    assert load_live(spark, path)[0].max_doc == n_docs  # orphan ignored
    from lucenenet_spark.index.checkpoint import gc_orphan_shards

    assert gc_orphan_shards(path) == [os.path.join(path, "shards", "7")]


def test_tiered_compaction_merges_only_small_shards(spark, corpus_rows, tmp_path):
    """TieredMergePolicy analog: with max_merge_docs, only shards at or
    below the threshold merge; the large shard is untouched (its
    manifest survives) and results are identical to before."""
    path = str(tmp_path / "tiered_idx")
    big, rest = corpus_rows[:120], corpus_rows[120:]
    append_batch(spark.createDataFrame(big), path, SPEC, batch_id=0)
    third = max(len(rest) // 3, 1)
    for bid, lo in enumerate(range(0, len(rest), third), start=1):
        batch = rest[lo : lo + third]
        if batch:
            append_batch(spark.createDataFrame(batch), path, SPEC, batch_id=bid)
    before_manifest = read_manifest(path)
    small_ids = [s for s, r in before_manifest.items() if r["docs"] <= third]
    assert len(small_ids) >= 2 and 0 not in small_ids
    idx0, _ = load_live(spark, path)
    q = TermQuery(term="return")
    before = [(h.docid, h.score) for h in IndexSearcher(idx0).search(q, 10)]

    rec = compact_shards(spark, path, max_merge_docs=third)
    after_manifest = read_manifest(path)
    assert 0 in after_manifest  # the big shard survived untouched
    assert sorted(rec["supersedes"]) == sorted(small_ids)
    assert sorted(after_manifest) == sorted([0, rec["shard"]])
    idx1, _ = load_live(spark, path)
    after = [(h.docid, h.score) for h in IndexSearcher(idx1).search(q, 10)]
    assert before == after  # pure merge: identical docids AND score bits
    report = check_index(spark, path)
    assert all(v["ok"] for v in report.values())


def test_tiered_compaction_keeps_tombstones_for_unmerged_shards(spark, corpus_rows, tmp_path):
    """A tombstoned docid living in an UNMERGED shard must stay hidden
    after a partial compaction (tombstones only retire on full merge)."""
    path = str(tmp_path / "tiered_tomb")
    append_batch(spark.createDataFrame(corpus_rows[:120]), path, SPEC, batch_id=0)
    append_batch(spark.createDataFrame(corpus_rows[120:150]), path, SPEC, batch_id=1)
    append_batch(spark.createDataFrame(corpus_rows[150:180]), path, SPEC, batch_id=2)
    delete_docs(spark, path, [0])  # docid 0 lives in the BIG shard
    compact_shards(spark, path, max_merge_docs=40)
    idx, tombs = load_live(spark, path)
    assert tombs is not None  # tombstones survived the partial merge
    s = IndexSearcher(idx, tombstones=tombs)
    assert 0 not in {r["docid"] for r in s.scored_docs(TermQuery(term="return")).collect()}
    # a later FULL merge purges them
    compact_shards(spark, path)
    idx2, tombs2 = load_live(spark, path)
    assert tombs2 is None
    assert 0 not in {r["docid"] for r in idx2.docs.select("docid").collect()}


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


def test_supersedes_is_transitive_across_chained_compactions(spark, fragmented):
    """ADVICE r2 regression: compaction A commits (supersedes [1,2])
    but crashes before retiring the stale inputs; compaction B then
    retires A's record. Without carrying A's dead set forward, the
    stale manifests of 1,2 resurrect and documents double-count."""
    import shutil

    path = fragmented
    n_docs = load_live(spark, path)[0].max_doc
    old = read_manifest(path)
    snap = {}
    for shard in old:
        with open(os.path.join(path, "manifest", f"shard_{shard}.json")) as f:
            snap[shard] = f.read()
        shutil.copytree(
            os.path.join(path, "shards", str(shard)),
            os.path.join(path, "_snap2", str(shard)),
        )
    rec_a = compact_shards(spark, path)
    # simulate crash-before-retire: restore stale inputs of A
    for shard, txt in snap.items():
        with open(os.path.join(path, "manifest", f"shard_{shard}.json"), "w") as f:
            f.write(txt)
        shutil.copytree(
            os.path.join(path, "_snap2", str(shard)),
            os.path.join(path, "shards", str(shard)),
        )
    # compaction B over the live set (= just A's shard)
    rec_b = compact_shards(spark, path)
    # B's record must carry A's dead set forward...
    assert set(rec_a["supersedes"]) <= set(rec_b["supersedes"])
    # ...so the stale shards stay invisible even though A's record is
    # gone, and the doc count stays exact
    assert sorted(read_manifest(path)) == [rec_b["shard"]]
    assert load_live(spark, path)[0].max_doc == n_docs
