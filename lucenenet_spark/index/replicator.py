"""Replicator — Lucene.Net.Replicator re-expressed over the sharded
parquet warehouse.

Reference semantics: ``Lucene.Net.Replicator/IndexRevision.cs:38`` (a
revision is an IndexCommit's immutable file set), ``Replicator/
ReplicationClient.cs:40`` (``UpdateNow`` polls the publisher, diffs
the revision's file list against local files, copies ONLY missing
files, then the handler switches atomically), and
``Replicator/IndexReplicationHandler.cs:30`` (copy-then-sync; obsolete
files cleaned up only after the switch).

Spark-native shape: the replication unit is a SHARD, not a file — a
shard is immutable once its manifest record commits (like a flushed
Lucene segment), so record-level diff by ``(shard, fingerprint)`` is
exact. Copy order mirrors the builder's own crash discipline: shard
data lands first (staged to a tmp dir, swapped in atomically), the
manifest record commits last (tmp+rename) — a crashed replication is
invisible to readers of the destination and simply resumes on the
next ``update_now``. The byte copy itself runs as a Spark job over
the file list (``parallelize(files).foreachPartition``), so on a real
cluster the traffic is executor-parallel store-to-store, never
driver-funneled; at 100 TB each task streams a bounded slice of
files. Tombstones (the liveDocs analog) replicate by staged atomic
swap of the whole table — they are tiny relative to shards and the
set-replace matches ``IndexReplicationHandler``'s treatment of the
del-gen files.

Deliberate divergence: the reference client deletes obsolete local
files as soon as the new revision is live. Here, shards superseded by
a compaction are hidden by the replicated record's ``supersedes``
list the instant the record commits (``read_manifest`` filters them),
and their bytes are reclaimed by ``gc_orphan_shards`` — same
visibility semantics, garbage collection decoupled from the switch.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import SparkSession

from lucenenet_spark.index.checkpoint import (
    _write_manifest_atomic,
    gc_orphan_shards,
    read_manifest,
)


def snapshot(path: str) -> dict:
    """Point-in-time revision of a sharded warehouse — the IRevision
    analog. ``version`` hashes the sorted live (shard, fingerprint)
    pairs, so two snapshots compare equal iff the visible index state
    is identical; ``shards`` carries the full lineage records
    (including ``supersedes``) for the client to commit verbatim."""
    manifest = read_manifest(path)
    pairs = sorted(
        (int(s), str(rec.get("fingerprint", ""))) for s, rec in manifest.items()
    )
    tpath = os.path.join(path, "tombstones")
    tfiles = _list_files(tpath) if os.path.isdir(tpath) else []
    version = hashlib.sha256(
        json.dumps([pairs, tfiles]).encode()
    ).hexdigest()[:16]
    return {"version": version, "shards": {int(s): rec for s, rec in manifest.items()}}


def _list_files(root: str) -> list[tuple[str, int]]:
    out = []
    for dirpath, _, names in os.walk(root):
        for n in names:
            p = os.path.join(dirpath, n)
            out.append((os.path.relpath(p, root), os.path.getsize(p)))
    return sorted(out)


def _copy_tree_distributed(
    spark: SparkSession, src_root: str, dst_root: str
) -> tuple[int, int]:
    """Copy every file under src_root to dst_root as a Spark job —
    one task copies a slice of the file list (ReplicationClient's
    per-file copy loop, parallelized). Returns (n_files, n_bytes)."""
    files = _list_files(src_root)
    if not files:
        os.makedirs(dst_root, exist_ok=True)
        return 0, 0

    def _copy(batch):
        for rel, _ in batch:
            s, d = os.path.join(src_root, rel), os.path.join(dst_root, rel)
            os.makedirs(os.path.dirname(d), exist_ok=True)
            shutil.copyfile(s, d)

    n_slices = min(len(files), 32)
    spark.sparkContext.parallelize(files, n_slices).foreachPartition(_copy)
    return len(files), sum(sz for _, sz in files)


def _swap_in(tmp: str, final: str) -> None:
    """Atomically promote a fully-staged directory. If a previous
    (stale-fingerprint) copy exists it is moved aside first so readers
    never observe a half-copied shard under a committed manifest."""
    aside = final + ".replaced"
    if os.path.exists(aside):
        shutil.rmtree(aside)
    if os.path.exists(final):
        os.rename(final, aside)
    os.rename(tmp, final)
    if os.path.exists(aside):
        shutil.rmtree(aside)


def replicate(
    spark: SparkSession,
    src: str,
    dst: str,
    revision: dict | None = None,
) -> dict:
    """One ``ReplicationClient.UpdateNow`` cycle: bring ``dst`` to the
    given source ``revision`` (default: ``snapshot(src)`` now).

    Incremental by construction — a shard already present at ``dst``
    with the same fingerprint is skipped; a rebuilt shard (same id,
    new fingerprint) is re-copied and swapped; tombstones are synced
    last so a replicated delete never outruns the shard that holds the
    doc. Returns counters: ``{version, copied, skipped, replaced,
    retired, files, bytes, changed}``."""
    rev = revision if revision is not None else snapshot(src)
    dst_manifest = read_manifest(dst)

    copied, replaced, skipped = [], [], []
    n_files = n_bytes = 0
    for shard in sorted(rev["shards"]):
        rec = rev["shards"][shard]
        have = dst_manifest.get(shard)
        if have is not None and have.get("fingerprint") == rec.get("fingerprint"):
            skipped.append(shard)
            continue
        src_dir = os.path.join(src, "shards", str(shard))
        dst_dir = os.path.join(dst, "shards", str(shard))
        tmp = dst_dir + ".repl_tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)  # resume from a crashed copy: restart the stage
        f, b = _copy_tree_distributed(spark, src_dir, tmp)
        _swap_in(tmp, dst_dir)
        # data is on disk — now, and only now, the record commits
        _write_manifest_atomic(dst, shard, rec)
        (replaced if have is not None else copied).append(shard)
        n_files += f
        n_bytes += b

    # Shards live at dst but absent from the source revision: the
    # source dropped them WITHOUT a superseding record (compactions
    # carry supersedes inside the replicated records and are hidden
    # already). Retire their manifests after the new state committed.
    retired = []
    for shard in sorted(set(dst_manifest) - set(rev["shards"])):
        mp = os.path.join(dst, "manifest", f"shard_{shard}.json")
        if os.path.exists(mp):
            os.remove(mp)
        retired.append(shard)
    if retired or replaced:
        gc_orphan_shards(dst)

    # tombstones: staged atomic set-replace (liveDocs del-gen analog)
    spath, dpath = os.path.join(src, "tombstones"), os.path.join(dst, "tombstones")
    tombs_changed = False
    if os.path.isdir(spath):
        if _list_files(spath) != (_list_files(dpath) if os.path.isdir(dpath) else []):
            tmp = dpath + ".repl_tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            f, b = _copy_tree_distributed(spark, spath, tmp)
            _swap_in(tmp, dpath)
            n_files += f
            n_bytes += b
            tombs_changed = True
    elif os.path.isdir(dpath):
        # source purged its tombstones (compaction folded them in)
        shutil.rmtree(dpath)
        tombs_changed = True

    return {
        "version": rev["version"],
        "copied": copied,
        "replaced": replaced,
        "skipped": skipped,
        "retired": retired,
        "files": n_files,
        "bytes": n_bytes,
        "changed": bool(copied or replaced or retired or tombs_changed),
    }


def update_now(spark: SparkSession, src: str, dst: str) -> dict:
    """Poll-and-sync (ReplicationClient.UpdateNow): no-op fast path
    when the destination already holds the source revision."""
    rev = snapshot(src)
    if snapshot(dst)["version"] == rev["version"]:
        return {"version": rev["version"], "changed": False}
    return replicate(spark, src, dst, rev)
