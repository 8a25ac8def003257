"""Command-line index + search demo (Demo subproject role).

Reference: ``src/Lucene.Net.Demo/IndexFiles.cs`` (index every text
file under a directory, ``-u|--update`` to add to an existing index)
and ``src/Lucene.Net.Demo/SearchFiles.cs`` (Classic-parser queries,
paged top hits). Same two commands, Spark-native storage:

    python examples/demo.py index  <index_dir> <source_dir> [--update]
    python examples/demo.py search <index_dir> <query> [--page N] [--page-size K]

``index`` reads every regular file under <source_dir> as one document
(path = the stored identifier, like the demo's "path" StringField) and
appends it to the sharded index warehouse at <index_dir> with the
standard analyzer — a fresh warehouse on first run, one more immutable
shard with ``--update`` (the demo's ``-u`` add-documents mode, via the
same append path the streaming sink uses). ``search`` loads the live
warehouse, parses the query with the Classic parser, and prints one
page of hits (path + BM25 score) — the SearchFiles loop without the
interactive prompt.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from lucenenet_spark import get_spark

    return get_spark(master=os.environ.get("SPARK_GRAFT_MASTER", "local[*]"))


def cmd_index(index_dir: str, source_dir: str, update: bool = False) -> int:
    """IndexFiles.cs role: one document per file under source_dir."""
    from pyspark.sql import functions as F

    from lucenenet_spark.index import CorpusSpec
    from lucenenet_spark.streaming.ingest import append_batch

    if os.path.exists(index_dir) and not update:
        print(f"{index_dir} exists; pass -u/--update to add documents",
              file=sys.stderr)
        return 2
    spark = _spark()
    # wholetext: one row per file, column `value` = the file body;
    # _metadata.file_path is the path identifier (the demo's "path"
    # StringField) — unlike input_file_name(), the metadata column is
    # a real source column that survives shuffles/caching
    docs = (
        spark.read.option("wholetext", True)
        .option("recursiveFileLookup", True)
        .text(source_dir)
        .select(
            F.col("_metadata.file_path").alias("path"),
            F.col("value").alias("content"),
        )
    )
    # docids from the pinned path order (CorpusSpec.order_cols contract)
    spec = CorpusSpec(text_col="content", order_cols=("path",),
                      meta_cols=("path",))
    rec = append_batch(docs, index_dir, spec)
    print(
        f"shard {rec['shard']}: {rec['docs']} docs, {rec['terms']} terms"
        f" -> {index_dir}"
    )
    return 0


def cmd_search(index_dir: str, query: str, page: int = 1,
               page_size: int = 10) -> int:
    """SearchFiles.cs role: Classic-parser query, one page of hits."""
    from lucenenet_spark.search import IndexSearcher, parse_query
    from lucenenet_spark.streaming.ingest import load_live

    spark = _spark()
    idx, tombstones = load_live(spark, index_dir)
    s = IndexSearcher(idx)
    hits = s.search(parse_query(query), page * page_size)
    if tombstones is not None:
        dead = {r["docid"] for r in tombstones.collect()}
        hits = [h for h in hits if h.docid not in dead]
    page_hits = hits[(page - 1) * page_size:]
    paths = {
        r["docid"]: r["path"]
        for r in s.index.docs.select("docid", "path").collect()
    }
    print(f"{len(hits)} total matching documents (page {page})")
    for rank, h in enumerate(page_hits, start=(page - 1) * page_size + 1):
        print(f"{rank}. {paths.get(h.docid, h.docid)}  score={h.score:.4f}")
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    sub = p.add_subparsers(dest="cmd", required=True)
    pi = sub.add_parser("index", help="index all files under a directory")
    pi.add_argument("index_dir")
    pi.add_argument("source_dir")
    pi.add_argument("-u", "--update", action="store_true")
    ps = sub.add_parser("search", help="search a saved index")
    ps.add_argument("index_dir")
    ps.add_argument("query")
    ps.add_argument("--page", type=int, default=1)
    ps.add_argument("--page-size", type=int, default=10)
    a = p.parse_args(argv)
    if a.cmd == "index":
        return cmd_index(a.index_dir, a.source_dir, a.update)
    return cmd_search(a.index_dir, a.query, a.page, a.page_size)


if __name__ == "__main__":
    raise SystemExit(main())
