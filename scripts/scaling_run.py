"""spark-submit entry for one scaling-efficiency run (north rule:
"runs via spark-submit --py-files at N and 4N executors").

The master/core count comes from spark-submit; this script only reads
the pre-generated input-shaped corpus, builds + persists the full
index (the timed section), runs the reference query set once, and
writes one JSON result file.

Submitted as:
  spark-submit --master local[N] --py-files lucenenet_spark.zip \
      scripts/scaling_run.py --corpus ... --warehouse ... --out ...
"""

from __future__ import annotations

import argparse
import json
import shutil
import time

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", required=True)
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from lucenenet_spark.index.builder import CorpusSpec, InvertedIndex, build_index
    from lucenenet_spark.search.reference_queries import reference_query_set
    from lucenenet_spark.search.searcher import IndexSearcher

    spark = SparkSession.builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    cores = spark.sparkContext.defaultParallelism

    corpus = spark.read.parquet(args.corpus)
    n_docs = corpus.count()

    # min-of-3: the sandbox VM sees host-level steal spikes; the
    # minimum is the robust estimator of actual throughput capability
    runs = []
    for _ in range(args.runs):
        shutil.rmtree(args.warehouse, ignore_errors=True)
        t0 = time.perf_counter()
        idx = build_index(spark, corpus, CorpusSpec())
        idx.save(args.warehouse)
        runs.append(time.perf_counter() - t0)
        idx.unpersist()
    build_sec = min(runs)

    searcher = IndexSearcher(InvertedIndex.load(spark, args.warehouse))
    qset = reference_query_set()
    searcher.search(qset["term_head"], 10)  # warmup
    tq = time.perf_counter()
    top1 = {}
    for name, q in qset.items():
        hits = searcher.search(q, 10)
        top1[name] = [(h.docid, float(h.score)) for h in hits[:3]]
    query_sec = time.perf_counter() - tq

    with open(args.out, "w") as f:
        json.dump(
            {
                "cores": cores,
                "n_docs": n_docs,
                "build_sec": round(build_sec, 3),
                "build_runs_sec": [round(r, 3) for r in runs],
                "docs_per_sec": round(n_docs / build_sec, 1),
                "query_suite_sec": round(query_sec, 3),
                "top3": top1,  # cross-checked between runs: results must
                # be identical at every parallelism (TestSameScoresWithThreads)
            },
            f,
        )
    spark.stop()


if __name__ == "__main__":
    main()
