"""Scaling-efficiency harness: the same spark-submit --py-files job at
local[8] (N) and local[32] (4N) over the same input; reports throughput
at both plus efficiency = (thr_4N / thr_N) / 4 and verifies the top-3
hits of every reference query are IDENTICAL across parallelism levels
(the reference's TestSameScoresWithThreads invariant).

Usage: python scripts/run_scaling.py [--n-docs 40000] [--small 8] [--big 32]
Writes /tmp/lucenenet_bench/scaling.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import zipfile

sys.path.insert(0, "/root/repo")

import pyspark


def spark_submit_path() -> str:
    return os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")


def make_zip(out: str) -> str:
    root = "/root/repo"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, _dirnames, filenames in os.walk(os.path.join(root, "lucenenet_spark")):
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    return out


def run_one(cores: int, corpus: str, zip_path: str, out: str, runs: int = 3) -> dict:
    # taskset pins the WHOLE process tree (JVM + python workers) to
    # exactly `cores` cpus — without it the small-N leg borrows the
    # idle cores for JVM shuffle/GC threads and the measured ratio
    # understates true cluster-size scaling. With it, "local[N] on N
    # cpus" is a faithful N-core-cluster emulation.
    cmd = [
        "taskset", "-c", f"0-{cores - 1}",
        spark_submit_path(),
        "--master", f"local[{cores}]",
        "--driver-memory", "8g",
        "--conf", f"spark.sql.shuffle.partitions={cores}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.sql.execution.arrow.pyspark.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--conf", "spark.executorEnv.OMP_NUM_THREADS=1",
        "--conf", "spark.executorEnv.OPENBLAS_NUM_THREADS=1",
        "--conf", "spark.executorEnv.MKL_NUM_THREADS=1",
        "--py-files", zip_path,
        "scripts/scaling_run.py",
        "--corpus", corpus,
        "--warehouse", f"/tmp/lucenenet_bench/scale_wh_{cores}",
        "--out", out,
        "--runs", str(runs),
    ]
    print(f"--- spark-submit local[{cores}] ---", flush=True)
    res = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    if res.returncode != 0:
        print(res.stdout[-3000:])
        print(res.stderr[-3000:])
        raise SystemExit(f"spark-submit local[{cores}] failed")
    with open(out) as f:
        return json.load(f)


def main() -> None:
    ap = argparse.ArgumentParser()
    # N=4 vs 4N=16: the sandbox VM's effective host capacity tops out
    # around ~17-20 cores (steal under load), so 16 is the largest 4N
    # that can still show real scaling; local[32] is capacity-capped.
    ap.add_argument("--n-docs", type=int, default=200000)
    ap.add_argument("--small", type=int, default=4)
    ap.add_argument("--big", type=int, default=16)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    os.makedirs("/tmp/lucenenet_bench", exist_ok=True)
    corpus = f"/tmp/lucenenet_bench/corpus_{args.n_docs}_s42.parquet"
    if not os.path.exists(corpus):
        from lucenenet_spark.session import get_spark
        from lucenenet_spark.sources.synthetic import synthetic_corpus

        spark = get_spark(app_name="corpus-gen")
        synthetic_corpus(spark, args.n_docs).write.mode("overwrite").parquet(corpus)
        spark.stop()

    zip_path = make_zip("/tmp/lucenenet_bench/lucenenet_spark.zip")
    small = run_one(args.small, corpus, zip_path,
                    f"/tmp/lucenenet_bench/scale_{args.small}.json", args.runs)
    big = run_one(args.big, corpus, zip_path,
                  f"/tmp/lucenenet_bench/scale_{args.big}.json", args.runs)

    identical = small["top3"] == big["top3"]
    eff = (big["docs_per_sec"] / small["docs_per_sec"]) / (args.big / args.small)
    summary = {
        "n_docs": args.n_docs,
        "small": small,
        "big": big,
        "ratio": args.big / args.small,
        "scaling_efficiency": round(eff, 3),
        "results_identical_across_parallelism": identical,
    }
    with open("/tmp/lucenenet_bench/scaling.json", "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
