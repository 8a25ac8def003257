"""Per-row content sha256 invariant (BASELINE.json input_hint)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lucenenet_spark.index import CorpusSpec, build_index
from lucenenet_spark.index.builder import verify_content_sha

SPEC = CorpusSpec(text_col="content", order_cols=("repo", "path", "commit"))


def test_verify_passes_on_intact_corpus(spark, corpus_rows, spark_index):
    corpus = spark.createDataFrame(corpus_rows)
    n_docs, n_mismatch = verify_content_sha(corpus, spark_index, SPEC)
    assert n_docs == len(corpus_rows)
    assert n_mismatch == 0


def test_verify_detects_tampered_content(spark, corpus_rows, spark_index):
    corpus = spark.createDataFrame(corpus_rows)
    tampered = corpus.withColumn(
        "content",
        F.when(F.col("path").contains("_7."), F.concat(F.col("content"), F.lit(" X")))
        .otherwise(F.col("content")),
    )
    n_changed = tampered.where(F.col("path").contains("_7.")).count()
    assert n_changed > 0
    _, n_mismatch = verify_content_sha(tampered, spark_index, SPEC)
    assert n_mismatch == n_changed


def test_verify_detects_dropped_rows(spark, corpus_rows, spark_index):
    corpus = spark.createDataFrame(corpus_rows[:-5])
    # NOTE: dropping rows shifts docids of everything after the gap in
    # the recomputed assignment, so mismatches >= the dropped count
    _, n_mismatch = verify_content_sha(corpus, spark_index, SPEC)
    assert n_mismatch >= 5
