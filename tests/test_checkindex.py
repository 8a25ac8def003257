"""CheckIndex analog: a clean build passes every invariant; synthetic
corruption (docs-table rows missing for live postings) is detected."""

from __future__ import annotations

from dataclasses import replace

from pyspark.sql import functions as F

from lucenenet_spark.index.checkindex import CHECKS, check_index


def test_check_index_clean_build_all_ok(spark_index):
    rows = {r["check"]: r for r in check_index(spark_index).collect()}
    assert set(rows) == set(CHECKS)
    assert all(r["ok"] for r in rows.values())
    assert rows["doc_count"]["observed"] == 200
    assert rows["freq_positions_mismatch"]["observed"] == 0
    assert rows["sum_tf"]["observed"] > 0


def test_check_index_detects_orphan_postings(spark_index):
    # drop one doc's stored row while its postings stay live
    victim = spark_index.docs.select(F.min("docid")).first()[0]
    broken = replace(
        spark_index, docs=spark_index.docs.where(F.col("docid") != victim), flat=None
    )
    rows = {r["check"]: r for r in check_index(broken).collect()}
    assert rows["orphan_postings"]["observed"] == 1
    assert not rows["orphan_postings"]["ok"]
    assert rows["doc_count"]["observed"] == 199


def test_check_index_detects_norm_tamper(spark_index):
    tampered_docs = spark_index.docs.withColumn(
        "norm",
        F.when(F.col("docid") == 0, F.lit(255)).otherwise(F.col("norm")),
    )
    broken = replace(spark_index, docs=tampered_docs, flat=None)
    rows = {r["check"]: r for r in check_index(broken).collect()}
    assert rows["norm_mismatch"]["observed"] >= 1
    assert not rows["norm_mismatch"]["ok"]
