"""ASCIIFoldingFilter analog: 3-dialect agreement + index round trip."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from lucenenet_spark.analysis.folding import fold_col, fold_py, fold_sql

CASES = [
    "café", "ÆON über naïve", "straße Łódź Œuvre", "plain ascii",
    "Ĳsselmeer", "ÀÉÎÕÜ àéîõü", "Señor Çelik Ğül Şahin",
]


def test_fold_duckdb_matches_python():
    rows = duckdb.connect().execute(
        f"SELECT s, {fold_sql('s')} FROM (SELECT unnest(?) AS s)", [CASES]
    ).fetchall()
    for s, got in rows:
        assert got == fold_py(s), s


def test_fold_spark_matches_python(spark):
    df = spark.createDataFrame([(c,) for c in CASES], "s string")
    for r in df.select("s", fold_col(F.col("s")).alias("f")).collect():
        assert r.f == fold_py(r.s), r.s


def test_folded_index_matches_plain(spark):
    """Inject accents, fold them back at build time: the index must be
    term-for-term identical to the plain build."""
    from lucenenet_spark.index.builder import CorpusSpec, build_index

    rows = [("r", "a", "c", "café straße merge"), ("r", "b", "c", "naïve sort")]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    folded = build_index(
        spark, df, CorpusSpec(order_cols=("repo", "path", "commit"), ascii_fold=True)
    )
    terms = {r.term for r in folded.term_stats.collect()}
    assert {"cafe", "strasse", "naive", "merge", "sort"} <= terms
    assert not any("é" in t or "ß" in t or "ï" in t for t in terms)
