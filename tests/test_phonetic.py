"""Soundex pinned spec: python == DuckDB == Spark Column, plus the
PhoneticQuery search path (reference Analysis.Phonetic/Language/
Soundex.cs test vectors where the H/W-separator variant agrees)."""

from __future__ import annotations

import duckdb
import pytest

from lucenenet_spark.analysis.phonetic import soundex_col, soundex_py, soundex_sql

VECTORS = {
    # classic Russell/Odell published examples (H/W-separator-safe)
    "Robert": "R163",
    "Rupert": "R163",
    "Tymczak": "T522",
    "Pfister": "P236",
    "Honeyman": "H555",
    "Washington": "W252",
    "Lee": "L000",
    "Gutierrez": "G362",
    "Jackson": "J250",
    "merge": "M620",
    "merj": "M620",
    "": "",
    "x1!2y": "X000",
}


def test_soundex_python_vectors():
    for name, want in VECTORS.items():
        assert soundex_py(name) == want, name


def test_soundex_duckdb_matches_python():
    names = list(VECTORS) + ["aeiouy", "hw", "bpbp", "ccgg", "zzzz"]
    rows = duckdb.connect().execute(
        f"SELECT name, {soundex_sql('name')} FROM (SELECT unnest(?) AS name)",
        [names],
    ).fetchall()
    for name, got in rows:
        assert got == soundex_py(name), name


def test_soundex_spark_matches_python(spark):
    from pyspark.sql import functions as F

    names = list(VECTORS) + ["aeiouy", "hw", "bpbp", "ccgg", "zzzz"]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    for r in df.select("name", soundex_col(F.col("name")).alias("sx")).collect():
        assert r.sx == soundex_py(r.name), r.name


def test_phonetic_query_search(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.queries import PhoneticQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    df = spark.createDataFrame(
        [
            ("r", "a", "c", "merge sort"),
            ("r", "b", "c", "murj again"),
            ("r", "c", "c", "nothing here"),
        ],
        "repo string, path string, commit string, content string",
    )
    s = IndexSearcher(
        build_index(spark, df, CorpusSpec(order_cols=("repo", "path", "commit"))).cache()
    )
    hits = s.search(PhoneticQuery(name="merj"), 10)
    assert sorted(h.docid for h in hits) == [0, 1]  # merge + murj
