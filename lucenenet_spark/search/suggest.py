"""Spellcheck / did-you-mean over the term dictionary (reference
``src/Lucene.Net.Suggest/Spell/SpellChecker.cs:50`` SuggestSimilar and
``Suggest/Analyzing/AnalyzingSuggester.cs:90`` prefix completion).

Both are dictionary scans — the reference walks an FST/n-gram index;
here the term_stats DataFrame IS the dictionary (driver-cached for
small dictionaries, a broadcast-size predicate scan otherwise), so
each suggester is a filter + bounded TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.searcher import IndexSearcher


def suggest_similar(
    searcher: IndexSearcher,
    term: str,
    max_suggestions: int = 5,
    max_edits: int = 2,
    min_df: int = 1,
) -> DataFrame:
    """Did-you-mean: dictionary terms within ``max_edits`` Levenshtein
    of the input (excluding the input itself), ranked by (distance asc,
    df desc, term asc) — SpellChecker's distance-then-popularity order.
    Output (term, distance, df)."""
    ts = searcher.index.term_stats
    cand = ts.where(
        (F.levenshtein(F.col("term"), F.lit(term)) <= max_edits)
        & (F.col("term") != term)
        & (F.col("df") >= min_df)
    ).select(
        "term",
        F.levenshtein(F.col("term"), F.lit(term)).cast("long").alias("distance"),
        F.col("df").cast("long").alias("df"),
    )
    return cand.orderBy(
        F.col("distance").asc(), F.col("df").desc(), F.col("term").asc()
    ).limit(max_suggestions)


def complete_prefix(
    searcher: IndexSearcher, prefix: str, max_suggestions: int = 5
) -> DataFrame:
    """Single-term prefix completion over the term dictionary with df
    as the weight: dictionary terms starting with ``prefix``, ranked
    by (df desc, term asc). Output (term, df)."""
    ts = searcher.index.term_stats
    return (
        ts.where(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_suggestions)
    )


class AnalyzingSuggester:
    """Analyzed, weighted suggester — the
    ``Suggest/Analyzing/AnalyzingSuggester.cs:90`` semantics: each
    suggestion is a SURFACE string stored under its ANALYZED key
    (tokenize → lowercase → stop-filter → space-joined), lookups
    analyze the user's prefix the same way and return surface forms
    ranked by weight. The reference compiles keys into an FST; here
    the (key, surface, weight) table is a DataFrame — lookups are a
    prefix predicate + bounded TakeOrderedAndProject, and the table
    partitions/broadcasts like any dimension table at scale.

    ``fuzzy_lookup`` is the FuzzySuggester
    (``Suggest/Analyzing/FuzzySuggester.cs``): up to ``max_edits``
    Levenshtein edits between the analyzed prefix and each key's
    same-length prefix (the automaton's edit budget applied to the
    analyzed form, not the surface)."""

    def __init__(self, entries: DataFrame, surface_col: str, weight_col: str):
        import pandas as pd

        src = entries.select(
            F.col(surface_col).alias("surface"),
            F.col(weight_col).cast("long").alias("weight"),
        )

        def keyed(iterator):
            from lucenenet_spark.analysis.analyzer import analyze

            for pdf in iterator:
                keys = [
                    " ".join(t for t, _ in analyze(s or ""))
                    for s in pdf["surface"]
                ]
                out = pdf.copy()
                out.insert(0, "key", keys)
                yield out[out["key"] != ""]

        self.table = src.mapInPandas(
            keyed, schema="key string, surface string, weight long"
        ).persist()

    def lookup(self, prefix: str, n: int = 5) -> DataFrame:
        """Surface forms whose analyzed key starts with the analyzed
        prefix, ranked (weight desc, surface asc).
        Output (surface, key, weight)."""
        from lucenenet_spark.analysis.analyzer import analyze

        key_prefix = " ".join(t for t, _ in analyze(prefix))
        return (
            self.table.where(F.col("key").startswith(key_prefix))
            .select("surface", "key", "weight")
            .orderBy(F.col("weight").desc(), F.col("surface").asc())
            .limit(n)
        )

    def fuzzy_lookup(self, prefix: str, n: int = 5, max_edits: int = 1) -> DataFrame:
        from lucenenet_spark.analysis.analyzer import analyze

        key_prefix = " ".join(t for t, _ in analyze(prefix))
        plen = len(key_prefix)
        dist = F.levenshtein(
            F.substring(F.col("key"), 1, plen), F.lit(key_prefix)
        )
        return (
            self.table.where(dist <= max_edits)
            .select(
                "surface", "key", "weight", dist.cast("long").alias("distance")
            )
            .orderBy(
                F.col("distance").asc(),
                F.col("weight").desc(),
                F.col("surface").asc(),
            )
            .limit(n)
        )
