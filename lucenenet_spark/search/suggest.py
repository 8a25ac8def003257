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
    """Prefix completion (AnalyzingSuggester's core behavior with
    df as the weight): dictionary terms starting with ``prefix``,
    ranked by (df desc, term asc). Output (term, df)."""
    ts = searcher.index.term_stats
    return (
        ts.where(F.col("term").startswith(prefix))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(max_suggestions)
    )
