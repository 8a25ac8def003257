"""WordBreakSpellChecker — break/combine suggestions from the index
dictionary (reference ``Lucene.Net.Suggest/Spell/WordBreakSpellChecker.cs``).

Semantics mirrored from the reference:

- ``SuggestWordBreaks`` (``:91`` + ``GenerateBreakUpSuggestions:264``):
  split a not-in-dictionary word at every point where BOTH sides are
  ≥ ``min_break_length`` chars; a split qualifies when every part has
  df ≥ ``min_suggestion_frequency``. Recursion goes RIGHT only (the
  left part is fixed once it qualifies), bounded by ``max_changes``,
  so a k-part suggestion requires every part to qualify. Ranked by
  NUM_CHANGES_THEN_SUMMED_FREQUENCY (``:70``): fewest breaks first,
  then summed df descending (pinned; the reference's alternative
  MAX_FREQUENCY comparer is a parameter away).
- ``SuggestWordCombinations`` (``:156``): concatenate runs of 2..
  ``max_changes``+1 adjacent query terms; the combination qualifies
  when the concatenation's df ≥ ``min_suggestion_frequency`` and the
  concatenation is no longer than ``max_combine_length``. Ranked by
  df descending.

The Spark shape is deliberately BATCH: the driver enumerates split /
combine candidates (tiny — O(len²) strings per word), and ONE
broadcast join against the distributed term dictionary resolves every
candidate part's df. The reference probes the TermsEnum once per
part per split (an IndexReader round-trip per candidate); here a
million-word spell-check batch is still exactly one dictionary scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _break_candidates(
    word: str, min_break_length: int, max_changes: int
) -> list[tuple[str, ...]]:
    """All split tuples the reference recursion would evaluate:
    left part fixed, recurse right, ≤ max_changes breaks, every part
    ≥ min_break_length chars."""
    m = max(1, min_break_length)
    out: list[tuple[str, ...]] = []

    def rec(prefix: tuple[str, ...], rest: str, breaks: int) -> None:
        if len(rest) < 2 * m:
            return
        for i in range(m, len(rest) - m + 1):
            left, right = rest[:i], rest[i:]
            out.append(prefix + (left, right))
            if breaks + 1 < max_changes:
                rec(prefix + (left,), right, breaks + 1)

    rec((), word, 0)
    return out


def suggest_word_breaks(
    searcher,
    words: list[str] | tuple[str, ...] | str,
    max_suggestions: int = 10,
    min_suggestion_frequency: int = 1,
    min_break_length: int = 1,
    max_changes: int = 1,
) -> DataFrame:
    """Batch word-break suggestions: one row per (word, suggestion),
    ``suggestion`` = space-joined parts, ranked per word by
    (n_changes asc, summed df desc, suggestion asc), top
    ``max_suggestions`` per word.

    Columns: word, rank, suggestion, n_changes, freq.
    """
    if isinstance(words, str):
        words = [words]
    spark = searcher.index.term_stats.sparkSession
    rows = []
    for w in words:
        for cid, parts in enumerate(_break_candidates(w, min_break_length, max_changes)):
            for idx, p in enumerate(parts):
                rows.append((w, cid, len(parts), idx, p))
    if not rows:
        return spark.createDataFrame(
            [],
            "word string, rank long, suggestion string, n_changes int, freq long",
        )
    cand = spark.createDataFrame(
        rows, "word string, cand int, n_parts int, idx int, term string"
    )
    # one broadcast join resolves every candidate part's df; a split
    # qualifies iff ALL its parts joined (n_found == n_parts); the
    # suggestion string is rebuilt from (idx, term) structs sorted
    # within the agg — fully deterministic
    parts_sorted = (
        F.broadcast(cand)
        .join(
            searcher.index.term_stats.where(
                F.col("df") >= min_suggestion_frequency
            ).select("term", "df"),
            "term",
        )
        .groupBy("word", "cand", "n_parts")
        .agg(
            F.count("*").alias("n_found"),
            F.sum("df").alias("freq"),
            F.array_sort(F.collect_list(F.struct("idx", "term"))).alias("parts"),
        )
        .where(F.col("n_found") == F.col("n_parts"))
        .select(
            "word",
            F.concat_ws(
                " ", F.transform("parts", lambda s: s["term"])
            ).alias("suggestion"),
            (F.col("n_parts") - F.lit(1)).cast("int").alias("n_changes"),
            F.col("freq").cast("long").alias("freq"),
        )
    )
    from pyspark.sql import Window

    w_rank = Window.partitionBy("word").orderBy(
        F.col("n_changes").asc(), F.col("freq").desc(), F.col("suggestion").asc()
    )
    return (
        parts_sorted.withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= max_suggestions)
        .select("word", "rank", "suggestion", "n_changes", "freq")
    )


def suggest_word_combinations(
    searcher,
    terms: list[str] | tuple[str, ...],
    max_suggestions: int = 10,
    min_suggestion_frequency: int = 1,
    max_changes: int = 1,
    max_combine_length: int = 20,
) -> DataFrame:
    """Combine runs of adjacent query terms into dictionary words
    (``SuggestWordCombinations``, WordBreakSpellChecker.cs:156).

    Columns: start, length, combined, freq — ranked by freq desc,
    start asc; top ``max_suggestions``.
    """
    spark = searcher.index.term_stats.sparkSession
    rows = []
    n = len(terms)
    for i in range(n):
        for j in range(i + 1, min(n, i + 1 + max_changes)):
            combined = "".join(terms[i : j + 1])
            if len(combined) <= max_combine_length:
                rows.append((i, j - i + 1, combined))
    if not rows:
        return spark.createDataFrame(
            [], "start int, length int, combined string, freq long"
        )
    cand = spark.createDataFrame(rows, "start int, length int, term string")
    out = (
        F.broadcast(cand)
        .join(
            searcher.index.term_stats.where(
                F.col("df") >= min_suggestion_frequency
            ).select("term", "df"),
            "term",
        )
        .select(
            "start",
            "length",
            F.col("term").alias("combined"),
            F.col("df").cast("long").alias("freq"),
        )
        .orderBy(F.col("freq").desc(), F.col("start").asc())
        .limit(max_suggestions)
    )
    return out
