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

import pandas as pd
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


def direct_spell_suggest(
    searcher,
    words: list[str] | tuple[str, ...] | str,
    num_sug: int = 5,
    max_edits: int = 2,
    min_prefix: int = 1,
    min_query_length: int = 4,
    max_query_frequency: float = 0.01,
    accuracy: float = 0.5,
    max_inspections: int = 5,
    suggest_mode: str = "when_not_in_index",
    distance: str = "internal",
) -> DataFrame:
    """DirectSpellChecker.SuggestSimilar, batched (reference
    ``Lucene.Net.Suggest/Spell/DirectSpellChecker.cs:322``).

    Gates mirrored from the reference:

    - queries shorter than ``min_query_length`` code points get no
      suggestions (``:326``);
    - ``when_not_in_index`` mode drops queries already in the
      dictionary (``:338``), ``always`` keeps them;
    - queries whose own df exceeds ``ceil(max_query_frequency *
      max_doc)`` are considered correctly spelled (``:349``);
    - candidates must share the first ``min_prefix`` characters
      (FuzzyTermsEnum's non-fuzzy prefix, ``:431``: prefix =
      max(minPrefix, editDistance-1) = 1 for the default 1/2 passes),
      differ from the query, and have df > 0 (thresholdFrequency=0);
    - score >= ``accuracy`` (``:480``), ranked score desc, df desc,
      term asc (SuggestWordScoreComparator.cs), top ``num_sug``.
    - the reference tries edit distance 1 first and only falls back
      to ``max_edits`` when that pass returned fewer than
      ``num_sug * max_inspections`` candidates (``:371-379``);
      mirrored here at the count level: when a word has >= that many
      distance<=1 candidates, its distance-2 candidates are dropped.

    ``distance`` selects the edit-distance dialect, mirroring the
    reference's settable ``Distance`` property:

    - ``"internal"`` (default, = the reference default
      ``LuceneLevenshteinDistance``, DirectSpellChecker.cs:46): OSA /
      restricted Damerau-Levenshtein — an adjacent transposition
      counts as ONE edit ("teh" -> "the" is distance 1). The exact OSA
      DP runs as an Arrow-batched pandas UDF over the survivors of the
      JVM prefilters (prefix/length-band join key + the sound
      ``levenshtein <= 2*max_edits`` budget — plain lev never exceeds
      2x OSA), so the Python stage sees only a handful of rows per
      word.
    - ``"levenshtein"``: plain Levenshtein (the reference's selectable
      ``LevensteinDistance.cs``), entirely JVM-side.

    Both are scored with INTERNAL_LEVENSHTEIN's formula
    ``1 - d/min(len)`` (LuceneLevenshteinDistance.cs:76).

    The Spark shape is BATCH: the word list broadcasts against ONE
    term-dictionary scan; prefix + length-band filters run JVM-side
    before the distance, so a million-word spellcheck batch is one
    dictionary pass. Columns: word, rank, suggestion, score, df.
    """
    if isinstance(words, str):
        words = [words]
    spark = searcher.index.term_stats.sparkSession
    empty = "word string, rank long, suggestion string, score double, df long"
    qdf = {w: 0 for w in (w.lower() for w in words)}
    if qdf:
        for r in (
            searcher.index.term_stats.where(F.col("term").isin(list(qdf)))
            .select("term", "df")
            .collect()
        ):
            qdf[r["term"]] = r["df"]
    import math

    from pyspark.sql import Window

    max_doc = searcher.index.max_doc
    # maxQueryFrequency >= 1 is an ABSOLUTE docfreq ceiling, < 1 a
    # corpus fraction (DirectSpellChecker.cs:345-351)
    if max_query_frequency >= 1.0:
        df_ceiling = int(max_query_frequency)
    else:
        df_ceiling = int(math.ceil(max_query_frequency * max_doc))
    live = [
        w
        for w in qdf
        if len(w) >= min_query_length
        and not (suggest_mode == "when_not_in_index" and qdf[w] > 0)
        and not (qdf[w] > df_ceiling)
    ]
    if not live:
        return spark.createDataFrame([], empty)
    if distance not in ("internal", "levenshtein"):
        raise ValueError(f"unknown distance dialect: {distance!r}")
    wdf = spark.createDataFrame([(w,) for w in live], "word string")
    dict_df = searcher.index.term_stats.select("term", "df")
    # The prefix-share predicate is an EQUALITY — expressed as a join
    # key so Catalyst hash-joins the (broadcast) word batch against the
    # dictionary instead of a BroadcastNestedLoopJoin over every term.
    # At a 10^8-term dictionary that cuts the comparisons by the prefix
    # bucket's selectivity (~26-676x); with min_prefix == 0 the length
    # band |len(term)-len(word)| <= max_edits supplies the key instead
    # (each word broadcast-expands to 2*max_edits+1 candidate lengths).
    if min_prefix >= 1:
        keyed_words = wdf.withColumn(
            "jk", F.substring(F.col("word"), 1, min_prefix)
        )
        keyed_dict = dict_df.withColumn(
            "jk", F.substring(F.col("term"), 1, min_prefix)
        )
    else:
        bands = spark.createDataFrame(
            [(i,) for i in range(-max_edits, max_edits + 1)], "delta int"
        )
        keyed_words = wdf.crossJoin(bands).select(
            "word", (F.length("word") + F.col("delta")).alias("jk")
        )
        keyed_dict = dict_df.withColumn("jk", F.length("term"))
    lev = F.levenshtein(F.col("term"), F.col("word"))
    if distance == "levenshtein":
        exact_d = lev
        budget = max_edits
    else:
        # OSA exact pass (LuceneLevenshteinDistance): the JVM
        # levenshtein acts as a sound prefilter (lev <= 2*OSA always),
        # then the Arrow-batched DP resolves the survivors exactly.
        from pyspark.sql.functions import pandas_udf

        from lucenenet_spark.search.queries import _osa

        @pandas_udf("int")
        def osa_d(t: pd.Series, w: pd.Series) -> pd.Series:
            return pd.Series(
                [_osa(a, b) for a, b in zip(t, w)], dtype="int32"
            )

        exact_d = osa_d(F.col("term"), F.col("word"))
        budget = 2 * max_edits
    cand = (
        keyed_dict.join(F.broadcast(keyed_words), "jk")
        .where(
            (F.col("term") != F.col("word"))
            & (F.abs(F.length("term") - F.length("word")) <= max_edits)
            & (lev <= budget)
        )
        .select(
            "word",
            F.col("term").alias("suggestion"),
            exact_d.alias("dist"),
            F.col("df").cast("long").alias("df"),
        )
        .where(F.col("dist") <= max_edits)
    )
    score = (
        F.lit(1.0).cast("float")
        - (
            F.col("dist").cast("float")
            / F.least(F.length("word"), F.length("suggestion")).cast("float")
        ).cast("float")
    ).cast("float")
    cand = cand.withColumn("score", score).where(
        F.col("score") >= F.lit(float(accuracy)).cast("float")
    )
    inspections = num_sug * max_inspections
    w_word = Window.partitionBy("word")
    w_rank = Window.partitionBy("word").orderBy(
        F.col("score").desc(), F.col("df").desc(), F.col("suggestion").asc()
    )
    return (
        cand.withColumn(
            "n_ed1", F.sum((F.col("dist") <= 1).cast("long")).over(w_word)
        )
        .where((F.col("n_ed1") < inspections) | (F.col("dist") <= 1))
        .withColumn("rank", F.row_number().over(w_rank).cast("long"))
        .where(F.col("rank") <= num_sug)
        .select(
            "word", "rank", "suggestion", F.col("score").cast("double").alias("score"), "df"
        )
    )
