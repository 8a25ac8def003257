"""Text analysis operators for training-data curation: token stats,
quality scoring, language ID, document fingerprinting.

All pipelines are pure built-in-function DataFrame expressions
(JVM-side, whole-stage codegen) with deterministic semantics the
DuckDB oracle reproduces exactly: counts are int64, every ratio is a
single fixed-shape double division over exact ints, and fingerprints
use the md5-prefix integer (ops/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzer import ENGLISH_STOP_WORDS, TOKEN_PATTERN
from lucenenet_spark.ops.hashing import md5_prefix_int_col

# tiny marker word lists for the n-gram/stopword language heuristic;
# deterministic by construction (the heuristic IS the spec)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "a"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "dans", "que"),
    "es": ("el", "la", "los", "que", "y", "es", "no", "una", "para", "con"),
}


def _tokens(text_col: str):
    # group idx 0 = whole match (Spark defaults to group 1; our
    # pattern has no capturing groups)
    return F.regexp_extract_all(
        F.lower(F.coalesce(F.col(text_col), F.lit(""))), F.lit(TOKEN_PATTERN), F.lit(0)
    )


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc token accounting: regex tokens, whitespace tokens, a
    BPE-ish subword estimate (ceil(chars/4) per token — the common
    chars-per-token heuristic), char count, stopword count."""
    toks = _tokens(text_col)
    stops = F.array(*[F.lit(w) for w in sorted(ENGLISH_STOP_WORDS)])
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(
            F.filter(
                F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).cast("long").alias("n_ws_tokens"),
        F.aggregate(
            toks, F.lit(0).cast("long"),
            lambda acc, t: acc + F.ceil(F.length(t).cast("double") / F.lit(4.0)).cast("long"),
        ).alias("n_bpe_est"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("n_chars"),
        F.size(F.filter(toks, lambda t: F.array_contains(stops, t))).cast("long").alias(
            "n_stopwords"
        ),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality score in [0,1] from length / stopword ratio /
    mean token length — the Gopher-rules flavor of filtering, as one
    deterministic double expression:

    score = 0.4 * min(1, n_tokens/100)
          + 0.3 * stop_ok   (1 if stopword ratio in [0.05, 0.6])
          + 0.3 * len_ok    (1 if mean token len in [2, 12])
    """
    s = token_stats(df, id_col, text_col)
    ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double")
    mean_len = (F.col("n_chars").cast("double") - (F.col("n_ws_tokens") - 1).cast("double")) / F.col(
        "n_tokens"
    ).cast("double")
    return s.select(
        "id", "n_tokens", "n_stopwords",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.lit(0.4) * F.least(F.lit(1.0), F.col("n_tokens").cast("double") / F.lit(100.0))
            + F.lit(0.3)
            * F.when((ratio >= 0.05) & (ratio <= 0.6), F.lit(1.0)).otherwise(F.lit(0.0))
            + F.lit(0.3)
            * F.when((mean_len >= 2.0) & (mean_len <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
        )
        .alias("quality"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per language, count tokens in its
    marker list; predict the argmax (ties broken by language code
    order), 'und' when no marker hits. (id, n_tokens, per-lang counts,
    lang_pred)."""
    toks = _tokens(text_col)
    base = df.select(F.col(id_col).cast("long").alias("id"), toks.alias("toks"))
    def marker_count(words: tuple[str, ...]):
        # closure factory: a default-arg lambda would be seen by Spark
        # as a binary (element, index) lambda
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter("toks", lambda t: F.array_contains(arr, t)))

    counts = base.select(
        "id",
        F.size("toks").cast("long").alias("n_tokens"),
        *[
            marker_count(words).cast("long").alias(f"n_{lang}")
            for lang, words in LANG_MARKERS.items()
        ],
    )
    best = F.greatest(*[F.col(f"n_{lang}") for lang in LANG_MARKERS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in sorted(LANG_MARKERS):
        pred = pred.when(F.col(f"n_{lang}") == best, F.lit(lang))
    return counts.select(
        "id", "n_tokens", *[f"n_{lang}" for lang in LANG_MARKERS], pred.alias("lang_pred")
    )


FP_GRAM = 8


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Rolling-hash document fingerprint: min and max md5-prefix hash
    over all 8-char grams of the text (a 2-value winnowing sketch) —
    robust to small edits at the far end of the doc, exact across
    engines. (id, n_grams, fp_min, fp_max)."""
    t = f"coalesce({text_col}, '')"
    # guard: sequence(1, 0) in Spark is DESCENDING [1, 0], so short
    # texts must short-circuit to an empty gram array explicitly
    grams = (
        f"case when length({t}) >= {FP_GRAM} then "
        f"transform(sequence(1, length({t}) - {FP_GRAM - 1}), "
        f"i -> cast(conv(substring(md5(substring({t}, i, {FP_GRAM})), 1, 15), 16, 10) as bigint)) "
        f"else array() end"
    )
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.expr(f"size({grams})").cast("long").alias("n_grams"),
        F.expr(f"array_min({grams})").alias("fp_min"),
        F.expr(f"array_max({grams})").alias("fp_max"),
    )
