"""Text analysis operators for training-data curation: token stats,
quality scoring, language ID, document fingerprinting.

All pipelines are pure built-in-function DataFrame expressions
(JVM-side, whole-stage codegen) with deterministic semantics the
DuckDB oracle reproduces exactly: counts are int64, every ratio is a
single fixed-shape double division over exact ints, and fingerprints
use the md5-prefix integer (ops/hashing.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def _word_grams(toks_col, n: int):
    """Sliding word n-grams (space-joined) from a token array column;
    empty array when the doc has fewer than n tokens (guards the
    descending-sequence trap)."""
    if n == 1:
        return toks_col
    return F.when(
        F.size(toks_col) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(toks_col) - (n - 1)),
            lambda i: F.array_join(F.slice(toks_col, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", max_n: int = 3
) -> DataFrame:
    """Intra-document repetition signals (the C4/RefinedWeb 'rep'
    quality filters: Rae et al. 2021 §A1.1 duplicate n-gram fractions):
    for each n in 1..max_n, the fraction of n-gram OCCURRENCES that
    are duplicates of an earlier occurrence —
    ``dup_frac_n = (total_n - distinct_n) / total_n`` (0.0 for empty).
    Pure JVM array expressions, one scan, no shuffle."""
    base = df.select(
        F.col(id_col).cast("long").alias("id"), _tokens(text_col).alias("toks")
    )
    cols = [F.col("id")]
    for n in range(1, max_n + 1):
        g = _word_grams(F.col("toks"), n)
        total = F.size(g).cast("long")
        distinct = F.size(F.array_distinct(g)).cast("long")
        cols.append(total.alias(f"total_{n}"))
        cols.append(distinct.alias(f"distinct_{n}"))
        cols.append(
            F.when(total > 0, (total - distinct).cast("double") / total.cast("double"))
            .otherwise(F.lit(0.0))
            .alias(f"dup_frac_{n}")
        )
    return base.select(*cols)


def ngram_contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str | None = None,
) -> DataFrame:
    """Benchmark-contamination check (the GPT-3 appendix-C style
    13-gram overlap filter; Brown et al. 2020): flag training docs
    sharing any word n-gram with a benchmark/eval corpus. Output
    ``(id, n_grams, n_contaminated, contamination_frac)`` where
    n_contaminated counts gram OCCURRENCES present in the benchmark's
    distinct gram set.

    Scale shape: the benchmark gram set is DISTINCT-aggregated and
    broadcast (eval suites are tiny next to 100 TB of training data),
    so the corpus side is one scan + map-side semi join — no corpus
    shuffle. For a benchmark too large to broadcast, Catalyst falls
    back to a shuffled semi join on the gram key, still one pass."""
    from pyspark.sql.functions import broadcast

    btc = bench_text_col or text_col
    bench_grams = (
        benchmark.select(
            F.explode(_word_grams(_tokens(btc), n)).alias("gram")
        ).distinct()
    )
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        _word_grams(_tokens(text_col), n).alias("grams"),
    )
    exploded = base.select("id", F.explode("grams").alias("gram"))
    hits = (
        exploded.join(broadcast(bench_grams), "gram", "left_semi")
        .groupBy("id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_contaminated"))
    )
    totals = base.select("id", F.size("grams").cast("long").alias("n_grams"))
    return totals.join(hits, "id", "left").select(
        "id",
        "n_grams",
        F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("long").alias(
            "n_contaminated"
        ),
        F.when(
            F.col("n_grams") > 0,
            F.coalesce(F.col("n_contaminated"), F.lit(0)).cast("double")
            / F.col("n_grams").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("contamination_frac"),
    )


# RE2-safe PII patterns (shared verbatim with the DuckDB oracle —
# no backreferences, no lookaround)
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ipv4": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def pii_scrub(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII detection + redaction — the pre-training scrub pass. Counts
    matches per class and rewrites the text with ``<CLASS>`` sentinels,
    entirely as JVM regexp expressions inside whole-stage codegen (one
    pass over the corpus, no Python, no shuffle).

    Output: (id, n_email, n_phone, n_ipv4, clean_text).
    """
    out = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    counts = []
    clean = F.col("t")
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.size(F.regexp_extract_all(F.col("t"), F.lit(pat), F.lit(0)))
            .cast("long")
            .alias(f"n_{name}")
        )
    # redact in pattern order (email first so its host part is not
    # half-eaten by the ipv4 rule)
    for name, pat in PII_PATTERNS.items():
        clean = F.regexp_replace(clean, pat, f"<{name.upper()}>")
    return out.select("id", *counts, clean.alias("clean_text"))


def line_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_doc_frac: float = 0.01,
    min_docs: int = 2,
) -> DataFrame:
    """Boilerplate line removal (the CCNet/RefinedWeb line-level dedup
    pass): a line is boilerplate when it appears in more than
    ``max(min_docs, min_doc_frac * corpus)`` distinct documents; such
    lines are dropped from every document.

    Shape: explode lines → hash-agg distinct-doc counts per line (the
    only shuffle, keyed by line — bounded by distinct-line cardinality)
    → broadcast-ready boilerplate set anti-joined back. Documents with
    no surviving lines stay with empty text.

    Output: (id, n_lines, n_kept, clean_text) with line order kept.
    """
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
    lines = base.select(
        "id",
        F.posexplode(F.split(F.col("t"), "\n")).alias("lineno", "line"),
    )
    total = base.count()
    threshold = max(int(min_docs), int(min_doc_frac * total))
    boilerplate = (
        lines.where(F.trim("line") != "")
        .groupBy("line")
        .agg(F.countDistinct("id").alias("n_docs"))
        .where(F.col("n_docs") > threshold)
        .select("line")
    )
    kept = lines.join(F.broadcast(boilerplate), "line", "left_anti")
    rebuilt = kept.groupBy("id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(F.collect_list(F.struct("lineno", "line"))),
                lambda s: s["line"],
            ),
        ).alias("clean_text"),
    )
    n_lines = lines.groupBy("id").agg(F.count("*").cast("long").alias("n_lines"))
    return (
        base.select("id")
        .join(n_lines, "id", "left")
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def lm_doc_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
) -> DataFrame:
    """LM-perplexity quality filter (the CCNet-style signal): mean
    per-token log-probability of each document under a corpus bigram
    model with stupid backoff (Brants et al. 2007, the same ALPHA=0.4
    the FreeTextSuggester uses):

        lp(i) = ln(B(w_{i-1}, w_i) / U(w_{i-1}))          if B > 0
              = ln(alpha * U(w_i) / T)                     otherwise

    avg_logprob accumulates the doubles in TOKEN ORDER (a pinned fold,
    not a float SUM — partition-count invariant and oracle-exact).
    Gibberish (unseen transitions everywhere) scores far below
    natural text; filter on a threshold.

    Scale shape: two hash-agg count tables over one corpus scan (U is
    vocabulary-sized and broadcast; B is bigram-keyed, the only real
    shuffle), one join per side, one groupBy(id) fold. Output:
    (id, n_scored, avg_logprob).
    """
    base = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("toks"))
    pairs = base.select(
        "id",
        F.posexplode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.greatest(F.size("toks") - 1, F.lit(0))),
                F.slice(F.col("toks"), 2, F.greatest(F.size("toks") - 1, F.lit(0))),
            )
        ).alias("pos", "bg"),
    ).select("id", "pos", F.col("bg.0").alias("w1"), F.col("bg.1").alias("w2"))
    toks_flat = base.select(F.explode("toks").alias("w"))
    uni = toks_flat.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("u"))
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("b"))
    )
    total = toks_flat.agg(F.count(F.lit(1)).cast("long").alias("t"))
    j = (
        pairs.join(big, ["w1", "w2"], "left")
        .join(F.broadcast(uni.withColumnRenamed("w", "w1").withColumnRenamed("u", "u1")), "w1")
        .join(F.broadcast(uni.withColumnRenamed("w", "w2").withColumnRenamed("u", "u2")), "w2")
        .crossJoin(F.broadcast(total))
    )
    # per-token logprob truncated to float32: the JVM's Math.log and
    # C libm disagree by 1-2 ulp on some inputs; the f32 step absorbs
    # that (same discipline as the LM/DFR similarity oracles)
    lp = F.when(
        F.col("b").isNotNull(),
        F.log(F.col("b").cast("double") / F.col("u1").cast("double")),
    ).otherwise(
        F.log(F.lit(float(alpha)) * F.col("u2").cast("double") / F.col("t").cast("double"))
    ).cast("float").cast("double")
    folded = (
        j.select("id", "pos", lp.alias("lp"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_scored"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "lp"))),
                    lambda s: s["lp"],
                ),
                F.lit(0.0).cast("double"),
                lambda acc, x: acc + x,
            ).alias("s"),
        )
        .select(
            "id",
            "n_scored",
            (F.col("s") / F.col("n_scored").cast("double")).alias("avg_logprob"),
        )
    )
    return (
        base.select("id")
        .join(folded, "id", "left")
        .select(
            "id",
            F.coalesce("n_scored", F.lit(0)).alias("n_scored"),
            F.coalesce("avg_logprob", F.lit(0.0)).alias("avg_logprob"),
        )
    )


def exact_substr_spans(
    df: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """ExactSubstr duplicated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    public method; the suffix-array pass re-expressed as distributed
    window hashing): every ``k``-token window whose exact token
    sequence occurs MORE THAN ONCE in the corpus (any document,
    including the same one) marks its token range as duplicated;
    per document, overlapping duplicated windows merge into maximal
    spans.

    Shape at 100 TB: one tokenize pass emits (doc, start, window-hash)
    rows; ONE hash aggregate keyed by the 60-bit md5-prefix window
    hash finds hashes with total count > 1 (map-side combined — the
    suffix array's "repeated substring" test without any global
    sort); the duplicated window starts semi-join back and a per-doc
    gaps-and-islands pass (window over each doc's own bounded start
    list) merges them. No all-pairs step anywhere.

    Output: (id, span_start, span_end) token-index spans
    [span_start, span_end) — exclusive end — one row per maximal span.
    """
    from lucenenet_spark.ops.hashing import md5_prefix_int_col

    toks = _tokens(text_col)
    base = df.select(F.col(id_col).cast("long").alias("id"), toks.alias("__toks"))
    wins = base.where(F.size("__toks") >= k).select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("__toks") - (k - 1)),
                lambda i: F.struct(
                    (i - 1).cast("long").alias("start"),
                    md5_prefix_int_col(
                        F.concat_ws(" ", F.slice("__toks", i, k))
                    ).alias("h"),
                ),
            )
        ).alias("w"),
    ).select("id", F.col("w.start").alias("start"), F.col("w.h").alias("h"))
    dup_hashes = (
        wins.groupBy("h").agg(F.count("*").alias("n")).where(F.col("n") > 1)
    )
    dup_wins = wins.join(dup_hashes.select("h"), "h", "left_semi").select(
        "id", "start", (F.col("start") + k).alias("end")
    )
    # gaps-and-islands: a window starts a new island when it begins
    # after the running max end of everything before it
    w_doc = Window.partitionBy("id").orderBy("start")
    w_prev = Window.partitionBy("id").orderBy("start").rowsBetween(
        Window.unboundedPreceding, -1
    )
    islands = (
        dup_wins.withColumn("prev_max_end", F.max("end").over(w_prev))
        .withColumn(
            "new_island",
            (F.col("prev_max_end").isNull() | (F.col("start") > F.col("prev_max_end"))).cast("long"),
        )
        .withColumn("island", F.sum("new_island").over(w_doc))
    )
    return (
        islands.groupBy("id", "island")
        .agg(F.min("start").alias("span_start"), F.max("end").alias("span_end"))
        .select(
            "id",
            F.col("span_start").cast("long").alias("span_start"),
            F.col("span_end").cast("long").alias("span_end"),
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_chars: int = 512,
    overlap: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks —
    the RAG / context-window prep step (each chunk carries its char
    range back into the source doc).

    Chunks start every ``chunk_chars - overlap`` characters; the last
    chunk of a doc may be shorter. Empty documents produce no chunks.
    Returns (doc_id, chunk_id, start, end, chunk_text) with 0-based
    [start, end) char offsets; chunk_id is 0-based per doc.

    Scale shape (100 TB): one Project + posexplode per row — no
    shuffle, no UDF; output partitioning inherits the input, and chunk
    count per task is bounded by doc length / step. Token-budget
    chunking composes downstream (token_stats over the chunk table).
    """
    if overlap >= chunk_chars:
        raise ValueError("overlap must be < chunk_chars")
    step = chunk_chars - overlap
    text = F.coalesce(F.col(text_col), F.lit(""))
    return (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            text.alias("_t"),
            F.length(text).alias("_n"),
        )
        .where(F.col("_n") > 0)
        .select(
            "doc_id",
            F.posexplode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(step))
            ).alias("chunk_id", "start"),
            F.col("_t"),
            F.col("_n"),
        )
        .select(
            "doc_id",
            F.col("chunk_id").cast("long").alias("chunk_id"),
            F.col("start").cast("long").alias("start"),
            F.least(F.col("start") + chunk_chars, F.col("_n")).cast("long").alias("end"),
            F.substring(F.col("_t"), F.col("start") + 1, F.lit(chunk_chars)).alias(
                "chunk_text"
            ),
        )
    )


def gopher_rules(
    df: DataFrame,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher / MassiveText quality rules (Rae et al. 2021, arXiv:
    2112.11446 §A1.1): the published heuristic document filter —
    word-count bounds, mean-word-length bounds, symbol-to-word ratio
    (# and ellipsis), bullet-started / ellipsis-ended line fractions,
    alphabetic-word fraction, and the >= 2-of-8 stop-word test.

    Pinned dialect so both engines agree bit-for-bit: words = the
    trimmed text split on ``\\s+`` (empties dropped); lines = split on
    newline; every ratio is one double division over exact int64
    counts, 0.0 when its denominator is 0. Output one row per doc:
    the raw counts/ratios per rule plus the conjunct ``pass`` flag.
    One Project over the corpus scan — no shuffle, no Python stage
    (the higher-order lambdas evaluate as JVM-interpreted expressions).
    """
    stop8 = ("the", "be", "to", "of", "and", "that", "have", "with")
    t = F.coalesce(F.col(text_col), F.lit(""))
    words = F.filter(F.split(F.trim(t), r"\s+"), lambda w: w != F.lit(""))
    n_words = F.size(words).cast("long")
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_sym = (
        (F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit(""))))
        + (F.length(t) - F.length(F.replace(t, F.lit("…"), F.lit(""))))
        + (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    ).cast("long")
    lines = F.split(t, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).startswith("-")
            | F.trim(l).startswith("*")
            | F.trim(l).startswith("•"),
        )
    ).cast("long")
    n_ellipsis = F.size(
        F.filter(
            lines,
            lambda l: F.trim(l).endswith("...") | F.trim(l).endswith("…"),
        )
    ).cast("long")
    toks = _tokens(text_col)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stop8]),
            lambda s: F.array_contains(toks, s),
        )
    ).cast("long")

    def ratio(num, den):
        return F.when(den > 0, num.cast("double") / den.cast("double")).otherwise(
            F.lit(0.0)
        )

    out = df.select(
        F.col(id_col).cast("long").alias("id"),
        n_words.alias("word_count"),
        ratio(sum_len, n_words).alias("mean_word_len"),
        ratio(n_sym, n_words).alias("symbol_ratio"),
        ratio(n_bullet, n_lines).alias("bullet_frac"),
        ratio(n_ellipsis, n_lines).alias("ellipsis_frac"),
        ratio(n_alpha, n_words).alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
    )
    return out.withColumn(
        "pass",
        (F.col("word_count") >= min_words)
        & (F.col("word_count") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("symbol_ratio") <= max_symbol_ratio)
        & (F.col("bullet_frac") <= max_bullet_frac)
        & (F.col("ellipsis_frac") <= max_ellipsis_frac)
        & (F.col("alpha_frac") >= min_alpha_frac)
        & (F.col("stop_hits") >= min_stop_hits),
    )


def c4_filters(
    df: DataFrame,
    min_sentences: int = 3,
    min_line_words: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020, arXiv:1910.10683 §2.2):
    keep only lines ending in terminal punctuation (``. ! ? "``) with
    at least ``min_line_words`` words; drop documents with fewer than
    ``min_sentences`` sentences, any curly brace (the JS heuristic),
    or the phrase "lorem ipsum".

    Output per doc: (id, n_lines, n_kept_lines, n_sentences,
    has_brace, has_lorem, cleaned_text, pass) — ``cleaned_text`` is
    the kept lines rejoined with newlines (empty when none survive),
    sentence count = terminal-punctuation occurrences in the kept
    text. All JVM Column ops, one projection, no shuffle.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.trim(l).endswith(".")
            | F.trim(l).endswith("!")
            | F.trim(l).endswith("?")
            | F.trim(l).endswith('"')
        )
        & (
            F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != F.lit("")))
            >= min_line_words
        ),
    )
    cleaned = F.array_join(kept, "\n")

    def occurrences(col, s):
        return F.length(col) - F.length(F.replace(col, F.lit(s), F.lit("")))

    n_sentences = (
        occurrences(cleaned, ".") + occurrences(cleaned, "!") + occurrences(cleaned, "?")
    ).cast("long")
    out = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        t.contains("{").alias("has_brace"),
        F.lower(t).contains("lorem ipsum").alias("has_lorem"),
        cleaned.alias("cleaned_text"),
    )
    return out.withColumn(
        "pass",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_brace")
        & ~F.col("has_lorem"),
    )


def top_ngram_stats(
    df: DataFrame,
    ns: tuple[int, ...] = (2, 3, 4),
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Gopher repetition rule family, part 2 (Rae et al. 2021 §A1.1):
    the fraction of a document's characters covered by its MOST
    FREQUENT word n-gram (a page dominated by one repeated phrase
    scores high and gets filtered). :func:`repetition_stats` covers
    the companion duplicate-occurrence fractions.

    Long format: one row per (doc, n) with the winning gram, its
    count, and ``char_frac = count * length(gram) / length(text)``
    (0.0 for empty text; ties break count desc then gram asc — pinned
    so the SQL mirror reproduces the winner). Docs with no n-gram of
    a size emit no row for that size.

    Scale shape (100 TB): one token projection, then per n one hash
    aggregate keyed (doc, gram) and one per-doc window (partition
    bounded by the doc's distinct grams) — no global sort, no driver
    data; the three sizes union into one plan.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        _tokens(text_col).alias("toks"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias("n_chars"),
    )
    parts = []
    for n in ns:
        grams = base.select(
            "id",
            "n_chars",
            F.lit(int(n)).cast("int").alias("n"),
            F.explode(_word_grams(F.col("toks"), int(n))).alias("gram"),
        )
        counts = grams.groupBy("id", "n_chars", "n", "gram").agg(
            F.count("*").cast("long").alias("cnt")
        )
        w = Window.partitionBy("id", "n").orderBy(
            F.col("cnt").desc(), F.col("gram").asc()
        )
        parts.append(
            counts.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
        )
    top = parts[0]
    for p in parts[1:]:
        top = top.unionByName(p)
    return top.select(
        "id",
        "n",
        F.col("gram").alias("top_gram"),
        F.col("cnt").alias("top_count"),
        F.when(
            F.col("n_chars") > 0,
            (F.col("cnt") * F.length("gram")).cast("double")
            / F.col("n_chars").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("char_frac"),
    )
