"""Training-mix operators: sequence packing, stratified splits,
temperature-based mixture weights.

These are the steps between "curated corpus" and "training batches" in
an LLM data pipeline: pack documents into fixed-token-budget training
sequences, carve deterministic train/val/test splits per stratum, and
compute temperature-flattened sampling weights per source.

Every operator is integer-exact so the DuckDB oracle matches
bit-for-bit: token counts are int64 regex-token counts (the
``ops/text.py`` tokenizer), split assignment uses the md5-prefix
integer (``ops/hashing.py``), and mixture weights avoid libm-dependent
``pow`` — temperature is fixed at 2 so the weight is IEEE-exact
``sqrt``, scaled to an integer before the (integer) normalization.

Scale notes (100 TB): packing's only wide operation is ONE window
partitioned by the shard column — parallelism = number of shards, and
any corpus that big has thousands of (source, lang, date) shards;
there is no global window. Splits and mixture weights are plain hash
aggregates; the mixture's final normalization runs over
|strata| rows (tiny).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.ops.hashing import md5_prefix_int_col
from lucenenet_spark.ops.text import _tokens


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str = "lang",
) -> DataFrame:
    """Pack documents into fixed-token training sequences with
    boundary crossing (the GPT-style packing where a sequence may cut
    a document): docs are laid out in deterministic (shard, id) order,
    and a doc starts at global token offset ``cum_before``; its
    sequence is ``cum_before // budget`` and its in-sequence offset
    ``cum_before % budget``. One window per shard — no global window.

    Output: (id, shard, n_tokens, seq, seq_offset)."""
    tok = F.size(_tokens(text_col)).cast("long")
    w = (
        Window.partitionBy(F.col(shard_col))
        .orderBy(F.col(id_col).cast("long"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = (F.sum(tok).over(w) - tok).cast("long")
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(shard_col).cast("string").alias("shard"),
        tok.alias("n_tokens"),
        F.floor(cum_before / F.lit(int(budget))).cast("long").alias("seq"),
        (cum_before % F.lit(int(budget))).cast("long").alias("seq_offset"),
    )


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Deterministic train/val/test split per stratum: a doc's split is
    a pure function of its id (md5-prefix integer mod 100), so the
    assignment is stable across runs, cluster sizes, and engines.
    Output: per (stratum, split) doc and token counts."""
    b = md5_prefix_int_col(F.col(id_col).cast("string")) % F.lit(100)
    split = (
        F.when(b < F.lit(int(train_pct)), F.lit("train"))
        .when(b < F.lit(int(train_pct + val_pct)), F.lit("val"))
        .otherwise(F.lit("test"))
    )
    tok = F.size(_tokens(text_col)).cast("long")
    return (
        df.select(
            F.col(strata_col).cast("string").alias("stratum"),
            split.alias("split"),
            tok.alias("__tok"),
        )
        .groupBy("stratum", "split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("n_tokens"),
        )
    )


def temperature_mix(
    df: DataFrame,
    text_col: str = "text",
    strata_col: str = "lang",
) -> DataFrame:
    """Temperature-2 mixture weights per stratum (the multilingual
    up-sampling rule w_s ∝ n_s^(1/T) with T=2): weight =
    floor(sqrt(n_tokens)·10⁶) — sqrt and the single multiply are
    IEEE-exact in every engine, unlike pow — then the share is pure
    integer arithmetic: share_ppm = w·10⁶ // Σw. Output:
    (stratum, n_docs, n_tokens, weight, share_ppm)."""
    tok = F.size(_tokens(text_col)).cast("long")
    per = (
        df.select(F.col(strata_col).cast("string").alias("stratum"), tok.alias("__tok"))
        .groupBy("stratum")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("__tok").cast("long").alias("n_tokens"),
        )
        .withColumn(
            "weight",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1_000_000.0)).cast(
                "long"
            ),
        )
    )
    # |strata| rows: the unpartitioned window is over a handful of rows.
    # share must be INTEGER division (w·10⁶ ~ 3·10¹⁶ exceeds double's
    # 2⁵³ mantissa — float division would round differently per engine)
    total = F.sum("weight").over(Window.partitionBy())
    return per.withColumn("__total", total).select(
        "stratum", "n_docs", "n_tokens", "weight",
        F.expr("CAST((weight * 1000000) DIV __total AS LONG)").alias("share_ppm"),
    )


def domain_cap(
    df: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    cap: int = 100,
) -> DataFrame:
    """Per-domain document cap (the RefinedWeb/C4 anti-spam rule: no
    single host may dominate the training mix): keep at most ``cap``
    docs per domain, selected by a VALUE-deterministic hash rank —
    md5-prefix(docid) asc, docid tie-break — so the kept set is a pure
    function of the data (stable across runs, cluster sizes, engines),
    not a sample that reshuffles per execution.

    Output: (docid, domain, hrank) for the kept docs.

    Scale shape: one hash-partitioned window PER DOMAIN — the natural
    parallelism (millions of domains = millions of independent
    partitions); the widest task is the hottest domain's row count.
    For a degenerate single-domain corpus pre-aggregate a per-bucket
    count or raise cap — the window itself never funnels unrelated
    domains through one task.
    """
    base = df.select(
        F.col(id_col).cast("long").alias("docid"),
        F.col(domain_col).cast("string").alias("domain"),
    )
    h = md5_prefix_int_col(F.col("docid").cast("string"))
    w = Window.partitionBy("domain").orderBy(h.asc(), F.col("docid").asc())
    return base.withColumn("hrank", F.row_number().over(w).cast("long")).where(
        F.col("hrank") <= cap
    )


def dsir_weights(
    df: DataFrame,
    target,
    n_buckets: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method):
    score each document by how much more likely its hashed n-gram
    features are under a TARGET distribution than under the full
    SOURCE corpus, for importance resampling of pretraining data.

    ``target`` is a boolean Column over ``df`` marking the target
    subset (e.g. a high-quality language slice). Features are the
    pinned ops-tokenizer unigrams plus adjacent bigrams, hashed into
    ``n_buckets`` md5-prefix buckets. Per-bucket log-ratio
    ``ln((tgt_f+1)/(T+B)) - ln((src_f+1)/(S+B))`` (add-1 smoothing)
    is converted to fixed-point 1e-6 units — floor(ln(p)*1e6) as
    int64, the nb_classify idiom — so the per-doc weight is an
    INTEGER sum: partition-invariant, cluster-size-invariant, and
    bit-identical to the DuckDB oracle.

    Scale shape: two hash aggregates (doc×bucket counts, bucket
    marginals), one broadcast of the <=n_buckets-row ratio table, one
    integer sum — no window, no driver collect. The Arrow UDF runs
    over n_buckets rows only, never over the corpus.

    Output: (id, weight_fp) for EVERY input doc (docs with no
    features weigh 0).
    """
    toks = _tokens(text_col)
    base = df.select(
        F.col(id_col).cast("long").alias("id"),
        target.cast("boolean").alias("__tgt"),
        toks.alias("__toks"),
    )
    uni = base.select("id", "__tgt", F.explode("__toks").alias("feat"))
    bi_expr = F.when(
        F.size("__toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("__toks") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("__toks", i), F.element_at("__toks", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bi = base.select("id", "__tgt", F.explode(bi_expr).alias("feat"))
    feats = uni.unionByName(bi).select(
        "id", "__tgt", (md5_prefix_int_col(F.col("feat")) % n_buckets).alias("bucket")
    )
    doc_counts = feats.groupBy("id", "bucket").agg(F.count("*").alias("c"))
    marg = feats.groupBy("bucket").agg(
        F.count("*").alias("src_f"),
        F.sum(F.col("__tgt").cast("long")).alias("tgt_f"),
    )
    totals = marg.agg(
        F.sum("src_f").alias("__s"), F.sum("tgt_f").alias("__t")
    )
    b = float(n_buckets)

    @F.pandas_udf("long")
    def fp_ratio(tgt: pd.Series, src: pd.Series, t: pd.Series, s: pd.Series) -> pd.Series:
        tg = tgt.to_numpy(dtype=np.float64)
        sr = src.to_numpy(dtype=np.float64)
        tt = t.to_numpy(dtype=np.float64)
        ss = s.to_numpy(dtype=np.float64)
        a = np.floor(np.log((tg + 1.0) / (tt + b)) * 1_000_000).astype(np.int64)
        c = np.floor(np.log((sr + 1.0) / (ss + b)) * 1_000_000).astype(np.int64)
        return pd.Series(a - c)

    ratios = marg.crossJoin(F.broadcast(totals)).select(
        "bucket",
        fp_ratio(F.col("tgt_f"), F.col("src_f"), F.col("__t"), F.col("__s")).alias(
            "r_fp"
        ),
    )
    weights = (
        doc_counts.join(F.broadcast(ratios), "bucket")
        .groupBy("id")
        .agg(F.sum(F.col("c") * F.col("r_fp")).alias("w"))
    )
    return (
        df.select(F.col(id_col).cast("long").alias("id"))
        .join(weights, "id", "left")
        .select("id", F.coalesce(F.col("w"), F.lit(0)).cast("long").alias("weight_fp"))
    )


def gumbel_topk_sample(
    weights: DataFrame,
    n: int,
    id_col: str = "id",
    weight_col: str = "weight_fp",
    seed: str = "gumbel-v1",
) -> DataFrame:
    """Sample ``n`` rows without replacement with probability
    proportional to softmax(weight) — the Gumbel-top-k trick (public
    method; the resampling step DSIR pairs with its importance
    weights): key = weight + Gumbel noise, take the n largest keys.

    Determinism: the "noise" is a pure function of (seed, id) — u =
    (md5-prefix(seed||id)+1) / 2^60 ∈ (0,1], g = -ln(-ln(u)) — in the
    same fixed-point 1e-6 integer units as the weights, so the sample
    is cluster-size/retry/partition invariant and the DuckDB oracle
    reproduces it bit-for-bit. floor() of an engine-computed double
    keeps the nb_classify ln idiom.

    Shape: one projection + TakeOrdered(n) — no shuffle beyond the
    bounded top-k. Output: (rank, id, weight_fp, key_fp).
    """
    h = md5_prefix_int_col(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
    two60 = float(1 << 60)

    @F.pandas_udf("long")
    def gumbel_fp(hs: pd.Series) -> pd.Series:
        # clamp below 1.0: an id whose 60-bit hash sits in the last
        # ~128 integers would round u to exactly 1.0 and blow the
        # double-log up to +inf (same clamp literal in the SQL mirror)
        u = np.minimum(
            (hs.to_numpy(dtype=np.float64) + 1.0) / two60, 0.9999999999999999
        )
        g = -np.log(-np.log(u))
        return pd.Series(np.floor(g * 1_000_000).astype(np.int64))

    keyed = weights.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(weight_col).cast("long").alias("weight_fp"),
        (F.col(weight_col).cast("long") + gumbel_fp(h)).alias("key_fp"),
    )
    top = keyed.orderBy(F.col("key_fp").desc(), F.col("id").asc()).limit(n)
    w = Window.orderBy(F.col("key_fp").desc(), F.col("id").asc())
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"),
        "id",
        "weight_fp",
        "key_fp",
    )
