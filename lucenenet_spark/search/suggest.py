"""Spellcheck / did-you-mean over the term dictionary (reference
``src/Lucene.Net.Suggest/Spell/SpellChecker.cs:50`` SuggestSimilar and
``Suggest/Analyzing/AnalyzingSuggester.cs:90`` prefix completion).

Both are dictionary scans — the reference walks an FST/n-gram index;
here the term_stats DataFrame IS the dictionary (driver-cached for
small dictionaries, a broadcast-size predicate scan otherwise), so
each suggester is a filter + bounded TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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


def free_text_suggest(
    docs: DataFrame,
    context: list[str],
    prefix: str = "",
    k: int = 5,
    grams: int = 3,
    alpha: float = 0.4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """FreeTextSuggester (``Suggest/Analyzing/FreeTextSuggester.cs:77``):
    next-word prediction from an n-gram language model with stupid
    backoff (Brants et al. 2007, the reference's ALPHA=0.4 at ``:107``).

    Pinned spec: for order n = grams..1, candidates are words x with
    ``count(context[-(n-1):] + x) > 0`` and ``x.startswith(prefix)``,
    scored ``alpha^(grams-n) * count(gram) / count(context_gram)``
    (order-1 context count = total tokens). A word keeps its
    HIGHEST-order score (the reference's seen-set dedup across backoff
    levels), ties break by term. The backoff factor is computed once
    driver-side and injected as a literal so both engines multiply the
    exact same double. Tokenization = the ops tokenizer (no stop
    removal — continuations need natural word statistics).

    Scale shape: order-n counts are map-side-combined hash aggregates
    over the corpus scan with the context filter PUSHED BELOW the agg
    (only grams starting with the queried context are aggregated);
    context counts are scalar single-row frames cross-joined in. No
    per-query model materialization."""
    from lucenenet_spark.ops.text import _tokens, _word_grams

    toks = docs.select(_tokens(text_col).alias("toks"))
    frames = []
    for n in range(grams, 0, -1):
        ctx = context[-(n - 1):] if n > 1 else []
        if len(ctx) < n - 1:
            continue  # not enough context for this order
        factor = float(alpha ** (grams - n))
        g = toks.select(F.explode(_word_grams(F.col("toks"), n)).alias("gram"))
        if n > 1:
            head = " ".join(ctx) + " "
            cand = (
                g.where(F.col("gram").startswith(head + prefix))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
                .select(
                    F.substring(F.col("gram"), len(head) + 1, 1000000).alias("term"),
                    "c",
                )
            )
            ctx_cnt = (
                toks.select(
                    F.explode(_word_grams(F.col("toks"), n - 1)).alias("g2")
                )
                .where(F.col("g2") == " ".join(ctx))
                .agg(F.count(F.lit(1)).cast("long").alias("cc"))
            )
        else:
            cand = (
                g.where(F.col("gram").startswith(prefix))
                .groupBy("gram")
                .agg(F.count(F.lit(1)).cast("long").alias("c"))
                .select(F.col("gram").alias("term"), "c")
            )
            ctx_cnt = toks.select(F.explode("toks").alias("t")).agg(
                F.count(F.lit(1)).cast("long").alias("cc")
            )
        scored = cand.crossJoin(ctx_cnt).where(F.col("cc") > 0).select(
            "term",
            F.lit(n).cast("int").alias("ord"),
            (
                F.lit(factor)
                * (F.col("c").cast("double") / F.col("cc").cast("double"))
            ).alias("score"),
        )
        frames.append(scored)
    if not frames:
        return docs.sparkSession.createDataFrame(
            [], "term string, ord int, score double"
        )
    allc = frames[0]
    for f in frames[1:]:
        allc = allc.unionByName(f)
    w = Window.partitionBy("term").orderBy(F.col("ord").desc())
    return (
        allc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("term", "ord", "score")
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(k)
    )
