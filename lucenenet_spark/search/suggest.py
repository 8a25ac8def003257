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

    def __init__(self, entries: DataFrame, surface_col: str, weight_col):
        """``weight_col`` may be a column NAME (DocumentDictionary,
        ``Suggest/DocumentDictionary.cs:40`` — weight from a stored
        field) or a Column EXPRESSION (DocumentValueSourceDictionary,
        ``Suggest/DocumentValueSourceDictionary.cs:36`` — weight
        computed per document by a ValueSource)."""
        import pandas as pd

        wcol = F.col(weight_col) if isinstance(weight_col, str) else weight_col
        src = entries.select(
            F.col(surface_col).alias("surface"),
            wcol.cast("long").alias("weight"),
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
        # ctx_cnt is a 1-row aggregate: broadcast for plan hygiene
        # (BroadcastNestedLoopJoin -> trivial broadcast product)
        scored = cand.crossJoin(F.broadcast(ctx_cnt)).where(F.col("cc") > 0).select(
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


def suggest_stop_analyze(key: str) -> tuple[list[str], str | None]:
    """Query-side analysis for the infix suggesters: tokenize +
    lowercase the key, then apply SuggestStopFilter semantics
    (``Suggest/Analyzing/SuggestStopFilter.cs:42``): stopwords are
    removed EXCEPT a trailing token that reaches the very end of the
    key (the user is still typing it — "find the" keeps "the").

    The trailing-token split is AnalyzingInfixSuggester.DoLookup's
    maxEndOffset rule (``AnalyzingInfixSuggester.cs:533``): when the
    last token's end offset equals the key length (no trailing
    discarded chars such as whitespace), it is an unfinished PREFIX
    token; otherwise it is a finished exact term (and stop-filters
    like the rest).

    Returns ``(full_tokens, prefix_token)`` — full tokens match
    exactly, prefix_token (or None) matches by startswith.
    """
    from lucenenet_spark.analysis.analyzer import (
        ENGLISH_STOP_WORDS,
        analyze_offsets,
    )

    toks = analyze_offsets(key or "")
    if not toks:
        return [], None
    last_term, _, _, last_end = toks[-1]
    ends_mid_token = last_end == len(key)
    if ends_mid_token:
        full = [t for t, _, _, _ in toks[:-1] if t not in ENGLISH_STOP_WORDS]
        return full, last_term
    full = [t for t, _, _, _ in toks if t not in ENGLISH_STOP_WORDS]
    return full, None


class AnalyzingInfixSuggester:
    """Infix suggester (``Suggest/Analyzing/AnalyzingInfixSuggester.cs:75``):
    suggestions match when EVERY (allTermsRequired) or ANY query token
    appears ANYWHERE in the suggestion's analyzed token stream — the
    finished tokens exactly, the unfinished last token as a prefix of
    any token — ranked purely by suggestion weight (the reference's
    ``SORT`` on the weight field, ``:120``), NOT by score.

    The reference indexes suggestions into a private Lucene index
    (text + exacttext fields) sorted by weight for early termination;
    here the (surface, weight, toks, poss) table is a DataFrame and a
    lookup is a token-set predicate + bounded TakeOrderedAndProject —
    entirely JVM-side (``array_contains`` / ``exists``), one scan of
    the suggestion table, no shuffle. At scale the table partitions
    like any dimension table; the per-row token arrays keep the match
    a row-local predicate so filter parallelism is perfect.

    ``lookup_blended`` is BlendedInfixSuggester
    (``Suggest/Analyzing/BlendedInfixSuggester.cs:37``): retrieve
    ``n * num_factor`` hits by weight, then re-rank by
    ``trunc(weight * coefficient)`` where the coefficient derives from
    the FIRST analyzed position at which any query token matches —
    POSITION_LINEAR ``1 - 0.10*p`` (``:50,80``) or POSITION_RECIPROCAL
    ``1/(1+p)`` (``:84``).

    Determinism note: the reference breaks weight ties by index
    docid; this build pins (weight desc, surface asc) — documented
    divergence, and driver entries feed weight-deduped surfaces.
    """

    def __init__(self, entries: DataFrame, surface_col: str, weight_col: str):
        src = entries.select(
            F.col(surface_col).alias("surface"),
            F.col(weight_col).cast("long").alias("weight"),
        )

        def tokenized(iterator):
            from lucenenet_spark.analysis.analyzer import analyze

            for pdf in iterator:
                rows = [analyze(s or "") for s in pdf["surface"]]
                out = pdf.copy()
                out["toks"] = [[t for t, _ in r] for r in rows]
                out["poss"] = [[p for _, p in r] for r in rows]
                yield out[[len(r) > 0 for r in rows]]

        self.table = src.mapInPandas(
            tokenized,
            schema="surface string, weight long, toks array<string>, poss array<int>",
        ).persist()

    @staticmethod
    def _tok_match(full: list[str], prefix: str | None):
        """Per-token predicate: exact member of ``full`` or startswith
        ``prefix`` — the union the blended coefficient scan needs."""
        def pred(tok):
            cond = F.lit(False)
            if full:
                cond = cond | tok.isin(full)
            if prefix is not None:
                cond = cond | tok.startswith(prefix)
            return cond

        return pred

    def _where(self, full: list[str], prefix: str | None, all_required: bool):
        clauses = [F.array_contains(F.col("toks"), t) for t in full]
        if prefix is not None:
            p = prefix
            clauses.append(
                F.exists(F.col("toks"), lambda tok: tok.startswith(p))
            )
        if not clauses:
            return F.lit(False)
        out = clauses[0]
        for c in clauses[1:]:
            out = (out & c) if all_required else (out | c)
        return out

    def lookup(
        self,
        key: str,
        n: int = 5,
        all_terms_required: bool = True,
        do_highlight: bool = False,
    ) -> DataFrame:
        """Output (surface, weight[, highlighted]) ranked (weight desc,
        surface asc) — AnalyzingInfixSuggester.DoLookup with the SORT
        on weight. ``do_highlight`` rebuilds the surface with matched
        whole tokens wrapped ``<b>tok</b>`` and the prefix portion of
        prefix-matched tokens wrapped ``<b>pre</b>fix`` (the
        reference's Highlight/AddWholeMatch/AddPrefixMatch,
        ``AnalyzingInfixSuggester.cs:708,775,792``)."""
        full, prefix = suggest_stop_analyze(key)
        hits = (
            self.table.where(self._where(full, prefix, all_terms_required))
            .select("surface", "weight")
            .orderBy(F.col("weight").desc(), F.col("surface").asc())
            .limit(n)
        )
        if not do_highlight:
            return hits

        full_set = set(full)
        pfx = prefix

        def highlighted(iterator):
            from lucenenet_spark.analysis.analyzer import analyze_offsets

            for pdf in iterator:
                out_rows = []
                for text in pdf["surface"]:
                    sb, upto = [], 0
                    for tok, _, start, end in analyze_offsets(text or ""):
                        if upto < start:
                            sb.append(text[upto:start])
                            upto = start
                        elif upto > start:
                            continue
                        if tok in full_set:
                            sb.append("<b>" + text[start:end] + "</b>")
                            upto = end
                        elif pfx is not None and tok.startswith(pfx):
                            cut = start + len(pfx)
                            sb.append("<b>" + text[start:cut] + "</b>")
                            sb.append(text[cut:end])
                            upto = end
                    sb.append(text[upto:])
                    out_rows.append("".join(sb))
                out = pdf.copy()
                out["highlighted"] = out_rows
                yield out

        return hits.mapInPandas(
            highlighted, schema="surface string, weight long, highlighted string"
        )

    def lookup_blended(
        self,
        key: str,
        n: int = 5,
        blender: str = "linear",
        num_factor: int = 10,
        all_terms_required: bool = True,
    ) -> DataFrame:
        """BlendedInfixSuggester two-stage lookup: stage 1 takes the
        top ``n * num_factor`` hits by raw weight (the reference's
        ``DoLookup(num * numFactor)``, ``BlendedInfixSuggester.cs:143``),
        stage 2 re-ranks those by ``score = trunc(weight * coefficient)``
        with the coefficient from the first matching analyzed position
        and returns ``n``. Output (surface, weight, first_pos, score).

        The position scan is a row-local array fold (zip toks/poss →
        filter matching → min position) — no extra join, exactly the
        term-vector walk of ``CreateCoefficient`` (``:252``) turned
        into a Column expression."""
        full, prefix = suggest_stop_analyze(key)
        stage1 = (
            self.table.where(self._where(full, prefix, all_terms_required))
            .orderBy(F.col("weight").desc(), F.col("surface").asc())
            .limit(n * num_factor)
        )
        pred = self._tok_match(full, prefix)
        zipped = F.arrays_zip(F.col("toks"), F.col("poss"))
        first_pos = F.array_min(
            F.transform(
                F.filter(zipped, lambda s: pred(s["toks"])),
                lambda s: s["poss"],
            )
        ).cast("int")
        if blender == "linear":
            coeff = F.lit(1.0) - F.lit(0.10) * F.col("first_pos").cast("double")
        elif blender == "reciprocal":
            coeff = F.lit(1.0) / (F.col("first_pos").cast("double") + F.lit(1.0))
        else:
            raise ValueError(f"unknown blender: {blender!r}")
        return (
            stage1.withColumn("first_pos", first_pos)
            .withColumn(
                "score",
                (F.col("weight").cast("double") * coeff).cast("long"),
            )
            .select("surface", "weight", "first_pos", "score")
            .orderBy(F.col("score").desc(), F.col("surface").asc())
            .limit(n)
        )
