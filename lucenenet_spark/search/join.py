"""Query-time join — JoinUtil.CreateJoinQuery (reference
``src/Lucene.Net.Join/JoinUtil.cs:61``): match documents whose
``to_field`` value appears among the ``from_field`` values of a first
query's matches, optionally carrying from-side scores across the join
(ScoreMode None/Max/Total/Avg).

Spark shape: the from-side scored set joins the docs table for its
join values, aggregates one row PER VALUE (map-side combined hash
agg — the reference's TermsCollector/TermsWithScoreCollector), and the
to side is a broadcast-or-shuffle join on that value set; Catalyst
picks the strategy from stats. Total/Avg fold from-side float32 scores
in docid order (a deterministic, partition-count-invariant fold — an
unordered SQL SUM over floats would not be reproducible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import Query
from lucenenet_spark.search.searcher import IndexSearcher

SCORE_MODES = ("none", "max", "total", "avg")


def to_parent_join(
    searcher: IndexSearcher,
    child_query: Query,
    parent_col,
    score_mode: str = "max",
    k: int | None = 10,
) -> DataFrame:
    """Parent/child block join — ToParentBlockJoinQuery semantics
    (reference ``src/Lucene.Net.Join/ToParentBlockJoinQuery.cs``):
    score PARENT documents from their matching children, ScoreMode
    folding child scores per parent. The reference encodes the
    parent/child relation positionally (children precede their parent
    in a doc block); columnar corpora carry it as a parent-id
    expression/column instead — ``parent_col`` is any Column over the
    docs table (e.g. ``F.col('parent_id')`` or a derived expression)
    yielding each child's parent docid. Output (docid=parent, score).

    Same fold discipline as :func:`join_query`: total/avg accumulate
    child float32 scores in child-docid order (deterministic,
    partition-count invariant)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    docs = searcher.index.docs
    kids = (
        searcher.scored_docs(child_query)
        .join(docs.select("docid", parent_col.cast("long").alias("__p")), "docid")
        .where(F.col("__p").isNotNull() & (F.col("__p") != F.col("docid")))
    )
    if score_mode == "none":
        parents = kids.select("__p").distinct().withColumn(
            "score", F.lit(1.0).cast("float")
        )
    elif score_mode == "max":
        parents = kids.groupBy("__p").agg(F.max("score").alias("score"))
    else:
        agg = kids.groupBy("__p").agg(
            F.sort_array(F.collect_list(F.struct("docid", "score"))).alias("ds")
        )
        want_avg = score_mode == "avg"

        @F.pandas_udf("float")
        def fold(ds: pd.Series) -> pd.Series:
            out = np.empty(len(ds), dtype=np.float32)
            for i, lst in enumerate(ds):
                acc = np.float32(0.0)
                for item in lst:
                    acc = np.float32(acc + np.float32(item["score"]))
                if want_avg:
                    acc = np.float32(acc / np.float32(len(lst)))
                out[i] = acc
            return pd.Series(out)

        parents = agg.select("__p", fold(F.col("ds")).alias("score"))
    out = (
        parents.select(F.col("__p").alias("docid"), "score")
        .join(docs.select("docid"), "docid", "left_semi")  # parent must exist
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )
    return out.limit(k) if k is not None else out


def to_child_join(
    searcher: IndexSearcher,
    parent_query: Query,
    parent_col,
    k: int | None = 10,
) -> DataFrame:
    """Child-ward block join — ToChildBlockJoinQuery semantics
    (reference ``src/Lucene.Net.Join/ToChildBlockJoinQuery.cs:36``):
    match every CHILD document whose parent matches ``parent_query``,
    each child carrying its parent's score (doScores=true). The
    inverse of :func:`to_parent_join`, sharing its columnar
    parent-relation model: ``parent_col`` maps each child row to its
    parent docid (self-parented rows are the parents themselves and
    are excluded from the child set).

    Spark shape: parent scored set (already deduped by docid) joins
    the docs table's child->parent edges — Catalyst broadcasts the
    scored side when small (top-level parent queries usually are
    after filtering); no fold needed, scores pass through unchanged.
    """
    docs = searcher.index.docs
    parents = searcher.scored_docs(parent_query).select(
        F.col("docid").alias("__p"), "score"
    )
    children = docs.select(
        "docid", parent_col.cast("long").alias("__p")
    ).where(F.col("__p").isNotNull() & (F.col("__p") != F.col("docid")))
    out = (
        children.join(parents, "__p")
        .select("docid", "score")
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )
    return out.limit(k) if k is not None else out


def join_query(
    searcher: IndexSearcher,
    from_query: Query,
    from_field: str,
    to_field: str,
    score_mode: str = "none",
    k: int | None = 10,
) -> DataFrame:
    """(docid, score) of to-side documents. score per join value:
    none -> 1.0; max -> max of from-side scores; total -> float32
    docid-ordered sum; avg -> float32(total / count)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    docs = searcher.index.docs
    from_vals = (
        searcher.scored_docs(from_query)
        .join(docs.select("docid", F.col(from_field).alias("__v")), "docid")
        .where(F.col("__v").isNotNull())
    )
    if score_mode == "none":
        per_value = from_vals.select("__v").distinct().withColumn(
            "__s", F.lit(1.0).cast("float")
        )
    elif score_mode == "max":
        per_value = from_vals.groupBy("__v").agg(F.max("score").alias("__s"))
    else:
        agg = from_vals.groupBy("__v").agg(
            F.sort_array(F.collect_list(F.struct("docid", "score"))).alias("ds"),
        )
        want_avg = score_mode == "avg"

        @F.pandas_udf("float")
        def fold(ds: pd.Series) -> pd.Series:
            out = np.empty(len(ds), dtype=np.float32)
            for i, lst in enumerate(ds):
                acc = np.float32(0.0)
                for item in lst:
                    acc = np.float32(acc + np.float32(item["score"]))
                if want_avg:
                    acc = np.float32(acc / np.float32(len(lst)))
                out[i] = acc
            return pd.Series(out)

        per_value = agg.select("__v", fold(F.col("ds")).alias("__s"))
    out = (
        docs.select("docid", F.col(to_field).alias("__v"))
        .join(per_value, "__v")
        .select("docid", F.col("__s").alias("score"))
        .orderBy(F.col("score").desc(), F.col("docid").asc())
    )
    return out.limit(k) if k is not None else out


def to_parent_join_with_children(
    searcher: IndexSearcher,
    child_query: Query,
    parent_col,
    score_mode: str = "max",
    k: int = 10,
    children_per_parent: int = 3,
) -> DataFrame:
    """ToParentBlockJoinCollector (reference
    ``src/Lucene.Net.Join/ToParentBlockJoinCollector.cs:55``
    ``GetTopGroups``): the top-k parents (scored like
    :func:`to_parent_join`) each with their top-N matching children —
    the 'show the best chunks under each file' result shape.

    Output: (parent_rank, parent, parent_score, child_rank, child,
    child_score) — one row per retained child.

    Plan: the parent fold reuses to_parent_join (one hash agg); the
    child top-N is a window over (parent, child score) partitioned by
    parent — bounded per group, no global window."""
    from pyspark.sql import Window

    if score_mode not in SCORE_MODES:
        raise ValueError(f"score_mode must be one of {SCORE_MODES}")
    docs = searcher.index.docs
    kids = (
        searcher.scored_docs(child_query)
        .join(docs.select("docid", parent_col.cast("long").alias("__p")), "docid")
        .where(F.col("__p").isNotNull() & (F.col("__p") != F.col("docid")))
        .select(
            F.col("__p").alias("parent"),
            F.col("docid").alias("child"),
            F.col("score").alias("child_score"),
        )
    )
    parents = (
        to_parent_join(searcher, child_query, parent_col, score_mode, k=k)
        .select(
            F.col("docid").alias("parent"),
            F.col("score").alias("parent_score"),
        )
    )
    wp = Window.orderBy(F.col("parent_score").desc(), F.col("parent").asc())
    ranked_parents = parents.withColumn(
        "parent_rank", F.row_number().over(wp).cast("long")
    )
    wc = Window.partitionBy("parent").orderBy(
        F.col("child_score").desc(), F.col("child").asc()
    )
    top_children = (
        kids.join(F.broadcast(ranked_parents), "parent")
        .withColumn("child_rank", F.row_number().over(wc).cast("long"))
        .where(F.col("child_rank") <= children_per_parent)
    )
    return top_children.select(
        "parent_rank",
        "parent",
        F.col("parent_score").cast("double").alias("parent_score"),
        "child_rank",
        "child",
        F.col("child_score").cast("double").alias("child_score"),
    ).orderBy("parent_rank", "child_rank")
