"""Hybrid lexical+vector retrieval with Reciprocal Rank Fusion.

RRF (Cormack/Clarke/Buettcher, SIGIR 2009 — public method, also the
fusion default in several open search engines): each ranked list
contributes ``1/(k0 + rank)`` and a document's fused score is the sum
of its contributions. No score normalization across modalities is
needed, which is the whole point — BM25 scores and cosine sims never
share a scale.

Scale shape: the two top-n lists are produced by their own
distributed plans (a pruned packed-index scan for BM25, one
embeddings scan + TakeOrdered for the vector side); the fusion
itself is a full-outer join of two <=n-row sets — driver-trivial at
any corpus size. At 100 TB the cost IS the two retrievals; fusion
adds nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.ops.similarity import cosine_topk_float


def hybrid_rrf(
    searcher,
    embeddings: DataFrame,
    query,
    query_vec: list[float],
    n_each: int = 50,
    k: int = 10,
    k0: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fuse the BM25 top-``n_each`` for ``query`` with the cosine
    top-``n_each`` for ``query_vec`` by reciprocal rank: score(d) =
    1/(k0 + bm25_rank) + 1/(k0 + cosine_rank), a missing list
    contributing 0 (rank reported as 0 = absent).

    Both contributions are IEEE doubles added in a fixed order
    (lexical first), so the fused score is bit-deterministic.
    Output: (rank, id, rrf, r_bm25, r_ann) top-k by (rrf desc, id asc).
    """
    bm = searcher.search_df(query, n_each)
    w = Window.orderBy(F.col("score").desc(), F.col("docid").asc())
    bm_r = bm.select(
        F.col("docid").cast("long").alias("id"),
        F.row_number().over(w).cast("long").alias("r_bm25"),
    )
    ann = cosine_topk_float(
        embeddings, query_vec, k=n_each, id_col=id_col, vec_col=vec_col
    ).select("id", F.col("rank").alias("r_ann"))
    fused = bm_r.join(ann, "id", "full_outer")
    c_bm = F.when(
        F.col("r_bm25").isNotNull(),
        F.lit(1.0) / (F.lit(float(k0)) + F.col("r_bm25").cast("double")),
    ).otherwise(F.lit(0.0))
    c_ann = F.when(
        F.col("r_ann").isNotNull(),
        F.lit(1.0) / (F.lit(float(k0)) + F.col("r_ann").cast("double")),
    ).otherwise(F.lit(0.0))
    out = fused.select(
        "id",
        (c_bm + c_ann).alias("rrf"),
        F.coalesce(F.col("r_bm25"), F.lit(0)).cast("long").alias("r_bm25"),
        F.coalesce(F.col("r_ann"), F.lit(0)).cast("long").alias("r_ann"),
    )
    w2 = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    return (
        out.orderBy(F.col("rrf").desc(), F.col("id").asc())
        .limit(k)
        .select(
            F.row_number().over(w2).cast("long").alias("rank"),
            "id",
            "rrf",
            "r_bm25",
            "r_ann",
        )
    )
