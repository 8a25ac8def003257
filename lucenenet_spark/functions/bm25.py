"""Float32-faithful BM25 (k1=1.2, b=0.75) scoring primitives.

Every arithmetic step mirrors the reference operation-for-operation in
float32 (numpy), because Spark SQL promotes to double and would drift
from the reference's float math:

- idf:   ``log(1 + (maxDoc - df + 0.5)/(df + 0.5))`` computed in double
  then truncated to float32 — ``BM25Similarity.cs:67-70`` (Idf), with
  maxDoc not numDocs (:183-189, IdfExplain).
- avgdl: ``sumTotalTermFreq / (double)maxDoc`` cast to float32, 1.0 if
  the stat is missing — ``BM25Similarity.cs:91-102`` (AvgFieldLength).
- cache: per-norm-byte freq-independent part,
  ``k1 * ((1 - b) + b * NORM_TABLE[byte] / avgdl)`` over all 256 bytes
  — ``BM25Similarity.cs:226-231`` (ComputeWeight).
- score: ``weight * freq / (freq + cache[norm])`` with
  ``weight = idf * boost * (k1 + 1)`` — ``BM25Similarity.cs:254-264``
  (BM25DocScorer.Score); boolean score = sum of clause scores, coord=1
  and queryNorm=1 for BM25 (``BooleanQuery.cs:286-292``,
  ``Similarity.cs:119-140``).

Vectorized numpy throughout; used inside Arrow/pandas UDFs.
"""

from __future__ import annotations

import numpy as np

from lucenenet_spark.functions.smallfloat import NORM_TABLE

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(df: np.ndarray | int, max_doc: int) -> np.ndarray:
    """float32 idf; df/max_doc math in double, result truncated to f32."""
    dfd = np.asarray(df, dtype=np.float64)
    return np.log1p((max_doc - dfd + 0.5) / (dfd + 0.5)).astype(np.float32)


def avg_field_length(sum_total_term_freq: int, max_doc: int) -> np.float32:
    if sum_total_term_freq <= 0:
        return np.float32(1.0)
    return np.float32(sum_total_term_freq / float(max_doc))


def norm_cache(avgdl: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """256-entry float32 cache of the freq-independent denominator part."""
    return (k1 * ((np.float32(1.0) - b) + b * NORM_TABLE / avgdl)).astype(np.float32)


def term_weight(idf_val: np.float32, boost: float = 1.0, k1: np.float32 = K1) -> np.float32:
    """weight = idf * boost * (k1 + 1); boost folded via Normalize
    (BM25Similarity.cs:330-335: weight = idf * boost; scorer multiplies
    by (k1+1) once, BM25DocScorer ctor)."""
    return np.float32(np.float32(idf_val) * np.float32(boost) * (k1 + np.float32(1.0)))


def score(
    freq: np.ndarray,
    norm_bytes: np.ndarray,
    weight: np.float32,
    cache: np.ndarray,
) -> np.ndarray:
    """score = weight * freq / (freq + cache[norm]) — all float32."""
    f = np.asarray(freq, dtype=np.float32)
    c = cache[np.asarray(norm_bytes, dtype=np.uint8)]
    return (weight * f / (f + c)).astype(np.float32)


def float32_ordered_sum(values: np.ndarray) -> np.float32:
    """Left-to-right float32 accumulation (clause-score summation order
    must be deterministic for rank-identical results; we pin query
    clause order)."""
    acc = np.float32(0.0)
    for v in np.asarray(values, dtype=np.float32):
        acc = np.float32(acc + v)
    return acc
