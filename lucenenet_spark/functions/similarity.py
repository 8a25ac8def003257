"""Pluggable similarity — the §2.11 custom-similarity extension point
made concrete (reference ``Search/Similarities/Similarity.cs``;
``BM25Similarity.cs``; ``TFIDFSimilarity.cs`` / DefaultSimilarity).

A Similarity supplies two vectorized float32 primitives the term
scorer composes:

- ``weight(df, max_doc, boost)`` — the frozen per-term query weight
  (the reference computes this once in Weight; we bake it into the
  Arrow UDF closure).
- ``score(freq_f32, norm_bytes, weight)`` — per-posting float32
  scores from term frequency and the stored norm byte.

Both implementations reuse the SAME norm byte the index stores
(SmallFloat byte315 of 1/sqrt(field_length) — the reference encodes
the identical byte for both similarities, which is what makes them
swappable without reindexing).

ClassicSimilarity omits queryNorm (a per-query constant: it rescales
every score identically, so ranking — the north rule's criterion — is
unchanged; the reference itself calls queryNorm "just cosmetic").
"""

from __future__ import annotations

import numpy as np

from lucenenet_spark.functions import bm25
from lucenenet_spark.functions.smallfloat import byte315_to_float


class BM25Similarity:
    """The default: k1=1.2, b=0.75, norm-byte cache
    (``BM25Similarity.cs:143-264``)."""

    name = "bm25"

    def __init__(self, avgdl: np.float32):
        self.cache = bm25.norm_cache(avgdl)

    def weight(self, df: int, max_doc: int, boost: float) -> np.float32:
        return bm25.term_weight(bm25.idf(df, max_doc), boost)

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        """Phrase weight: float32-ordered sum of the terms' idfs, then
        the scorer's (k1+1) fold — ``BM25Similarity.IdfExplain(
        collectionStats, termStats[])`` (BM25Similarity.cs:190-205)."""
        idfs = np.array([bm25.idf(df, max_doc) for df in dfs])
        return bm25.term_weight(bm25.float32_ordered_sum(idfs), boost)

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        c = self.cache[np.asarray(norm_bytes, dtype=np.uint8)]
        f = np.asarray(f, dtype=np.float32)
        return (np.float32(w) * f / (f + c)).astype(np.float32)


class ClassicSimilarity:
    """TF-IDF / DefaultSimilarity (``TFIDFSimilarity.cs``,
    ``DefaultSimilarity.cs``): idf = ln(maxDoc/(df+1)) + 1,
    tf = sqrt(freq), norm = byte315-decoded 1/sqrt(field_length);
    score = tf * idf^2 * boost * norm (queryNorm omitted — constant
    per query, rank-identical)."""

    name = "classic"

    def __init__(self, avgdl: np.float32 | None = None):  # avgdl unused
        pass

    def weight(self, df: int, max_doc: int, boost: float) -> np.float32:
        idf = np.float32(np.log(max_doc / (float(df) + 1.0)) + 1.0)
        return np.float32(np.float32(idf * idf) * np.float32(boost))

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        """Phrase weight: summed classic idf, squared
        (``TFIDFSimilarity.IdfExplain(collectionStats, termStats[])``
        sums per-term idfs; the doc scorer multiplies queryWeight *
        idf = idf² * boost)."""
        acc = np.float32(0.0)
        for df in dfs:
            acc = np.float32(
                acc + np.float32(np.log(max_doc / (float(df) + 1.0)) + 1.0)
            )
        return np.float32(np.float32(acc * acc) * np.float32(boost))

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        tf = np.sqrt(np.asarray(f, dtype=np.float64)).astype(np.float32)
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        return (np.float32(w) * tf * nd).astype(np.float32)
