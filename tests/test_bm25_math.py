"""BM25 float32 math golden fixtures (FIXTURES.md §4) against the
formulas at BM25Similarity.cs:67-70 (idf), :91-102 (avgdl), :226-231
(cache), :254-264 (score)."""

import math

import numpy as np

from lucenenet_spark.functions import bm25
from lucenenet_spark.functions.smallfloat import NORM_TABLE, norm_byte_from_length


def test_idf_formula():
    # idf = (float) log(1 + (N - df + 0.5)/(df + 0.5)) — double math, f32 result
    assert bm25.idf(1, 100) == np.float32(math.log(1 + (100 - 1 + 0.5) / 1.5))
    assert bm25.idf(50, 100) == np.float32(math.log(1 + 50.5 / 50.5))
    vals = bm25.idf(np.array([1, 2, 99]), 100)
    assert vals.dtype == np.float32
    # idf is positive even at df == maxDoc (log1p of positive)
    assert bm25.idf(100, 100) > 0


def test_avgdl():
    assert bm25.avg_field_length(0, 10) == np.float32(1.0)
    assert bm25.avg_field_length(-1, 10) == np.float32(1.0)
    assert bm25.avg_field_length(1000, 30) == np.float32(1000 / 30.0)


def test_cache_formula():
    avgdl = np.float32(7.5)
    cache = bm25.norm_cache(avgdl)
    assert cache.dtype == np.float32
    k1, b = np.float32(1.2), np.float32(0.75)
    for i in (0, 1, 100, 124, 255):
        exp = k1 * ((np.float32(1) - b) + b * NORM_TABLE[i] / avgdl)
        assert cache[i] == np.float32(exp)


def test_score_micro_corpus():
    """5-doc micro corpus, hand-computed BM25 for one term."""
    # field lengths: 3, 5, 8, 2, 10 ; term appears with freqs 1,0,2,1,0
    fls = np.array([3, 5, 8, 2, 10])
    norms = norm_byte_from_length(fls)
    max_doc = 5
    sum_ttf = int(fls.sum())  # 28
    df, freq = 3, np.array([1, 2, 1], dtype=np.int64)
    docs = np.array([0, 2, 3])
    avgdl = bm25.avg_field_length(sum_ttf, max_doc)
    assert avgdl == np.float32(28 / 5.0)
    w = bm25.term_weight(bm25.idf(df, max_doc))
    cache = bm25.norm_cache(avgdl)
    scores = bm25.score(freq, norms[docs], w, cache)
    assert scores.dtype == np.float32
    # manual recomputation, float32 step-by-step
    idf = np.float32(math.log(1 + (5 - 3 + 0.5) / 3.5))
    weight = np.float32(idf * np.float32(1.0) * np.float32(2.2))
    for i, (f, d) in enumerate(zip(freq, docs)):
        c = np.float32(1.2) * (np.float32(0.25) + np.float32(0.75) * NORM_TABLE[norms[d]] / avgdl)
        exp = np.float32(weight * np.float32(f) / (np.float32(f) + c))
        assert scores[i] == exp
    # doc with freq=2 but longer field: ordering sanity
    assert scores[2] > scores[0]  # fl=2 beats fl=3 at same freq


def test_ordered_sum_is_deterministic():
    vals = np.array([0.1, 0.2, 0.3, 1e-8], dtype=np.float32)
    a = bm25.float32_ordered_sum(vals)
    b = bm25.float32_ordered_sum(vals)
    assert a == b and a.dtype == np.float32
