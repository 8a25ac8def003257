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


def test_sweetspot_degenerate_equals_classic():
    """SweetSpotSimilarity.cs: min=max=1, steep=0.5, tf base=min=0
    degrades to 1/sqrt(x) lengthNorm and sqrt(freq) tf — i.e. classic."""
    from lucenenet_spark.functions.similarity import (
        ClassicSimilarity,
        SweetSpotSimilarity,
    )

    f = np.arange(0, 35, dtype=np.float32)
    # bytes <= 124 decode to <= 1.0, i.e. doc length >= 1 — the only
    # range the index ever writes (ComputeLengthNorm takes int >= 1)
    nb = np.arange(90, 125, dtype=np.uint8)
    w = np.float32(1.7)
    got = SweetSpotSimilarity().score(f, nb, w)
    want = ClassicSimilarity().score(f, nb, w)
    assert np.allclose(got, want, rtol=1e-6)


def test_sweetspot_matches_reference_math():
    """Pinned against a scalar recompute of SweetSpotSimilarity.cs
    BaselineTf (:171) and ComputeLengthNorm (:141), float32 op order."""
    from lucenenet_spark.functions.similarity import SweetSpotSimilarity
    from lucenenet_spark.functions.smallfloat import byte315_to_float

    lo, hi, st, tb, tm = 2, 8, 0.5, 1.5, 2.0
    s = SweetSpotSimilarity(ln_min=lo, ln_max=hi, steepness=st, tf_base=tb, tf_min=tm)
    f = np.array([0, 1, 2, 3, 7, 25], dtype=np.float32)
    nb = np.array([100, 110, 115, 118, 120, 124], dtype=np.uint8)
    w = np.float32(2.25)
    got = s.score(f, nb, w)
    for i in range(len(f)):
        freq = np.float32(f[i])
        if freq == 0:
            tf = np.float32(0.0)
        elif freq <= np.float32(tm):
            tf = np.float32(tb)
        else:
            tf = np.float32(
                math.sqrt(
                    np.float32(
                        np.float32(freq + np.float32(np.float32(tb) * np.float32(tb)))
                        - np.float32(tm)
                    )
                )
            )
        d = byte315_to_float(np.array([nb[i]], dtype=np.uint8))[0]
        x = np.float32(np.float32(1.0) / np.float32(d * d))
        t = np.float32(
            np.float32(np.float32(abs(np.float32(x - lo))) + np.float32(abs(np.float32(x - hi))))
            - np.float32(hi - lo)
        )
        inner = np.float32(np.float32(np.float32(st) * t) + np.float32(1.0))
        norm = np.float32(1.0 / math.sqrt(float(inner)))
        want = np.float32(np.float32(w * tf) * norm)
        assert got[i] == want, (i, got[i], want)


def test_sweetspot_plateau_is_flat():
    """Docs whose recovered length falls inside [min, max] share
    lengthNorm 1.0 (the plateau), outside it decays."""
    from lucenenet_spark.functions.similarity import SweetSpotSimilarity
    from lucenenet_spark.functions.smallfloat import norm_byte_from_length

    # plateau bounds padded for the norm byte's recovered-length
    # quantization (length 10's byte recovers as 10.24)
    s = SweetSpotSimilarity(ln_min=3, ln_max=11, steepness=0.5)
    nb = np.array(
        [norm_byte_from_length(n) for n in (3, 5, 10, 40)], dtype=np.uint8
    )
    f = np.ones(4, dtype=np.float32)
    got = s.score(f, nb, np.float32(1.0))
    assert got[0] == got[1] == got[2] == np.float32(1.0)
    assert got[3] < got[2]
