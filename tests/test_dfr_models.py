"""Unit tests for the nonlinear DFR basic models (P/D/Be) and
NormalizationZ — numpy-only (the driver entries cover the score-bit
oracle parity; these pin the packing contracts and the reference
formulas at the function level, BasicModelP.cs:46 / BasicModelD.cs:33
/ BasicModelBE.cs:36 / NormalizationZ.cs:47)."""

from __future__ import annotations

import numpy as np
import pytest

from lucenenet_spark.functions.similarity import DFRSimilarity
from lucenenet_spark.functions.smallfloat import byte315_to_float


def _dl_of(norm_byte: int) -> float:
    nd = float(byte315_to_float(np.array([norm_byte], dtype=np.uint8))[0])
    return float(np.float32(1.0 / (np.float32(nd) * np.float32(nd))))


def test_p_matches_reference_formula():
    sim = DFRSimilarity(np.float32(100.0), basic_model="p")
    N, ttf, df = 1000, 50, 30
    w = sim.weight(df, N, 1.0, ttf=ttf)
    lam = np.float32(np.float32(ttf + 1.0) / np.float32(N + 1.0))
    assert w == lam
    f = np.array([3.0], dtype=np.float32)
    nb = np.array([120], dtype=np.uint8)
    got = float(sim.score(f, nb, w)[0])
    # independent double recomputation
    dl = _dl_of(120)
    tfn = 3.0 * np.log2(1.0 + 100.0 / dl)
    lam_d = float(lam)
    bm = (
        tfn * np.log2(tfn / lam_d)
        + (lam_d + 1.0 / (12.0 * tfn) - tfn) * np.log2(np.e)
        + 0.5 * np.log2(2.0 * np.pi * tfn)
    )
    assert got == np.float32(bm / (1.0 + tfn))


def test_d_and_be_pack_ttf_and_need_n_docs():
    with pytest.raises(ValueError):
        DFRSimilarity(np.float32(50.0), basic_model="d")
    with pytest.raises(ValueError):
        DFRSimilarity(np.float32(50.0), basic_model="be")
    sim = DFRSimilarity(np.float32(50.0), basic_model="d", n_docs=500)
    assert sim.weight(10, 500, 1.0, ttf=42) == np.float32(42.0)
    # n_docs mismatch with the index is a hard error
    with pytest.raises(ValueError):
        sim.weight(10, 600, 1.0, ttf=42)


def test_be_matches_reference_formula():
    N, ttf = 2000, 25
    sim = DFRSimilarity(np.float32(80.0), basic_model="be",
                        normalization="h1", n_docs=N)
    w = sim.weight(12, N, 1.0, ttf=ttf)
    f = np.array([2.0], dtype=np.float32)
    nb = np.array([118], dtype=np.uint8)
    got = float(sim.score(f, nb, w)[0])
    dl = _dl_of(118)
    tfn = 2.0 * (80.0 / dl)
    F_ = ttf + 1.0 + tfn
    N_ = F_ + N

    def fh(n, m):
        return (m + 0.5) * np.log2(n / m) + (n - m) * np.log2(n)

    bm = -np.log2((N_ - 1.0) * np.e) + fh(N_ + F_ - 1.0, N_ + F_ - tfn - 2.0) - fh(F_, F_ - tfn)
    assert got == np.float32(bm / (1.0 + tfn))


def test_d_is_finite_and_positive_for_typical_stats():
    sim = DFRSimilarity(np.float32(64.0), basic_model="d",
                        normalization="z", n_docs=10_000)
    w = sim.weight(40, 10_000, 1.0, ttf=120)
    f = np.array([1.0, 2.0, 7.0], dtype=np.float32)
    nb = np.array([118, 120, 124], dtype=np.uint8)
    s = sim.score(f, nb, w)
    assert np.all(np.isfinite(s)) and np.all(s > 0)


def test_normalization_z_shape():
    simz = DFRSimilarity(np.float32(100.0), basic_model="in", normalization="z")
    simh1 = DFRSimilarity(np.float32(100.0), basic_model="in", normalization="h1")
    f = np.array([4.0], dtype=np.float32)
    nb = np.array([120], dtype=np.uint8)
    dl = _dl_of(120)
    tfn_z = simz._tfn(f, nb)[0]
    assert tfn_z == pytest.approx(4.0 * (100.0 / dl) ** 0.30, rel=1e-12)
    # z with z=1 would equal h1; default 0.30 compresses the ratio
    assert tfn_z != simh1._tfn(f, nb)[0]


def test_nonlinear_models_reject_boost_and_after_effect_b():
    for bm in ("g", "p", "d", "be"):
        kw = {"n_docs": 100} if bm in ("d", "be") else {}
        with pytest.raises(NotImplementedError):
            DFRSimilarity(np.float32(10.0), basic_model=bm, after_effect="b", **kw)
        sim = DFRSimilarity(np.float32(10.0), basic_model=bm, **kw)
        with pytest.raises(NotImplementedError):
            sim.weight(5, 100, 2.0, ttf=9)
