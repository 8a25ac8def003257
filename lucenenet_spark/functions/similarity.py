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

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
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

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
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


class LMDirichletSimilarity:
    """Language-model similarity with Dirichlet smoothing (reference
    ``Search/Similarities/LMDirichletSimilarity.cs:43`` over
    ``SimilarityBase.cs`` / ``LMSimilarity.cs``):

        p(t|C)  = (ttf + 1) / (sttf + 1)          (float division)
        docLen  = 1 / decode(norm)^2              (SimilarityBase
                                                   DecodeNormValue)
        score   = boost * float32( ln(1 + freq/(mu * p))
                                   + ln(mu / (docLen + mu)) )
        clamped to 0 when negative (LMDirichletSimilarity.Score).

    The per-term weight scalar carries p(t|C); mu and boost are
    similarity-level constants because the engine bakes ONE float per
    (clause, term) into its scan plan — per-clause boosts other than
    1.0 raise. Logs run in double (numpy log == libm == DuckDB ln on
    this platform) and truncate to float32, the same double-then-cast
    the C# does with Math.Log."""

    name = "lm_dirichlet"

    def __init__(self, avgdl=None, mu: float = 2000.0):  # avgdl unused
        self.mu = np.float32(mu)

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
        if float(boost) != 1.0:
            raise NotImplementedError(
                "LMDirichletSimilarity packs p(t|C) into the weight "
                "scalar; per-term boosts are not supported"
            )
        return np.float32(np.float32(ttf + 1.0) / np.float32(sttf + 1.0))

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        raise NotImplementedError(
            "LM-Dirichlet phrase scoring needs the phrase pseudo-term's "
            "collection frequency, which the index does not store"
        )

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        p = np.float64(np.float32(w))
        mu = np.float64(self.mu)
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        # SimilarityBase.DecodeNormValue: docLen = 1/decode^2 (float32)
        dl = (np.float32(1.0) / (nd * nd)).astype(np.float32)
        freq = np.asarray(f, dtype=np.float64)
        inner = np.log(1.0 + freq / (mu * p)) + np.log(
            mu / (dl.astype(np.float64) + mu)
        )
        s = (np.float32(1.0) * inner.astype(np.float32)).astype(np.float32)
        return np.where(s > 0, s, np.float32(0.0)).astype(np.float32)


class DFRInL2Similarity:
    """Divergence-from-randomness I(n)L2 (reference
    ``Search/Similarities/DFRSimilarity.cs:63`` composing
    ``BasicModelIn.cs`` + ``AfterEffectL.cs`` + ``NormalizationH2.cs``
    over SimilarityBase):

        dl    = 1 / decode(norm)^2                  (SimilarityBase)
        tfn   = freq * log2(1 + c * avgdl / dl)     (H2, c = 1)
        score = boost * log2((N+1)/(df+0.5))        (I(n))
                      * tfn / (1 + tfn)             (L)

    The per-term constant boost*log2((N+1)/(df+0.5)) packs into the
    weight scalar (score is linear in it, so boosts work). All math
    in double with one float32 truncation at the end, log2 spelled
    ln(x)/ln(2) in BOTH engines (the reference's SimilarityBase.Log2
    is Math.Log(x)/Math.Log(2)) so the doubles agree bit-for-bit."""

    name = "dfr_inl2"

    def __init__(self, avgdl: np.float32, c: float = 1.0):
        self.avgdl = np.float32(avgdl)
        self.c = float(c)

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
        ln2 = np.log(2.0)
        return np.float32(
            float(boost) * (np.log((max_doc + 1.0) / (df + 0.5)) / ln2)
        )

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        raise NotImplementedError(
            "DFR phrase scoring needs pseudo-term stats the index "
            "does not store"
        )

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        ln2 = np.log(2.0)
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        dl = (np.float32(1.0) / (nd * nd)).astype(np.float32).astype(np.float64)
        tfn = np.asarray(f, dtype=np.float64) * (
            np.log(1.0 + self.c * np.float64(self.avgdl) / dl) / ln2
        )
        s = np.float64(np.float32(w)) * tfn / (1.0 + tfn)
        return s.astype(np.float32)


class IBLLSimilarity:
    """Information-based similarity, log-logistic distribution
    (reference ``Search/Similarities/IBSimilarity.cs:113`` composing
    ``DistributionLL.cs:37`` + ``LambdaDF.cs:33`` +
    ``NormalizationH2.cs:53``):

        lambda = f32(df + 1) / f32(N + 1)           (LambdaDF — pure
                                                     float32 division)
        dl     = 1 / decode(norm)^2                 (SimilarityBase)
        tfn    = f32(freq * log2(1 + c * avgdl/dl)) (H2, c = 1; the
                                                     reference casts
                                                     Tfn to float)
        score  = f32(-ln(lambda / (tfn + lambda)))  (LL — the inner
                                                     ratio is float32
                                                     arithmetic, the
                                                     log runs double)

    lambda packs into the per-term weight scalar; score is not linear
    in it, so per-term boosts other than 1.0 raise (same contract as
    LM-Dirichlet)."""

    name = "ib_ll"

    def __init__(self, avgdl: np.float32, c: float = 1.0):
        self.avgdl = np.float32(avgdl)
        self.c = float(c)

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
        if float(boost) != 1.0:
            raise NotImplementedError(
                "IBSimilarity packs lambda into the weight scalar; "
                "per-term boosts are not supported"
            )
        return np.float32(np.float32(df + 1.0) / np.float32(max_doc + 1.0))

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        raise NotImplementedError(
            "IB phrase scoring needs pseudo-term stats the index does "
            "not store"
        )

    def _tfn(self, f: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        dl = (np.float32(1.0) / (nd * nd)).astype(np.float32).astype(np.float64)
        return (
            np.asarray(f, dtype=np.float64)
            * (np.log(1.0 + self.c * np.float64(self.avgdl) / dl) / np.log(2.0))
        ).astype(np.float32)

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        lam = np.float32(w)
        tfn = self._tfn(f, norm_bytes)
        ratio = lam / (tfn + lam)  # float32 ops, like the C# floats
        return (-np.log(ratio.astype(np.float64))).astype(np.float32)


class IBSPLSimilarity(IBLLSimilarity):
    """IB with the smoothed power-law distribution
    (``DistributionSPL.cs:38``): score = f32(-ln((lambda^(tfn/(tfn+1))
    - lambda) / (1 - lambda))); the exponent tfn/(tfn+1) is float32
    division, pow/ln run double (libm on both engines). lambda == 1
    is clamped to 0.99 as the reference does (unreachable under
    LambdaDF with df < N)."""

    name = "ib_spl"

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        lam = np.float32(w)
        if lam == np.float32(1.0):
            lam = np.float32(0.99)
        tfn = self._tfn(f, norm_bytes)
        expo = (tfn / (tfn + np.float32(1.0))).astype(np.float32)
        lam_d = np.float64(lam)
        inner = (np.power(lam_d, expo.astype(np.float64)) - lam_d) / (1.0 - lam_d)
        return (-np.log(inner)).astype(np.float32)


class LMJelinekMercerSimilarity:
    """Language-model similarity with Jelinek-Mercer smoothing
    (reference ``Search/Similarities/LMJelinekMercerSimilarity.cs:57``):

        p(t|C) = (ttf + 1) / (sttf + 1)     (LMSimilarity collection
                                             model, packs into the
                                             weight scalar)
        docLen = 1 / decode(norm)^2
        score  = f32(ln(1 + ((1-lambda) * freq / docLen)
                            / (lambda * p)))

    The inner ratio chain runs in float32 exactly as the C# does (all
    operands are floats; only Math.Log promotes to double). Per-term
    boosts other than 1.0 raise, same contract as LM-Dirichlet."""

    name = "lm_jelinek_mercer"

    def __init__(self, avgdl=None, lam: float = 0.1):  # avgdl unused
        self.lam = np.float32(lam)

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
        if float(boost) != 1.0:
            raise NotImplementedError(
                "LMJelinekMercerSimilarity packs p(t|C) into the weight "
                "scalar; per-term boosts are not supported"
            )
        return np.float32(np.float32(ttf + 1.0) / np.float32(sttf + 1.0))

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        raise NotImplementedError(
            "LM phrase scoring needs the phrase pseudo-term's "
            "collection frequency, which the index does not store"
        )

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        p = np.float32(w)
        lam = self.lam
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        dl = (np.float32(1.0) / (nd * nd)).astype(np.float32)
        ff = np.asarray(f, dtype=np.float32)
        x = (np.float32(1.0) - lam) * ff / dl / (lam * p)
        inner = np.float32(1.0) + x
        return np.log(inner.astype(np.float64)).astype(np.float32)


class DFRSimilarity:
    """Compositional divergence-from-randomness similarity (reference
    ``Search/Similarities/DFRSimilarity.cs:121``: score = boost *
    basicModel.Score(tfn) * afterEffect.Score(tfn)) — the generic
    form of :class:`DFRInL2Similarity`, covering:

    basic models (``BasicModel*.cs``) — per-term constant ``bm_c``:
      - ``in``  (`BasicModelIn.cs:39`):  log2((N+1)/(df+0.5))
      - ``if``  (`BasicModelIF.cs:39`):  log2(1+(N+1)/(ttf+0.5))
      - ``ine`` (`BasicModelIne.cs:41`): log2((N+1)/(ne+0.5)),
                ne = N*(1-((N-1)/N)^ttf)
      - ``g``   (`BasicModelG.cs:44`):   NON-linear —
                log2(1+lambda) + tfn*log2((1+lambda)/lambda),
                lambda = (ttf+1)/(N+ttf+1)
    after effects (``AfterEffect*.cs``):
      - ``l`` (`AfterEffectL.cs`): 1/(1+tfn)
      - ``b`` (`AfterEffectB.cs:37`): (ttf+2)/((df+1)*(tfn+1))
    nonlinear basic models (per-doc score shapes — the per-term
    constant packed into the weight scalar is noted):
      - ``p``  (`BasicModelP.cs:46`): Poisson approximation —
               tfn*log2(tfn/lambda) + (lambda + 1/(12*tfn) - tfn)
               *log2(e) + 0.5*log2(2*pi*tfn),
               lambda = f32(ttf+1)/(N+1)  [packs lambda]
      - ``d``  (`BasicModelD.cs:33`): divergence approximation —
               F = ttf+1+tfn, phi = tfn/F, p = 1/(N+1),
               (phi*log2(phi/p) + (1-phi)*log2((1-phi)/(1-p)))*F
               + 0.5*log2(1+2*pi*tfn*(1-phi))  [packs ttf; N from
               the ``n_docs`` constructor arg]
      - ``be`` (`BasicModelBE.cs:36`): Bose-Einstein — F = ttf+1+tfn,
               N' = F+N, -log2((N'-1)*e) + f(N'+F-1, N'+F-tfn-2)
               - f(F, F-tfn), f(n,m) = (m+0.5)*log2(n/m)
               + (n-m)*log2(n)  [packs ttf; N from ``n_docs``]
    normalizations (``NormalizationH*.cs``, ``NormalizationZ.cs``):
      - ``h1``: tfn = freq * avgdl/dl
      - ``h2``: tfn = freq * log2(1 + c*avgdl/dl)
      - ``z`` (`NormalizationZ.cs:47`): tfn = freq * (avgdl/dl)^z

    The engine bakes ONE float per (clause, term) into the scan plan,
    so the per-term constants must fold into that scalar. Linear
    basic models (in/if/ine) with either after-effect fold completely
    (both effects share the 1/(1+tfn) shape; B contributes the extra
    constant (ttf+2)/(df+1)): w = boost * bm_c [* b_c], score =
    f32(w * tfn/(1+tfn)) — the same pinned double-math pipeline as
    DFRInL2Similarity. The nonlinear models (g/p/d/be) pack their one
    per-term statistic as the scalar instead (boost and after-effect
    B then have nowhere to ride: both raise); d/be additionally need
    the collection constant N, taken at construction like ``avgdl``.
    All math runs double with one float32 truncation at the end, log2
    spelled ln/ln2 in both engines — the discipline the InL2/IB/LM
    mirrors pinned."""

    def __init__(
        self,
        avgdl: np.float32,
        basic_model: str = "in",
        after_effect: str = "l",
        normalization: str = "h2",
        c: float = 1.0,
        z: float = 0.30,
        n_docs: "int | None" = None,
    ):
        if basic_model not in ("in", "if", "ine", "g", "p", "d", "be"):
            raise ValueError(basic_model)
        if after_effect not in ("l", "b"):
            raise ValueError(after_effect)
        if normalization not in ("h1", "h2", "z"):
            raise ValueError(normalization)
        if basic_model in ("g", "p", "d", "be") and after_effect == "b":
            raise NotImplementedError(
                f"{basic_model} x B needs two per-term constants; the "
                "engine's weight slot carries one scalar"
            )
        if basic_model in ("d", "be") and n_docs is None:
            raise ValueError(
                f"basic model {basic_model!r} needs the collection "
                "doc count: pass n_docs=index.max_doc"
            )
        self.avgdl = np.float32(avgdl)
        self.basic_model = basic_model
        self.after_effect = after_effect
        self.normalization = normalization
        self.c = float(c)
        self.z = float(z)
        self.n_docs = None if n_docs is None else int(n_docs)
        self.name = f"dfr_{basic_model}{after_effect}{normalization[-1]}"

    def weight(
        self, df: int, max_doc: int, boost: float, ttf: int = 0, sttf: int = 0
    ) -> np.float32:
        ln2 = np.log(2.0)
        n = float(max_doc)
        if self.basic_model in ("g", "p", "d", "be"):
            if float(boost) != 1.0:
                raise NotImplementedError(
                    f"BasicModel{self.basic_model.upper()} packs its "
                    "per-term statistic into the weight scalar; "
                    "per-term boosts are not supported"
                )
            if self.n_docs is not None and self.n_docs != max_doc:
                raise ValueError(
                    f"n_docs={self.n_docs} does not match the "
                    f"index max_doc={max_doc}"
                )
        if self.basic_model == "g":
            return np.float32((ttf + 1.0) / (n + ttf + 1.0))
        if self.basic_model == "p":
            # reference: lambda = (float)(ttf+1) / (N+1) — f32 div
            return np.float32(np.float32(ttf + 1.0) / np.float32(n + 1.0))
        if self.basic_model in ("d", "be"):
            return np.float32(ttf)
        if self.basic_model == "in":
            bm = np.log((n + 1.0) / (df + 0.5)) / ln2
        elif self.basic_model == "if":
            bm = np.log(1.0 + (n + 1.0) / (ttf + 0.5)) / ln2
        else:  # ine
            ne = n * (1.0 - ((n - 1.0) / n) ** float(ttf))
            bm = np.log((n + 1.0) / (ne + 0.5)) / ln2
        w = float(boost) * bm
        if self.after_effect == "b":
            w *= (ttf + 2.0) / (df + 1.0)
        return np.float32(w)

    def weight_multi(self, dfs, max_doc: int, boost: float) -> np.float32:
        raise NotImplementedError(
            "DFR phrase scoring needs pseudo-term stats the index "
            "does not store"
        )

    def _tfn(self, f: np.ndarray, norm_bytes: np.ndarray) -> np.ndarray:
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        dl = (np.float32(1.0) / (nd * nd)).astype(np.float32).astype(np.float64)
        ff = np.asarray(f, dtype=np.float64)
        if self.normalization == "h1":
            return ff * (np.float64(self.avgdl) / dl)
        if self.normalization == "z":
            return ff * np.power(np.float64(self.avgdl) / dl, self.z)
        return ff * (
            np.log(1.0 + self.c * np.float64(self.avgdl) / dl) / np.log(2.0)
        )

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        tfn = self._tfn(f, norm_bytes)
        ln2 = np.log(2.0)
        if self.basic_model == "g":
            lam = np.float64(np.float32(w))
            bm = (
                np.log(1.0 + lam) / ln2
                + tfn * (np.log((1.0 + lam) / lam) / ln2)
            )
            return (bm / (1.0 + tfn)).astype(np.float32)
        if self.basic_model == "p":
            lam = np.float64(np.float32(w))
            bm = (
                tfn * (np.log(tfn / lam) / ln2)
                + (lam + 1.0 / (12.0 * tfn) - tfn) * (np.log(np.e) / ln2)
                + 0.5 * (np.log(2.0 * np.pi * tfn) / ln2)
            )
            return (bm / (1.0 + tfn)).astype(np.float32)
        if self.basic_model == "d":
            ttf = np.float64(np.float32(w))
            big_f = ttf + 1.0 + tfn
            phi = tfn / big_f
            nphi = 1.0 - phi
            p = 1.0 / (float(self.n_docs) + 1.0)
            d_kl = (
                phi * (np.log(phi / p) / ln2)
                + nphi * (np.log(nphi / (1.0 - p)) / ln2)
            )
            bm = d_kl * big_f + 0.5 * (
                np.log(1.0 + 2.0 * np.pi * tfn * nphi) / ln2
            )
            return (bm / (1.0 + tfn)).astype(np.float32)
        if self.basic_model == "be":
            ttf = np.float64(np.float32(w))
            big_f = ttf + 1.0 + tfn
            big_n = big_f + float(self.n_docs)

            def fh(n, m):
                return (m + 0.5) * (np.log(n / m) / ln2) + (n - m) * (
                    np.log(n) / ln2
                )

            bm = (
                -(np.log((big_n - 1.0) * np.e) / ln2)
                + fh(big_n + big_f - 1.0, big_n + big_f - tfn - 2.0)
                - fh(big_f, big_f - tfn)
            )
            return (bm / (1.0 + tfn)).astype(np.float32)
        s = np.float64(np.float32(w)) * tfn / (1.0 + tfn)
        return s.astype(np.float32)


class SweetSpotSimilarity(ClassicSimilarity):
    """Plateau length-norm + baseline-tf similarity (reference
    ``Lucene.Net.Misc/Misc/SweetSpotSimilarity.cs:41`` extending
    DefaultSimilarity):

        baselineTf(freq) = 0                       if freq == 0
                         = tf_base                 if freq <= tf_min
                         = f32(sqrt(freq + tf_base^2 - tf_min))
        lengthNorm(x)    = f32(1 / sqrt(f32(steep * (|x-min| + |x-max|
                                              - (max-min))) + 1))
        score            = weight * baselineTf * lengthNorm

    with weight = ClassicSimilarity's idf^2 * boost. The reference
    encodes lengthNorm into the norm byte at INDEX time
    (``ComputeLengthNorm`` -> byte315); this engine stores ONE shared
    norm byte (byte315 of 1/sqrt(field_length)) so every similarity is
    swappable without reindexing, and recovers the doc length at query
    time the way the LM/DFR families do (SimilarityBase DecodeNormValue:
    docLen = f32(1/decode^2)). The plateau is therefore computed over
    the byte-quantized length — same quantization point as the LM/DFR
    implementations above, divergence from the reference documented
    here. float32 op order pinned to the C# (all-float chains, sqrt in
    double then one truncation)."""

    name = "sweetspot"

    def __init__(
        self,
        avgdl=None,  # unused; uniform Similarity ctor
        ln_min: int = 1,
        ln_max: int = 1,
        steepness: float = 0.5,
        tf_base: float = 0.0,
        tf_min: float = 0.0,
    ):
        self.ln_min = int(ln_min)
        self.ln_max = int(ln_max)
        self.steep = np.float32(steepness)
        self.tf_base = np.float32(tf_base)
        self.tf_min = np.float32(tf_min)

    def score(self, f: np.ndarray, norm_bytes: np.ndarray, w: np.float32) -> np.ndarray:
        freq = np.asarray(f, dtype=np.float32)
        # BaselineTf (SweetSpotSimilarity.cs:171-180): float chain
        # freq + base^2 - min, sqrt in double, one f32 truncation
        arg = (freq + np.float32(self.tf_base * self.tf_base)) - self.tf_min
        with np.errstate(invalid="ignore"):
            tf = np.sqrt(arg.astype(np.float64)).astype(np.float32)
        tf = np.where(freq <= self.tf_min, self.tf_base, tf)
        tf = np.where(freq == np.float32(0.0), np.float32(0.0), tf)
        # ComputeLengthNorm (SweetSpotSimilarity.cs:141-148) over the
        # recovered doc length x = f32(1/decode(norm)^2)
        nd = byte315_to_float(np.asarray(norm_bytes, dtype=np.uint8))
        x = (np.float32(1.0) / (nd * nd)).astype(np.float32)
        lo = np.float32(self.ln_min)
        hi = np.float32(self.ln_max)
        t = (np.abs(x - lo) + np.abs(x - hi)) - np.float32(self.ln_max - self.ln_min)
        inner = (self.steep * t) + np.float32(1.0)
        norm = (np.float64(1.0) / np.sqrt(inner.astype(np.float64))).astype(np.float32)
        return (np.float32(w) * tf * norm).astype(np.float32)
