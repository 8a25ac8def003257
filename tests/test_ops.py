"""Training-data ops: dedup / similarity / text analysis / multimodal,
each asserted against an independent pure-Python reference."""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pytest

from lucenenet_spark.analysis.analyzer import TOKEN_PATTERN
from lucenenet_spark.ops import dedup, multimodal, similarity, text
from lucenenet_spark.ops.hashing import MERSENNE_31, md5_prefix_int, minhash_coeffs

TOK_RE = re.compile(TOKEN_PATTERN, re.ASCII)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (4, "completely different content here about spark engines"),
    (5, ""),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


# ------------------------------------------------------------- dedup

def test_exact_dup_groups(docs_df):
    rows = {r["id"]: r for r in dedup.exact_dup_groups(docs_df).collect()}
    assert rows[0]["group_size"] == 2 and rows[3]["group_size"] == 2
    assert rows[0]["canonical_id"] == 0 and rows[3]["canonical_id"] == 0
    assert rows[1]["group_size"] == 1
    assert rows[0]["content_hash"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()


def _py_shingles(text_, k=3):
    toks = TOK_RE.findall(text_.lower())
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def _py_minhash(text_, n_hashes=16, seed=42):
    coeffs = minhash_coeffs(n_hashes, seed)
    out = []
    sh = _py_shingles(text_)
    for a, b in coeffs:
        out.append(
            min((a * (md5_prefix_int(s) % MERSENNE_31) + b) % MERSENNE_31 for s in sh)
        )
    return out


def test_minhash_signature_matches_python(docs_df):
    sigs = {r["id"]: list(r["sig"]) for r in dedup.minhash_signatures(docs_df).collect()}
    for i in (0, 1, 2, 4):
        assert sigs[i] == _py_minhash(DOCS[i][1]), f"doc {i}"
    assert 5 not in sigs  # empty doc has no shingles


def test_minhash_dedup_finds_near_dup_pair(docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_dedup_pairs(docs_df, threshold=0.5).collect()
    }
    assert (0, 3) in pairs and pairs[(0, 3)] == 1.0  # exact dup
    if (0, 1) in pairs:  # near dup: one word differs
        a, b = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[1][1])
        assert pairs[(0, 1)] == len(a & b) / len(a | b)
    assert not any({p[0], p[1]} & {2, 4} for p in pairs)


def test_ngram_jaccard_exact(spark, docs_df):
    pairs = spark.createDataFrame([(0, 1), (0, 2)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): r for r in dedup.ngram_jaccard(docs_df, pairs).collect()}
    a, b = _py_shingles(DOCS[0][1]), _py_shingles(DOCS[1][1])
    assert got[(0, 1)]["inter"] == len(a & b)
    assert got[(0, 1)]["jaccard"] == len(a & b) / len(a | b)
    c = _py_shingles(DOCS[2][1])
    assert got[(0, 2)]["inter"] == 0 and got[(0, 2)]["jaccard"] == 0.0


def test_ngram_jaccard_zero_shingle_doc_reported(spark, docs_df):
    """A candidate pair with an empty/too-short doc must surface with
    jaccard 0, not be dropped (sizes join is left, 0/0 guarded)."""
    docs = docs_df.union(
        spark.createDataFrame([(90, ""), (91, "ab")], "doc_id long, text string")
    )
    pairs = spark.createDataFrame(
        [(0, 90), (90, 91)], "id_a long, id_b long"
    )
    got = {(r["id_a"], r["id_b"]): r for r in dedup.ngram_jaccard(docs, pairs).collect()}
    assert set(got) == {(0, 90), (90, 91)}
    assert got[(0, 90)]["size_b"] == 0 and got[(0, 90)]["jaccard"] == 0.0
    assert got[(90, 91)]["jaccard"] == 0.0  # union == 0 -> defined as 0


def _py_simhash(text_):
    """(hi, lo) 64-bit simhash from two 32-bit md5-hex-slice hashes."""
    import hashlib as _hl

    toks = TOK_RE.findall(text_.lower())
    tf: dict[str, int] = {}
    for t in toks:
        tf[t] = tf.get(t, 0) + 1
    votes_lo, votes_hi = [0] * 32, [0] * 32
    for t, f in tf.items():
        hx = _hl.md5(t.encode()).hexdigest()
        hlo, hhi = int(hx[0:8], 16), int(hx[8:16], 16)
        for b in range(32):
            votes_lo[b] += f if (hlo >> b) & 1 else -f
            votes_hi[b] += f if (hhi >> b) & 1 else -f
    return (
        sum(1 << b for b in range(32) if votes_hi[b] > 0),
        sum(1 << b for b in range(32) if votes_lo[b] > 0),
    )


def test_near_dup_groups_connected_components(docs_df):
    got = {r["id"]: r["canonical_id"] for r in dedup.near_dup_groups(docs_df, threshold=0.5).collect()}
    assert len(got) == docs_df.count()  # every doc labeled
    # docs 0 and 3 are exact duplicates in the fixture -> same cluster,
    # canonical = smallest member id
    assert got[3] == got[0] == 0
    # labels are cluster-minimal: canonical of the canonical is itself
    for i, c in got.items():
        assert got[c] == c and c <= i


def test_cosine_topk_quantized_batch_matches_single(emb_df):
    batch = similarity.cosine_topk_quantized_batch(emb_df, [0, 3], k=4).collect()
    by_q: dict[int, list] = {}
    for r in batch:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["id"], r["sim"]))
    for qid in (0, 3):
        single = similarity.cosine_topk_quantized(emb_df, query_id=qid, k=4).collect()
        assert sorted(by_q[qid]) == [(r["rank"], r["id"], r["sim"]) for r in single]


def test_simhash_matches_python(docs_df):
    got = {r["id"]: (r["simhash_hi"], r["simhash_lo"]) for r in dedup.simhash(docs_df).collect()}
    for i in (0, 1, 2, 4):
        assert got[i] == _py_simhash(DOCS[i][1]), f"doc {i}"
        assert 0 <= got[i][0] < 1 << 32 and 0 <= got[i][1] < 1 << 32


def test_simhash_pairs_exact_dup_distance_zero(docs_df):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_dup_pairs(docs_df).collect()}
    assert pairs.get((0, 3)) == 0


def test_simhash_bucket_cap_bounds_join(spark):
    """max_bucket drops degenerate buckets: 12 identical docs share all
    4 band keys; with max_bucket=10 every bucket is over the cap, so no
    pairs emerge — while distinct docs are unaffected."""
    rows = [(i, "same text everywhere again and again") for i in range(12)]
    rows += [(100, "an entirely different document body"), (101, "an entirely different document body")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = dedup.simhash_dup_pairs(df, max_bucket=10).collect()
    ids = {(r["id_a"], r["id_b"]) for r in got}
    assert (100, 101) in ids
    assert all(a not in range(12) for a, _ in ids)


# -------------------------------------------------------- similarity

@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.default_rng(7)
    base = rng.random(8)
    rows = []
    for i in range(20):
        v = base + rng.normal(0, 0.05 * (1 + i % 5), 8)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_quantized_matches_numpy(emb_df):
    got = similarity.cosine_topk_quantized(emb_df, query_id=0, k=5).collect()
    rows = emb_df.collect()
    vecs = {r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=np.float64) * 10000) for r in rows}
    q = vecs[0]
    sims = []
    for vid, v in vecs.items():
        if vid == 0:
            continue
        sims.append((float(np.dot(v, q) / (np.sqrt(np.dot(v, v)) * np.sqrt(np.dot(q, q)))), vid))
    expect = sorted(sims, key=lambda s: (-s[0], s[1]))[:5]
    assert [(r["id"], r["rank"]) for r in got] == [(vid, i + 1) for i, (_, vid) in enumerate(expect)]
    for r, (sim, _) in zip(got, expect):
        assert abs(r["sim"] - sim) < 1e-12


def test_cosine_topk_float_baseline(emb_df):
    q = [0.5] * 8
    got = similarity.cosine_topk_float(emb_df, q, k=3).collect()
    assert len(got) == 3
    assert got[0]["sim"] >= got[1]["sim"] >= got[2]["sim"]


def test_lsh_topk_is_exact_within_candidates(emb_df):
    exact = similarity.cosine_topk_quantized(emb_df, query_id=0, k=5).collect()
    approx = similarity.cosine_topk_lsh(emb_df, query_id=0, k=5).collect()
    assert len(approx) >= 1
    # every approx hit's similarity appears in the exact full ranking
    # at the same or better... minimally: approx results are sorted and
    # a subset of the corpus ranked identically among themselves
    sims = [r["sim"] for r in approx]
    assert sims == sorted(sims, reverse=True)
    exact_map = {r["id"]: r["sim"] for r in exact}
    for r in approx:
        if r["id"] in exact_map:
            assert abs(r["sim"] - exact_map[r["id"]]) < 1e-12


def test_ivf_topk_deterministic_and_exact_within_probes(emb_df):
    a = similarity.cosine_topk_ivf(emb_df, query_id=0, k=5, n_centroids=4, nprobe=2).collect()
    b = similarity.cosine_topk_ivf(emb_df, query_id=0, k=5, n_centroids=4, nprobe=2).collect()
    assert [(r["id"], r["sim"]) for r in a] == [(r["id"], r["sim"]) for r in b]
    sims = [r["sim"] for r in a]
    assert sims == sorted(sims, reverse=True)
    exact = {r["id"]: r["sim"] for r in similarity.cosine_topk_quantized(emb_df, 0, 20).collect()}
    for r in a:
        assert abs(r["sim"] - exact[r["id"]]) < 1e-12


def test_ivf_full_probe_equals_exact(emb_df):
    ivf = similarity.cosine_topk_ivf(emb_df, query_id=0, k=5, n_centroids=4, nprobe=4).collect()
    exact = similarity.cosine_topk_quantized(emb_df, query_id=0, k=5).collect()
    assert [(r["id"], r["sim"]) for r in ivf] == [(r["id"], r["sim"]) for r in exact]


def test_embedding_dup_pairs_exact(emb_df):
    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in similarity.embedding_dup_pairs(emb_df, threshold=0.9).collect()
    }
    rows = emb_df.collect()
    vecs = {r["vec_id"]: np.floor(np.asarray(r["embedding"], dtype=np.float64) * 10000) for r in rows}
    expect = {}
    ids = sorted(vecs)
    for i in ids:
        for j in ids:
            if i < j:
                s = float(
                    np.dot(vecs[i], vecs[j])
                    / (np.sqrt(np.dot(vecs[i], vecs[i])) * np.sqrt(np.dot(vecs[j], vecs[j])))
                )
                if s >= 0.9:
                    expect[(i, j)] = s
    assert set(got) == set(expect)
    for k in got:
        assert abs(got[k] - expect[k]) < 1e-12


def test_lsh_band_keys_match_python(emb_df):
    got = {}
    for r in similarity.lsh_band_keys(emb_df).collect():
        got.setdefault(r["id"], {})[r["band"]] = r["key"]
    planes = similarity.int_hyperplanes(8)
    r_bits = similarity.N_PLANES // similarity.LSH_BANDS
    for row in emb_df.collect():
        v = np.floor(np.asarray(row["embedding"], dtype=np.float64) * 10000).astype(np.int64)
        bits = (v @ planes.T) > 0
        for b in range(similarity.LSH_BANDS):
            key = sum(1 << j for j in range(r_bits) if bits[b * r_bits + j])
            assert got[row["vec_id"]][b] == key


def test_ivf_persisted_index_prunes_partitions(emb_df, tmp_path):
    path = str(tmp_path / "ivf")
    similarity.build_ivf_index(emb_df, path, n_centroids=4)
    spark = emb_df.sparkSession
    inline = similarity.cosine_topk_ivf(emb_df, query_id=0, k=5, n_centroids=4, nprobe=2).collect()
    persisted = similarity.cosine_topk_ivf_persisted(spark, path, query_id=0, k=5, nprobe=2).collect()
    assert [(r["id"], r["sim"]) for r in persisted] == [(r["id"], r["sim"]) for r in inline]
    # probing must PRUNE: the probed scan reads fewer files than the table has
    cents = spark.read.parquet(f"{path}/centroids").orderBy("cluster").collect()
    qcent = np.array([r["qcent"] for r in cents], dtype=np.int64)
    vecs = spark.read.parquet(f"{path}/vectors")
    qv = np.floor(np.asarray(
        vecs.where(vecs.id == 0).collect()[0]["embedding"], dtype=np.float64
    ) * 10000).astype(np.int64)
    probes = similarity._probe_clusters(qv, qcent, 2)
    pruned = vecs.where(vecs.cluster.isin(probes))
    # the cluster predicate must reach the scan as a PARTITION filter
    # (directory pruning), not a post-scan row filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pruned.explain(True)
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1].split("]")[0]
    assert "cluster" in seg and "IN" in seg.upper()


def test_ann_recall_at_k(emb_df):
    exact = similarity.cosine_topk_quantized(emb_df, query_id=0, k=5)
    lsh = similarity.cosine_topk_lsh(emb_df, query_id=0, k=5)
    ivf = similarity.cosine_topk_ivf(emb_df, query_id=0, k=5, n_centroids=4, nprobe=4)
    assert similarity.ann_recall_at_k(exact, exact) == 1.0
    assert 0.0 <= similarity.ann_recall_at_k(lsh, exact) <= 1.0
    assert similarity.ann_recall_at_k(ivf, exact) == 1.0  # full probe == exact


def test_embedding_dup_pairs_lsh_subset(emb_df):
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_dup_pairs(emb_df, threshold=0.9).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_dup_pairs_lsh(emb_df, threshold=0.9).collect()
    }
    assert lsh <= exact  # no false positives (exact verification stage)


# --------------------------------------------------------------- text

def test_token_stats(docs_df):
    got = {r["id"]: r for r in text.token_stats(docs_df).collect()}
    toks0 = TOK_RE.findall(DOCS[0][1].lower())
    assert got[0]["n_tokens"] == len(toks0)
    assert got[0]["n_ws_tokens"] == len(DOCS[0][1].split())
    assert got[0]["n_chars"] == len(DOCS[0][1])
    from lucenenet_spark.analysis.analyzer import ENGLISH_STOP_WORDS

    assert got[0]["n_stopwords"] == sum(1 for t in toks0 if t in ENGLISH_STOP_WORDS)
    assert got[5]["n_tokens"] == 0 and got[5]["n_stopwords"] == 0


def test_quality_score_range_and_empty(docs_df):
    got = {r["id"]: r["quality"] for r in text.quality_score(docs_df).collect()}
    assert got[5] == 0.0
    assert all(0.0 <= v <= 1.0 for v in got.values())
    assert got[0] > 0.0


def test_language_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog is in the house for now"),
            (1, "der hund und die katze ist nicht ein problem"),
            (2, "le chat et la maison est pour les amis dans"),
            (3, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    got = {r["id"]: r["lang_pred"] for r in text.language_id(df).collect()}
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "und"


def test_doc_fingerprint(docs_df):
    got = {r["id"]: r for r in text.doc_fingerprint(docs_df).collect()}
    t = DOCS[0][1]
    grams = [t[i : i + 8] for i in range(len(t) - 7)]
    hs = [md5_prefix_int(g) for g in grams]
    assert got[0]["n_grams"] == len(grams)
    assert got[0]["fp_min"] == min(hs) and got[0]["fp_max"] == max(hs)
    assert got[5]["n_grams"] == 0 and got[5]["fp_min"] is None


# --------------------------------------------------------- multimodal

def test_media_stats(docs_df):
    media = multimodal.media_from_text(docs_df)
    got = {r["media_id"]: r for r in multimodal.media_stats(media).collect()}
    assert got[0]["n_bytes"] == len(DOCS[0][1].encode())
    assert got[0]["payload_sha256"] == hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    assert got[0]["mime"] == "image/png" and got[1]["mime"] == "audio/wav"


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "image/png")


def test_extract_features_deterministic(docs_df):
    media = multimodal.media_from_text(docs_df)
    a = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    b = {r["media_id"]: r["features"] for r in multimodal.extract_features(media).collect()}
    assert a == b
    assert len(a[0]) == multimodal.FEATURE_DIM
    # matches a driver-side call of the same fake decoder
    arr = multimodal.fake_decode(DOCS[0][1].encode(), "image/png")
    expect = [float(c.mean()) for c in np.array_split(arr, multimodal.FEATURE_DIM)]
    assert a[0] == expect


def test_extract_feature_rows_matches_digest(docs_df):
    media = multimodal.media_from_text(docs_df)
    rows = multimodal.extract_feature_rows(media).collect()
    n_docs = docs_df.count()
    assert len(rows) == n_docs * multimodal.FEATURE_DIM
    got = {(r["media_id"], r["dim"]): r["value"] for r in rows}
    hx = hashlib.sha256(DOCS[0][1].encode()).hexdigest()
    for d in range(multimodal.FEATURE_DIM):
        assert got[(0, d)] == int(hx[4 * d : 4 * d + 4], 16)
    with pytest.raises(ValueError):
        multimodal.extract_feature_rows(media, feature_dim=17)


def test_sample_frames(docs_df):
    media = multimodal.media_from_text(docs_df)
    got = {}
    for r in multimodal.sample_frames(media, n_samples=4).collect():
        got.setdefault(r["media_id"], []).append(r["frame_idx"])
    # only video rows (doc_id % 3 == 2)
    assert set(got) == {2, 5}
    for mid, idxs in got.items():
        n = mid % 100 + 1
        expect = sorted({int(np.floor(i * n / 4)) for i in range(4)})
        assert sorted(idxs) == expect


def test_lsh_band_width_scales_with_corpus(spark):
    """Round-2 VERDICT scale-cliff regression: at 200k vectors with
    max_bucket=500 the OLD fixed 8-bit bands put ~780 rows in every
    bucket — the cap then dropped ALL buckets and recall went to zero
    silently. derive_n_planes widens the band keys so planted
    near-duplicate pairs survive with default parameters."""
    import numpy as np
    from pyspark.sql import functions as F

    n, dim = 200_000, 16
    # deterministic pseudo-random base vectors, JVM-side
    base = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                (F.pmod(F.xxhash64(F.col("id"), F.lit(j)), 2000) - 1000) / 1000.0
                for j in range(dim)
            ]
        ).alias("embedding"),
    )
    # plant exact duplicates of ids 0..4 at ids n..n+4 (cosine 1.0)
    dup = base.where(F.col("vec_id") < 5).select(
        (F.col("vec_id") + n).alias("vec_id"), "embedding"
    )
    emb = base.unionByName(dup)

    derived = similarity.derive_n_planes(n + 5, 500)
    assert derived > 32  # wider than the old fixed default
    got = similarity.embedding_dup_pairs_lsh(
        emb, threshold=0.999, max_bucket=500
    ).collect()
    found = {(r["id_a"], r["id_b"]) for r in got}
    assert {(i, i + n) for i in range(5)} <= found


def test_pq_topk_matches_pure_python_pipeline(emb_df):
    """cosine_topk_pq vs a from-scratch numpy recomputation of the
    whole PQ pipeline (md5-ranked seeds -> one exact-int64 Lloyd step
    with trunc-div recenter -> ADC table scoring): bit-identical ids
    and approx distances, so the DuckDB oracle mirror is trustworthy."""
    from lucenenet_spark.ops.hashing import md5_prefix_int
    from lucenenet_spark.ops.similarity import QUANT_SCALE, _trunc_div

    m, nc, k = 4, 8, 6
    got = similarity.cosine_topk_pq(
        emb_df, query_id=0, k=k, m=m, n_centroids=nc
    ).collect()

    rows = emb_df.collect()
    qvecs = {
        r["vec_id"]: np.floor(
            np.asarray(r["embedding"], dtype=np.float64) * QUANT_SCALE
        ).astype(np.int64)
        for r in rows
    }
    d = len(next(iter(qvecs.values())))
    dsub = d // m
    seed_ids = sorted(qvecs, key=lambda i: (md5_prefix_int(str(i)), i))[:nc]
    cents = np.stack(
        [
            np.stack([qvecs[i][j * dsub : (j + 1) * dsub] for i in seed_ids])
            for j in range(m)
        ]
    )  # (m, nc, dsub)

    def assign(vec):
        return [
            int(np.argmin(((cents[j] - vec[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)))
            for j in range(m)
        ]

    codes0 = {i: assign(v) for i, v in qvecs.items()}
    cents1 = cents.copy()
    for j in range(m):
        for c in range(nc):
            members = [i for i in qvecs if codes0[i][j] == c]
            if members:
                s = np.sum([qvecs[i][j * dsub : (j + 1) * dsub] for i in members], axis=0)
                cents1[j, c] = [
                    _trunc_div(int(x), len(members)) for x in s
                ]
    codes1 = {
        i: [
            int(np.argmin(((cents1[j] - v[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1)))
            for j in range(m)
        ]
        for i, v in qvecs.items()
    }
    qv = qvecs[0]
    table = np.stack(
        [((cents1[j] - qv[j * dsub : (j + 1) * dsub]) ** 2).sum(axis=1) for j in range(m)]
    )
    scored = sorted(
        (
            (int(sum(table[j, c] for j, c in enumerate(codes1[i]))), i)
            for i in qvecs
            if i != 0
        ),
    )[:k]
    expect = [(r + 1, i, dist) for r, (dist, i) in enumerate(scored)]
    assert [(r["rank"], r["id"], r["approx_dist"]) for r in got] == expect


def test_pq_persisted_index_matches_inline(emb_df, tmp_path):
    """build_pq_index + cosine_topk_pq_persisted == inline
    cosine_topk_pq bit-for-bit, and the standing index stores only
    codes + codebook + quantized vectors (no floats)."""
    spark = emb_df.sparkSession
    path = str(tmp_path / "pq")
    similarity.build_pq_index(emb_df, path, m=4, n_centroids=8)
    inline = similarity.cosine_topk_pq(emb_df, query_id=3, k=5, m=4, n_centroids=8).collect()
    persisted = similarity.cosine_topk_pq_persisted(spark, path, query_id=3, k=5).collect()
    assert [tuple(r) for r in persisted] == [tuple(r) for r in inline]
    codes = spark.read.parquet(path + "/codes")
    assert set(codes.columns) == {"id", "codes"}


# ---------------------------------------------------------- semdedup

@pytest.fixture(scope="module")
def semdedup_df(spark):
    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.random(8)]) for i in range(12)]
    dup = [float(x) for x in rng.random(8)]
    rows += [(100, dup), (101, dup)]  # identical pair -> cosine 1.0
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_semdedup_flags_identical_pair_keeps_lower_id(semdedup_df):
    got = {r["id"]: r for r in similarity.semdedup(
        semdedup_df, eps=0.999, n_centroids=2).collect()}
    assert len(got) == 14
    a, b = got[100], got[101]
    # identical vectors must co-cluster; centroid-sim ties break by id
    # asc, so 100 ranks earlier and 101 carries the sim-1.0 edge.
    assert a["cluster"] == b["cluster"]
    assert b["is_dup"] and abs(b["max_prior_sim"] - 1.0) < 1e-12
    assert not a["is_dup"] or a["max_prior_sim"] < 0.9999999
    # every cluster's first-ranked member reports the -1.0 sentinel
    n_clusters = len({r["cluster"] for r in got.values()})
    assert sum(1 for r in got.values() if r["max_prior_sim"] == -1.0) == n_clusters


def test_semdedup_partition_invariant(semdedup_df):
    one = sorted(map(tuple, similarity.semdedup(
        semdedup_df.repartition(1), eps=0.999, n_centroids=2).collect()))
    many = sorted(map(tuple, similarity.semdedup(
        semdedup_df.repartition(7), eps=0.999, n_centroids=2).collect()))
    assert one == many


def test_chunk_documents_offsets_reconstruct(spark):
    rows = [(0, "a" * 48 + "b" * 48 + "c" * 30), (1, "short"), (2, ""), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = text.chunk_documents(df, chunk_chars=64, overlap=16).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # empty/null docs produce no chunks
    assert set(by_doc) == {0, 1}
    assert len(by_doc[1]) == 1 and by_doc[1][0]["chunk_text"] == "short"
    src = rows[0][1]
    chunks = sorted(by_doc[0], key=lambda r: r["chunk_id"])
    # starts every chunk_chars - overlap; [start, end) slices the source
    assert [c["start"] for c in chunks] == [0, 48, 96]
    for c in chunks:
        assert c["chunk_text"] == src[c["start"]:c["end"]]
    # overlap region of consecutive chunks is identical text
    assert chunks[0]["chunk_text"][48:] == chunks[1]["chunk_text"][:16]
    # stitching chunks minus overlap reproduces the document
    stitched = chunks[0]["chunk_text"] + "".join(c["chunk_text"][16:] for c in chunks[1:])
    assert stitched == src


def test_cluster_quota_sample_bounds_and_determinism(emb_df):
    got = similarity.cluster_quota_sample(emb_df, n_per_cluster=3, n_centroids=4).collect()
    per = {}
    for r in got:
        per.setdefault(r["cluster"], []).append(r["pick_rank"])
    # quota respected, ranks contiguous from 1 within each cluster
    for ranks in per.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3
    # deterministic under repartition
    again = similarity.cluster_quota_sample(
        emb_df.repartition(5), n_per_cluster=3, n_centroids=4
    ).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_embedding_contamination_flags_planted_copy(spark):
    rng = np.random.default_rng(3)
    bench_rows = [(i, [float(x) for x in rng.random(8)]) for i in range(3)]
    corpus_rows = [(100 + i, [float(x) for x in rng.random(8)]) for i in range(5)]
    corpus_rows.append((200, bench_rows[1][1]))  # exact copy of bench 1
    corpus = spark.createDataFrame(corpus_rows, "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(bench_rows, "vec_id long, embedding array<float>")
    got = {r["id"]: r for r in similarity.embedding_contamination(
        corpus, bench, threshold=0.9999).collect()}
    assert len(got) == 6
    assert got[200]["contaminated"] and got[200]["bench_id"] == 1
    assert abs(got[200]["max_bench_sim"] - 1.0) < 1e-12
    # every row reports its nearest benchmark item even when clean
    assert all(r["bench_id"] in (0, 1, 2) for r in got.values())


def test_embedding_contamination_empty_benchmark(spark):
    corpus = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [3.0, 4.0])], "vec_id long, embedding array<float>"
    )
    bench = corpus.where("vec_id < 0")
    got = {r["id"]: r for r in similarity.embedding_contamination(
        corpus, bench).collect()}
    assert len(got) == 2
    assert all(r["max_bench_sim"] == -1.0 and not r["contaminated"]
               and r["bench_id"] is None for r in got.values())


def test_gopher_rules_per_rule_metrics(spark):
    good = ("the data and type of value that we have with it " * 6).strip()  # 66 words
    bullets = "- one\n- two\n- three\nplain"
    dots = "first line...\nsecond…\nthird"
    symbols = "the # of ## items # is # large # here # now # ok"
    rows = [(0, good), (1, bullets), (2, dots), (3, symbols), (4, ""), (5, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in text.gopher_rules(df).collect()}

    g = got[0]
    assert g["word_count"] == 66 and g["alpha_frac"] == 1.0
    assert g["stop_hits"] >= 5 and g["pass"]

    b = got[1]
    assert b["bullet_frac"] == pytest.approx(3 / 4) and not b["pass"]

    d = got[2]
    assert d["ellipsis_frac"] == pytest.approx(2 / 3)

    s = got[3]
    # 8 '#' chars over 15 whitespace words
    assert s["symbol_ratio"] == pytest.approx(8 / 15)
    assert not s["pass"]

    for i in (4, 5):
        e = got[i]
        assert e["word_count"] == 0 and e["mean_word_len"] == 0.0 and not e["pass"]


def test_c4_filters_line_keep_and_doc_flags(spark):
    doc0 = 'This is a good sentence with words.\nshort line.\nno terminal punct here\nAnother full sentence stands right here!\nIs this a kept question line too?'
    rows = [
        (0, doc0),
        (1, "function f() { return 1; }\nA sentence that would pass here."),
        (2, "Lorem Ipsum dolor sit amet consectetur.\nMore text follows after that line."),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["id"]: r for r in text.c4_filters(df).collect()}

    g = got[0]
    # 'short line.' (2 words) and the unpunctuated line are dropped
    assert g["n_lines"] == 5 and g["n_kept_lines"] == 3
    assert g["cleaned_text"].count("\n") == 2
    assert g["n_sentences"] == 3 and g["pass"]

    assert got[1]["has_brace"] and not got[1]["pass"]
    assert got[2]["has_lorem"] and not got[2]["pass"]
    e = got[3]
    assert e["n_kept_lines"] == 0 and e["cleaned_text"] == "" and not e["pass"]


def test_top_ngram_stats_dominant_phrase(spark):
    doc = "spark table spark table spark table other words here"
    df = spark.createDataFrame([(0, doc), (1, "one two"), (2, "")],
                               "doc_id long, text string")
    got = {(r["id"], r["n"]): r for r in text.top_ngram_stats(df).collect()}
    g2 = got[(0, 2)]
    # 'spark table' occurs 3x; 'table spark' only 2x
    assert g2["top_gram"] == "spark table" and g2["top_count"] == 3
    assert g2["char_frac"] == pytest.approx(3 * len("spark table") / len(doc))
    # doc 1 has a 2-gram but no 3/4-gram row; doc 2 emits nothing
    assert (1, 2) in got and (1, 3) not in got
    assert not any(k[0] == 2 for k in got)
    # ties break gram-asc: 'a b' and 'b a' both occur twice in this doc
    tie = spark.createDataFrame([(5, "b a b a b")], "doc_id long, text string")
    t = {r["n"]: r for r in text.top_ngram_stats(tie).collect()}
    assert t[2]["top_gram"] == "a b" and t[2]["top_count"] == 2


def test_derive_n_centroids_scales_with_corpus(semdedup_df):
    assert similarity.derive_n_centroids(500) == 8            # lo clamp
    assert similarity.derive_n_centroids(10_000_000) == 10_000
    assert similarity.derive_n_centroids(10**9) == 65_536     # hi clamp
    # n_centroids=None derives from the corpus and still runs end-to-end
    got = similarity.semdedup(semdedup_df, eps=0.999, n_centroids=None).collect()
    assert len(got) == 14
    picked = similarity.cluster_quota_sample(
        semdedup_df, n_per_cluster=2, n_centroids=None).collect()
    assert all(r["pick_rank"] <= 2 for r in picked)
