"""Deduplication operators for training-data curation.

All four families from the task brief, each as a declarative
DataFrame pipeline (built-in functions only — no per-row Python) so
Catalyst prunes/pushes and AQE handles skew:

- **exact**: sha256(text) hash-groupBy.
- **MinHash + LSH**: word-shingle → universal-hash minhash signature →
  band → bucket self-join → exact n-gram Jaccard verification. One
  shuffle per stage, candidate pairs only (never all-pairs).
- **SimHash**: 32-bit tf-weighted bit votes; hamming-≤3 pairs found by
  pigeonhole banding (4 bands of 8 bits: any pair within distance 3
  shares at least one exact band) then exact popcount filter.
- **n-gram Jaccard**: exact |A∩B|/|A∪B| over distinct shingles for a
  candidate pair set — the verification stage of the MinHash pipeline,
  also usable standalone.

Determinism/oracle notes: hashing via md5-prefix integers + int64
modular arithmetic (ops/hashing.py) so the DuckDB oracle reproduces
every value bit-for-bit; Jaccard is a double division of exact int64
counts — identical IEEE result in both engines.

At 100 TB: the shingle explode is the big intermediate — it flows
straight into a (doc, shingle-hash) aggregation (map-side combined),
and LSH bucket joins key on (band, band_hash) whose cardinality is
tunable via n_hashes/bands; hot buckets (boilerplate shingles) are
bounded by bucket-size capping (``max_bucket``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzer import TOKEN_PATTERN
from lucenenet_spark.ops.hashing import (
    MERSENNE_31,
    md5_prefix_int_col,
    minhash_coeffs,
    permute_col,
)

DEFAULT_N_HASHES = 16
DEFAULT_BANDS = 4
SHINGLE_K = 3


def exact_dup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: (id, content_hash, group_size, canonical_id); the
    canonical doc of a group is its smallest id."""
    h = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.sha2(F.coalesce(F.col(text_col), F.lit("")), 256).alias("content_hash"),
    )
    groups = h.groupBy("content_hash").agg(
        F.count("*").alias("group_size"), F.min("id").alias("canonical_id")
    )
    return h.join(F.broadcast(groups), "content_hash").select(
        "id", "content_hash", "group_size", "canonical_id"
    )


def shingles(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
             k: int = SHINGLE_K) -> DataFrame:
    """Distinct word k-shingles per doc: (id, shingle). Tokenization =
    the analyzer's regex WITHOUT stop removal (dedup wants raw
    surface), lowercased; shingle = k consecutive tokens joined by a
    single space."""
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.regexp_extract_all(F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                             F.lit(TOKEN_PATTERN), F.lit(0)).alias("toks"),
    )
    sh = toks.select(
        "id",
        F.explode(
            F.when(
                F.size("toks") >= k,
                F.transform(
                    F.sequence(F.lit(0), F.size("toks") - k),
                    lambda i: F.concat_ws(
                        " ", F.slice("toks", i + 1, k)
                    ),
                ),
            ).otherwise(F.array())
        ).alias("shingle"),
    )
    return sh.distinct()


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = DEFAULT_N_HASHES,
    k: int = SHINGLE_K,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<long>[n_hashes]) MinHash signatures."""
    coeffs = minhash_coeffs(n_hashes, seed)
    sh = shingles(df, id_col, text_col, k)
    base = sh.select(
        "id", (md5_prefix_int_col(F.col("shingle")) % MERSENNE_31).alias("h")
    )
    mins = base.groupBy("id").agg(
        *[
            F.min(permute_col(F.col("h"), a, b)).alias(f"m{i}")
            for i, (a, b) in enumerate(coeffs)
        ]
    )
    return mins.select(
        "id", F.array(*[f"m{i}" for i in range(n_hashes)]).alias("sig")
    )


def minhash_candidate_pairs(
    sigs: DataFrame,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    max_bucket: int = 1000,
) -> DataFrame:
    """LSH banding: docs sharing any band bucket. Output (id_a, id_b)
    with id_a < id_b, distinct. ``max_bucket`` drops degenerate
    buckets (boilerplate-heavy corpora) to bound the self-join."""
    r = n_hashes // bands
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",", *[F.col("sig")[b * r + j].cast("string") for j in range(r)]
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    sized = banded.groupBy("band", "key").agg(
        F.collect_list("id").alias("ids"), F.count("*").alias("n")
    ).where((F.col("n") >= 2) & (F.col("n") <= max_bucket))
    pairs = sized.select(
        F.explode(
            F.filter(
                F.flatten(
                    F.transform(
                        "ids",
                        lambda x: F.transform(
                            "ids", lambda y: F.struct(x.alias("a"), y.alias("b"))
                        ),
                    )
                ),
                lambda s: s["a"] < s["b"],
            )
        ).alias("p")
    ).select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
    return pairs.distinct()


def ngram_jaccard(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = SHINGLE_K,
) -> DataFrame:
    """Exact Jaccard over distinct k-shingles for each candidate pair:
    (id_a, id_b, inter, size_a, size_b, jaccard). Semi-joins shingles
    to the candidate ids first — never materializes all-pairs."""
    sh = shingles(df, id_col, text_col, k)
    ids = pairs.select(F.col("id_a").alias("id")).union(
        pairs.select(F.col("id_b").alias("id"))
    ).distinct()
    sh = sh.join(F.broadcast(ids), "id", "left_semi")
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    inter = (
        pairs.join(sh.select(F.col("id").alias("id_a"), "shingle"), "id_a")
        .join(sh.select(F.col("id").alias("id_b"), "shingle"), ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    # sizes join is LEFT + coalesce(0): a candidate doc with zero
    # shingles (empty/short text) must still appear in the output —
    # an inner join would silently drop the pair instead of reporting
    # jaccard 0; and union==0 (both sides empty) guards the 0/0
    out = (
        pairs.join(inter, ["id_a", "id_b"], "left")
        .fillna({"inter": 0})
        .join(
            F.broadcast(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))),
            "id_a", "left",
        )
        .join(
            F.broadcast(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))),
            "id_b", "left",
        )
        .fillna({"size_a": 0, "size_b": 0})
    )
    union = F.col("size_a") + F.col("size_b") - F.col("inter")
    return out.select(
        "id_a", "id_b", "inter", "size_a", "size_b",
        F.when(union == 0, F.lit(0.0))
        .otherwise(F.col("inter").cast("double") / union.cast("double"))
        .alias("jaccard"),
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
) -> DataFrame:
    """Full MinHash+LSH dedup: candidates via banding, verified by
    exact Jaccard >= threshold. (id_a, id_b, jaccard)."""
    sigs = minhash_signatures(df, id_col, text_col, n_hashes, SHINGLE_K, seed)
    pairs = minhash_candidate_pairs(sigs, n_hashes, bands)
    verified = ngram_jaccard(df, pairs, id_col, text_col)
    return verified.where(F.col("jaccard") >= threshold).select("id_a", "id_b", "jaccard")


def near_dup_groups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    n_hashes: int = DEFAULT_N_HASHES,
    bands: int = DEFAULT_BANDS,
    seed: int = 42,
    max_iters: int = 20,
) -> DataFrame:
    """Near-duplicate CLUSTERS: connected components over the verified
    MinHash pair graph, labeled by the smallest member id — the
    keep-one-per-cluster step a curation pipeline actually applies
    after pair finding. Output (id, canonical_id) for EVERY doc
    (singletons are their own canonical).

    Distributed shape: iterative min-label propagation with POINTER
    DOUBLING (label-of-label compression) each round — the standard
    large-graph connected-components loop, but converging in
    O(log diameter) rounds instead of O(diameter), so chain-shaped
    components (the max_iters trap flagged in round-2 ADVICE) close in
    a handful of rounds. The loop runs to CONVERGENCE (changed == 0) —
    never exits with wrong labels; ``max_iters`` is a safety ceiling
    that raises instead of silently diverging from the true components
    the recursive-CTE oracle computes. The driver sees one
    changed-count scalar per round — never labels."""
    ids = df.select(F.col(id_col).cast("long").alias("id"))
    pairs = minhash_dedup_pairs(df, id_col, text_col, threshold, n_hashes, bands, seed)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")).union(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )
    labels = ids.select("id", F.col("id").alias("lbl")).cache()
    edges = edges.cache()
    converged = False
    for _ in range(max_iters):
        neighbor = (
            edges.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("lbl").alias("nlbl"))
        )
        stepped = labels.join(neighbor, "id", "left").select(
            "id",
            F.least(F.col("lbl"), F.coalesce(F.col("nlbl"), F.col("lbl"))).alias("lbl"),
        )
        # pointer doubling: lbl <- label(lbl). Labels only decrease and
        # label(x) <= x, so this is a pure compression step that halves
        # chain depth per round.
        new_labels = (
            stepped.join(
                stepped.select(
                    F.col("id").alias("lbl"), F.col("lbl").alias("lbl2")
                ),
                "lbl",
                "left",
            )
            .select("id", F.coalesce(F.col("lbl2"), F.col("lbl")).alias("lbl"))
            .cache()
        )
        changed = (
            new_labels.withColumnRenamed("lbl", "new")
            .join(labels, "id")
            .where(F.col("new") != F.col("lbl"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"near_dup_groups did not converge in {max_iters} rounds — "
            "component diameter exceeds 2^max_iters; raise max_iters"
        )
    out = labels.select("id", F.col("lbl").alias("canonical_id"))
    edges.unpersist()
    return out


SIMHASH_BITS = 64
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS  # 16
SIMHASH_MAX_BUCKET = 1000


def _half_hash_col(col, start: int):
    """32-bit integer from md5 hex chars [start, start+8) — exact in
    both engines (DuckDB: CAST('0x'||substring(md5,start,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(col), start, 8), 16, 10).cast("long")


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash_hi, simhash_lo) 64-bit tf-weighted SimHash as two
    unsigned 32-bit halves (a single signed int64 can't hold bit 63
    portably across engines). Per distinct token, two md5-derived
    32-bit hashes supply the bit pattern; each bit accumulates +tf/-tf
    votes; bit set iff vote > 0. Exact int64 arithmetic throughout.

    64 bits (vs 32) is what makes banding survive scale: 16-bit band
    keys give 65536 buckets per band, so in-bucket candidate joins stay
    ~quadratic in n/65536 instead of n/256."""
    toks = df.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col(text_col), F.lit(""))),
                F.lit(TOKEN_PATTERN),
                F.lit(0),
            )
        ).alias("tok"),
    )
    tf = toks.groupBy("id", "tok").agg(F.count("*").alias("tf"))
    th = tf.select(
        "id", "tf",
        _half_hash_col(F.col("tok"), 1).alias("hlo"),
        _half_hash_col(F.col("tok"), 9).alias("hhi"),
    )
    half = SIMHASH_BITS // 2

    def vote(src, b):
        return F.sum(
            F.when(F.shiftright(F.col(src), b).bitwiseAND(F.lit(1)) == 1, F.col("tf"))
            .otherwise(-F.col("tf"))
        )

    votes = th.groupBy("id").agg(
        *[vote("hlo", b).alias(f"lo{b}") for b in range(half)],
        *[vote("hhi", b).alias(f"hi{b}") for b in range(half)],
    )

    def compose(prefix):
        return sum(
            [
                F.when(F.col(f"{prefix}{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
                for b in range(half)
            ],
            F.lit(0),
        ).cast("long")

    return votes.select(
        "id", compose("hi").alias("simhash_hi"), compose("lo").alias("simhash_lo")
    )


def _simhash_banded(sim: DataFrame) -> DataFrame:
    """Explode (id, hi, lo) to (id, hi, lo, band, key): 4 bands of 16
    bits — bands 0/1 from the lo half, 2/3 from the hi half."""
    mask = (1 << SIMHASH_BAND_BITS) - 1
    slots = []
    for band in range(SIMHASH_BANDS):
        src = "simhash_lo" if band < 2 else "simhash_hi"
        shift = (band % 2) * SIMHASH_BAND_BITS
        slots.append(
            F.struct(
                F.lit(band).alias("band"),
                F.shiftright(F.col(src), shift).bitwiseAND(F.lit(mask)).alias("key"),
            )
        )
    return sim.select(
        "id", "simhash_hi", "simhash_lo", F.explode(F.array(*slots)).alias("bk")
    ).select(
        "id", "simhash_hi", "simhash_lo",
        F.col("bk.band").alias("band"), F.col("bk.key").alias("key"),
    )


def simhash_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = SIMHASH_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b, hamming) pairs with hamming(simhash64) <= 3, found
    by pigeonhole banding: 4 bands of 16 bits — a pair within distance
    3 must agree exactly on >= 1 band, so the bucket self-join finds
    every qualifying pair (no recall loss), then exact popcount
    filters. ``max_bucket`` drops degenerate buckets (boilerplate
    corpora collapse to few simhashes) to bound the in-bucket join —
    the same cap the MinHash pipeline applies."""
    assert max_hamming < SIMHASH_BANDS
    banded = _simhash_banded(simhash(df, id_col, text_col))
    sizes = banded.groupBy("band", "key").agg(F.count("*").alias("n"))
    ok = sizes.where((F.col("n") >= 2) & (F.col("n") <= max_bucket)).select("band", "key")
    banded = banded.join(F.broadcast(ok), ["band", "key"], "left_semi")
    a = banded.select(
        F.col("id").alias("id_a"), F.col("simhash_hi").alias("ha"),
        F.col("simhash_lo").alias("la"), "band", "key",
    )
    b = banded.select(
        F.col("id").alias("id_b"), F.col("simhash_hi").alias("hb"),
        F.col("simhash_lo").alias("lb"), "band", "key",
    )
    cand = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ha", "la", "hb", "lb")
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) + F.bit_count(
        F.col("la").bitwiseXOR(F.col("lb"))
    )
    return cand.select("id_a", "id_b", hamming.alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )
