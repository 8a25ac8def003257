"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs.

The container has no image/audio codecs, so the DECODE step is a
clearly-marked stub (``decode_media`` raises NotImplementedError;
``fake_decode`` is the deterministic test double) — but everything
Spark-side is real and tested: the schema contract, the mapInPandas
batch shape (one Arrow batch of binary cells → one features frame),
metadata propagation, deterministic frame sampling, and partition
sizing (binary payloads dominate partition bytes, so
``repartition_for_media`` targets rows-per-partition from the average
payload size rather than row count).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StructType(
            [
                T.StructField("width", T.IntegerType()),
                T.StructField("height", T.IntegerType()),
                T.StructField("n_frames", T.IntegerType()),
                T.StructField("sample_rate", T.IntegerType()),
            ]
        )),
    ]
)

FEATURE_DIM = 16


def decode_media(payload: bytes, mime: str) -> np.ndarray:
    """Real decoder entry point — requires image/audio libs not present
    in this container. Deployments plug Pillow/torchaudio/decord here;
    the Spark plumbing (batching, schema, partitioning) is identical.
    """
    raise NotImplementedError(
        "media decoding requires codec libraries (Pillow/ffmpeg) not "
        "available in this environment; use fake_decode for tests"
    )


def fake_decode(payload: bytes, mime: str) -> np.ndarray:
    """Deterministic stand-in decoder: a pseudo 'pixel array' derived
    from sha256(payload) — stable across runs/partitions, so tests can
    assert exact feature values."""
    h = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(h[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.random(64, dtype=np.float64)


def media_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic synthetic media table from a text corpus (UTF-8
    payload + derived metadata) — the test fixture generator."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.coalesce(F.col(text_col), F.lit("")), "UTF-8").alias("media"),
        F.when(F.col(id_col) % 3 == 0, "image/png")
        .when(F.col(id_col) % 3 == 1, "audio/wav")
        .otherwise("video/mp4").alias("mime"),
        F.struct(
            (F.length(F.coalesce(F.col(text_col), F.lit(""))) % 640 + 1).cast("int").alias("width"),
            (F.length(F.coalesce(F.col(text_col), F.lit(""))) % 480 + 1).cast("int").alias("height"),
            (F.col(id_col) % 100 + 1).cast("int").alias("n_frames"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def media_stats(media_df: DataFrame) -> DataFrame:
    """Typed-metadata + payload accounting, all JVM-side: (media_id,
    mime, n_bytes, payload_sha256, width, height)."""
    return media_df.select(
        "media_id",
        "mime",
        F.length("media").cast("long").alias("n_bytes"),
        F.sha2(F.col("media"), 256).alias("payload_sha256"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


def extract_features(
    media_df: DataFrame, decode=fake_decode, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + featurize via mapInPandas: one Arrow batch of binary
    cells in, one (media_id, features: array<double>) frame out. The
    'model' here is mean-pooling over fixed-stride chunks of the
    decoded array — the real pipeline swaps ``decode`` and the pooling
    for codec + encoder, with the identical batch shape."""

    def featurize(iterator):
        for pdf in iterator:
            feats = []
            for payload, mime in zip(pdf["media"], pdf["mime"]):
                arr = decode(bytes(payload) if payload is not None else b"", mime)
                chunks = np.array_split(arr, feature_dim)
                feats.append([float(c.mean()) if len(c) else 0.0 for c in chunks])
            yield pd.DataFrame({"media_id": pdf["media_id"], "features": feats})

    return media_df.select("media_id", "media", "mime").mapInPandas(
        featurize, schema="media_id long, features array<double>"
    )


def extract_feature_rows(
    media_df: DataFrame, feature_dim: int = FEATURE_DIM
) -> DataFrame:
    """Decode + featurize to EXPLODED rows ``(media_id, dim, value)`` —
    the oracle-checkable form of :func:`extract_features` (array cells
    aren't hashable/sortable downstream; exploded rows are, and they're
    also the layout the similarity ops consume).

    The test-double featurizer is digest-derived integer math:
    ``value[d] = int(sha256(payload).hex()[4d:4d+4], 16)`` — fully
    SQL-expressible, so the DuckDB oracle reproduces every value
    bit-for-bit. The mapInPandas batch shape (one Arrow batch of binary
    cells in, one frame out) is exactly what a real encoder uses;
    deployments swap the digest for codec+model keeping this schema.
    """
    if not 1 <= feature_dim <= 16:
        raise ValueError("feature_dim must be in [1, 16] (64 hex chars / 4)")
    import hashlib as _hl

    def featurize(iterator):
        for pdf in iterator:
            ids = np.repeat(pdf["media_id"].to_numpy(dtype=np.int64), feature_dim)
            dims = np.tile(np.arange(feature_dim, dtype=np.int64), len(pdf))
            vals = np.empty(len(pdf) * feature_dim, dtype=np.int64)
            for i, payload in enumerate(pdf["media"]):
                hx = _hl.sha256(
                    bytes(payload) if payload is not None else b""
                ).hexdigest()
                for d in range(feature_dim):
                    vals[i * feature_dim + d] = int(hx[4 * d : 4 * d + 4], 16)
            yield pd.DataFrame({"media_id": ids, "dim": dims, "value": vals})

    return media_df.select("media_id", "media").mapInPandas(
        featurize, schema="media_id long, dim long, value long"
    )


def sample_frames(media_df: DataFrame, n_samples: int = 4) -> DataFrame:
    """Deterministic frame sampling for video rows: evenly-strided
    frame indices from meta.n_frames (JVM-side sequence math, one row
    per sampled frame)."""
    vids = media_df.where(F.col("mime").startswith("video/"))
    # explicit floor: Spark's cast-to-int truncates but DuckDB's
    # rounds, so the oracle would diverge on a bare cast
    idx = F.transform(
        F.sequence(F.lit(0), F.lit(n_samples - 1)),
        lambda i: F.floor(i * F.col("meta.n_frames") / n_samples).cast("int"),
    )
    return vids.select(
        "media_id",
        F.col("meta.n_frames").alias("n_frames"),
        F.explode(F.array_distinct(idx)).alias("frame_idx"),
    )


def repartition_for_media(
    media_df: DataFrame, target_partition_bytes: int = 128 * 1024 * 1024
) -> DataFrame:
    """Partition by payload volume, not row count: estimates average
    payload size from a sample and repartitions so a partition holds
    ~target bytes — binary columns are why maxPartitionBytes-style
    sizing must consider cell size, not rows."""
    row = media_df.select(F.avg(F.length("media")).alias("avg")).collect()[0]
    avg = max(int(row["avg"] or 1), 1)
    n = media_df.count()
    parts = max(1, int(np.ceil(n * avg / target_partition_bytes)))
    return media_df.repartition(parts)
