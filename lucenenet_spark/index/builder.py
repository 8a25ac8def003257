"""Distributed inverted-index builder — the Spark rebuild of the
IndexWriter write path (reference trace: SURVEY.md §3.1).

Pipeline (all DataFrame/Arrow, no per-row Python):

1. **docid assignment** — deterministic total order so distributed
   results are rank-identical to a single-node oracle (the reference
   assigns arrival-order segment-local ids + docBase,
   ``Index/DocumentsWriterPerThread.cs``; we pin a total order on the
   corpus instead, SURVEY.md §1.4).
2. **inversion** — ``mapInPandas`` batch tokenize + in-batch
   aggregation to (docid, term, freq, positions, field_length, norm):
   the Arrow batch is our DocumentsWriterPerThread: a share-nothing,
   partition-local in-RAM inversion with map-side combine
   (``Index/TermsHashPerField.cs`` analog). The norm byte is computed
   here too, so postings never need a docid join to pick up norms at
   query time (Lucene's random-access ``.nvd`` lookup does not exist
   on a cluster; we denormalize one byte per posting instead).
3. **posting packing** — shuffle on ``(term, docid_bucket)`` and pack
   each group into ≤128-doc delta+varbyte blocks with block metadata
   (first/last docid, max_freq, max_norm). The bucket key bounds every
   group to ``BUCKET_DOCS`` docs **by construction**, so even a term
   appearing in every document (Zipf head / stopword-ish code tokens:
   ``return``, ``0``) cannot create a hot reducer — this is the
   explicit salting strategy for skewed terms; buckets are
   docid-disjoint so per-bucket block lists concatenate into the full
   posting list with no merge pass (tiered-merge-free by design).
4. **stats** — ``term_stats(term, df, ttf)`` and corpus stats
   (max_doc, sum_total_term_freq): partial/final hash aggregates,
   the distributed version of ``TermContext.Build`` /
   ``CollectionStatistics`` (``Search/IndexSearcher.cs:1070-1116``)
   computed once at build time and broadcast at query time.

At 100 TB the shuffle in (3) moves aggregated (docid, term, freq)
rows — far smaller than raw tokens — and AQE handles residual skew.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.functions.smallfloat import norm_byte_from_length
from lucenenet_spark.functions.varbyte import (
    BLOCK_SIZE,
    delta_encode_docids,
    encode_freqs,
    encode_positions,
    vbyte_encode,
)

# docid-range bucket width for posting packing; a multiple of
# BLOCK_SIZE so blocks never straddle buckets. 64 blocks per bucket.
BUCKET_DOCS = BLOCK_SIZE * 64


@dataclass(frozen=True)
class CorpusSpec:
    """How to read a corpus table.

    ``id_col``: existing unique integer docid column (used as-is).
    ``order_cols``: when ``id_col`` is None, docids are assigned by
    ``row_number() over (order by order_cols)`` - 1 — the pinned total
    order making distributed output comparable to the oracle.
    """

    text_col: str = "content"
    id_col: str | None = None
    order_cols: tuple[str, ...] = ("repo", "path", "commit")
    meta_cols: tuple[str, ...] = ()


POSTINGS_FLAT_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("freq", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("field_length", T.IntegerType()),
        T.StructField("norm", T.IntegerType()),  # 0..255 norm byte
    ]
)

PACKED_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("block_id", T.IntegerType()),
        T.StructField("first_docid", T.LongType()),
        T.StructField("last_docid", T.LongType()),
        T.StructField("count", T.IntegerType()),
        T.StructField("max_freq", T.IntegerType()),
        T.StructField("max_norm", T.IntegerType()),
        T.StructField("min_norm", T.IntegerType()),
        T.StructField("docs_enc", T.BinaryType()),
        T.StructField("freqs_enc", T.BinaryType()),
        T.StructField("norms_enc", T.BinaryType()),
        T.StructField("positions_enc", T.BinaryType()),
    ]
)


def _invert_batches(iterator):
    """mapInPandas worker: (docid, __text) -> flat posting rows."""
    for pdf in iterator:
        out_doc, out_term, out_freq, out_pos, out_fl, out_norm = [], [], [], [], [], []
        texts = pdf["__text"].fillna("")
        ids = pdf["docid"]
        fls = np.zeros(len(pdf), dtype=np.int64)
        per_doc: list[dict[str, list[int]]] = []
        for i, text in enumerate(texts):
            pairs = analyze(text)
            fls[i] = len(pairs)
            agg: dict[str, list[int]] = {}
            for term, pos in pairs:
                agg.setdefault(term, []).append(pos)
            per_doc.append(agg)
        norms = norm_byte_from_length(fls)
        for i, agg in enumerate(per_doc):
            docid = ids.iloc[i]
            for term, positions in agg.items():
                out_doc.append(docid)
                out_term.append(term)
                out_freq.append(len(positions))
                out_pos.append(positions)
                out_fl.append(fls[i])
                out_norm.append(int(norms[i]))
        yield pd.DataFrame(
            {
                "docid": pd.array(out_doc, dtype="int64"),
                "term": out_term,
                "freq": pd.array(out_freq, dtype="int32"),
                "positions": out_pos,
                "field_length": pd.array(out_fl, dtype="int32"),
                "norm": pd.array(out_norm, dtype="int32"),
            }
        )


def _pack_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas worker: one (term, bucket) group -> packed blocks."""
    term, bucket = key
    pdf = pdf.sort_values("docid")
    docids = pdf["docid"].to_numpy(dtype=np.int64)
    freqs = pdf["freq"].to_numpy(dtype=np.int64)
    norms = pdf["norm"].to_numpy(dtype=np.int64)
    positions = list(pdf["positions"])
    rows = []
    for b0 in range(0, len(docids), BLOCK_SIZE):
        b1 = min(b0 + BLOCK_SIZE, len(docids))
        d, f, n = docids[b0:b1], freqs[b0:b1], norms[b0:b1]
        rows.append(
            {
                "term": term,
                "bucket": bucket,
                "block_id": b0 // BLOCK_SIZE,
                "first_docid": int(d[0]),
                "last_docid": int(d[-1]),
                "count": int(len(d)),
                "max_freq": int(f.max()),
                "max_norm": int(n.max()),
                # norm of the doc(s) attaining max_freq can be anywhere
                # in [min_norm, max_norm]; min_norm feeds the certified
                # per-block lower bound for rank-safe pruning
                "min_norm": int(n.min()),
                "docs_enc": delta_encode_docids(d),
                "freqs_enc": encode_freqs(f),
                "norms_enc": n.astype(np.uint8).tobytes(),
                "positions_enc": encode_positions(positions[b0:b1]),
            }
        )
    return pd.DataFrame(rows, columns=[f.name for f in PACKED_SCHEMA.fields])


@dataclass
class InvertedIndex:
    """Handle to the built index tables.

    ``docs``:       docid, <meta…>, field_length, norm, content_sha256
    ``postings``:   flat per-(docid, term) rows with positions
    ``packed``:     128-doc delta+varbyte blocks with block metadata
    ``term_stats``: term, df, ttf
    ``max_doc`` / ``sum_total_term_freq``: corpus scalars (broadcast
    to every query — the CollectionStatistics analog).
    """

    docs: DataFrame
    postings: DataFrame
    packed: DataFrame
    term_stats: DataFrame
    max_doc: int
    sum_total_term_freq: int
    spec: CorpusSpec = field(default_factory=CorpusSpec)

    @property
    def avgdl_inputs(self) -> tuple[int, int]:
        return self.sum_total_term_freq, self.max_doc

    def cache(self) -> "InvertedIndex":
        self.docs.cache()
        self.postings.cache()
        self.packed.cache()
        self.term_stats.cache()
        return self

    def save(self, path: str) -> None:
        """Persist as a parquet warehouse (Iceberg-shaped layout: the
        production deployment writes these same tables as Iceberg with
        snapshot commits; the sandbox has no Iceberg runtime jar)."""
        self.docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))
        self.postings.write.mode("overwrite").parquet(os.path.join(path, "postings"))
        # partitionBy bucket would scatter small files at test scale;
        # sort by term so parquet row-group min/max stats give the
        # "terms dictionary seek" (BlockTree analog) via pushdown.
        self.packed.sortWithinPartitions("term", "bucket", "block_id").write.mode(
            "overwrite"
        ).parquet(os.path.join(path, "packed"))
        self.term_stats.write.mode("overwrite").parquet(os.path.join(path, "term_stats"))
        stats = self.docs.sparkSession.createDataFrame(
            [(self.max_doc, self.sum_total_term_freq)],
            "max_doc long, sum_total_term_freq long",
        )
        stats.write.mode("overwrite").parquet(os.path.join(path, "corpus_stats"))

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "InvertedIndex":
        stats = spark.read.parquet(os.path.join(path, "corpus_stats")).collect()[0]
        return cls(
            docs=spark.read.parquet(os.path.join(path, "docs")),
            postings=spark.read.parquet(os.path.join(path, "postings")),
            packed=spark.read.parquet(os.path.join(path, "packed")),
            term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
            max_doc=stats["max_doc"],
            sum_total_term_freq=stats["sum_total_term_freq"],
        )


def assign_docids(corpus: DataFrame, spec: CorpusSpec) -> DataFrame:
    """Attach a deterministic ``docid`` column.

    With ``id_col``: use it directly. Otherwise row_number over the
    pinned total order. NOTE at 10^12 rows the single-window global
    sort is replaced by range-partitioned rank: repartitionByRange on
    the order cols + sortWithinPartitions + per-partition count
    prefix-sum offsets (the counts DataFrame is tiny); the Window form
    below is correct at any scale, just not the fastest — swap via
    ``scalable=True`` in build_index once corpus > ~10^8 rows.
    """
    if spec.id_col:
        return corpus.withColumn("docid", F.col(spec.id_col).cast("long"))
    w = Window.orderBy(*[F.col(c) for c in spec.order_cols])
    return corpus.withColumn("docid", F.row_number().over(w).cast("long") - 1)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    spec: CorpusSpec | None = None,
    with_packed: bool = True,
) -> InvertedIndex:
    spec = spec or CorpusSpec()
    with_ids = assign_docids(corpus, spec)

    flat = (
        with_ids.select("docid", F.col(spec.text_col).alias("__text"))
        .mapInPandas(_invert_batches, schema=POSTINGS_FLAT_SCHEMA)
    )
    flat = flat.persist()

    # docs table: meta + field_length/norm (docs with zero surviving
    # tokens produce no postings -> coalesce to fl=0 / norm=255, the
    # saturated 1/sqrt(0) byte; see smallfloat.norm_byte_from_length)
    doc_fl = flat.groupBy("docid").agg(
        F.first("field_length").alias("field_length"),
        F.first("norm").alias("norm"),
    )
    meta = [c for c in spec.meta_cols if c in corpus.columns]
    docs = (
        with_ids.select(
            "docid",
            *meta,
            F.sha2(F.coalesce(F.col(spec.text_col), F.lit("")), 256).alias("content_sha256"),
        )
        .join(doc_fl, "docid", "left")
        .fillna({"field_length": 0, "norm": 255})
    )

    term_stats = flat.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("ttf")
    )

    corpus_agg = docs.agg(
        F.count("*").alias("max_doc"),
        F.coalesce(F.sum("field_length"), F.lit(0)).alias("sttf"),
    ).collect()[0]

    packed = None
    if with_packed:
        packed = (
            flat.withColumn("bucket", (F.col("docid") / F.lit(BUCKET_DOCS)).cast("long"))
            .groupBy("term", "bucket")
            .applyInPandas(_pack_group, schema=PACKED_SCHEMA)
        )
    else:
        packed = spark.createDataFrame([], PACKED_SCHEMA)

    return InvertedIndex(
        docs=docs,
        postings=flat,
        packed=packed,
        term_stats=term_stats,
        max_doc=int(corpus_agg["max_doc"]),
        sum_total_term_freq=int(corpus_agg["sttf"]),
        spec=spec,
    )
