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

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.functions.smallfloat import norm_byte_from_length
from lucenenet_spark.functions.varbyte import (
    BLOCK_SIZE,
    delta_encode_docids,
    encode_freqs,
    encode_positions,
    decode_freqs,
    decode_positions,
    delta_decode_docids,
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


def _ordered_with_offsets(
    corpus: DataFrame, spec: CorpusSpec, partitions: int | None = None
) -> tuple[DataFrame, dict[int, int]]:
    """Range-bucket + sort the corpus by the pinned order columns with
    VALUE-DETERMINISTIC bucket ids, and compute per-bucket docid
    offsets (prefix sums of bucket row counts — one tiny collect).

    Spark's own ``repartitionByRange`` samples with a per-execution
    seed, so two jobs over the same plan can disagree on partition
    boundaries — fatal here, because the offsets collected in the
    counts job must describe exactly the buckets the main job sees
    (observed in practice: overlapping docid ranges → duplicate
    postings). Instead we sample order keys ONCE (deterministic
    every-k-th-row sample), freeze quantile boundaries driver-side,
    and compute ``__pid = bisect(boundaries, key)`` as a pure function
    of the row's values. Every job then agrees on bucket membership
    and within-bucket order no matter how Spark schedules or
    re-executes it, which also makes docids invariant to cluster size
    (the north rule's N vs 4N run) and to task retries at 100 TB.

    Downstream workers assign ``docid = offset[__pid] + local_rank``
    inline, fused into whatever per-partition work they already do:
    chaining a separate assignment mapInPandas in front of the
    tokenizer would pipe every content byte JVM→Python→JVM→Python
    (measured 4-10× slower than one fused Python stage).
    """
    order_cols = list(spec.order_cols)
    # 2 partitions per core: the tokenize stage downstream has ragged
    # per-doc cost (long-tail doc lengths), and finer tasks keep all
    # cores busy instead of waiting on stragglers
    parts = partitions or 2 * corpus.sparkSession.sparkContext.defaultParallelism
    keys = corpus.select(*order_cols)

    def sample_keys(iterator):
        for pdf in iterator:
            step = max(1, len(pdf) // 64)
            yield pdf.iloc[::step]

    sampled = sorted(
        tuple(r) for r in keys.mapInPandas(sample_keys, schema=keys.schema).collect()
    )
    # 4 buckets per partition: hash placement of buckets onto
    # partitions then balances within ~25% instead of 2-3×
    n_buckets = parts * 4
    boundaries = (
        [sampled[(len(sampled) * i) // n_buckets] for i in range(1, n_buckets)]
        if sampled
        else []
    )

    @F.pandas_udf("int")
    def pid_of(*cols: pd.Series) -> pd.Series:
        import bisect

        out = np.empty(len(cols[0]), dtype=np.int32)
        for i, tup in enumerate(zip(*cols)):
            out[i] = bisect.bisect_right(boundaries, tup)
        return pd.Series(out)

    ordered = (
        corpus.withColumn("__pid", pid_of(*[F.col(c) for c in order_cols]))
        .repartition(parts, "__pid")
        .sortWithinPartitions(*order_cols)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ordered.groupBy("__pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    base = 0
    for pid in sorted(counts):
        offsets[pid] = base
        base += counts[pid]
    return ordered, offsets


def _assign_ids_in_batches(iterator, offsets: dict[int, int]):
    """Shared docid assignment: yields (pdf, docids). A physical
    partition may hold several __pid buckets (hash(pid) → partition);
    rows arrive sorted by the order columns, buckets contiguous, so a
    per-bucket running counter gives the within-bucket rank."""
    local: dict[int, int] = {}
    for pdf in iterator:
        if len(pdf) == 0:
            continue
        pids = pdf["__pid"].to_numpy()
        ids = np.empty(len(pdf), dtype=np.int64)
        for pid in np.unique(pids):
            m = pids == pid
            cnt = int(m.sum())
            start = local.get(int(pid), 0)
            ids[m] = offsets.get(int(pid), 0) + start + np.arange(cnt, dtype=np.int64)
            local[int(pid)] = start + cnt
        yield pdf, ids


def _invert_frame(texts, ids, meta: dict[str, list] | None = None) -> pd.DataFrame:
    """Invert one Arrow batch: texts+docids -> posting rows PLUS one
    doc-level marker row per document (``term`` NULL) carrying
    field_length, the norm byte, ``sha256(content)`` (the input_hint
    per-row invariant) and the meta columns. Emitting both row kinds
    from the single tokenize pass means the whole index build reads
    the corpus exactly ONCE — no second scan, no docid join to attach
    norms (the reference computes norms in the same indexing chain,
    ``Index/DocInverterPerField.cs:197-198``, for the same reason).
    """
    meta = meta or {}
    out_doc, out_term, out_freq, out_pos, out_fl, out_norm = [], [], [], [], [], []
    fls = np.zeros(len(texts), dtype=np.int64)
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
        docid = ids[i]
        for term, positions in agg.items():
            out_doc.append(docid)
            out_term.append(term)
            out_freq.append(len(positions))
            out_pos.append(positions)
            out_fl.append(fls[i])
            out_norm.append(int(norms[i]))
    n_post = len(out_doc)
    out = pd.DataFrame(
        {
            "docid": pd.array(list(out_doc) + list(ids), dtype="int64"),
            "term": out_term + [None] * len(texts),
            "freq": pd.array(out_freq + [0] * len(texts), dtype="int32"),
            "positions": out_pos + [None] * len(texts),
            "field_length": pd.array(
                out_fl + [int(f) for f in fls], dtype="int32"
            ),
            "norm": pd.array(
                out_norm + [int(b) for b in norms], dtype="int32"
            ),
            "content_sha256": [None] * n_post
            + [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts],
        }
    )
    for name, values in meta.items():
        out[name] = [None] * n_post + list(values)
    return out


def _flat_schema(meta_fields: list[T.StructField]) -> T.StructType:
    return T.StructType(
        list(POSTINGS_FLAT_SCHEMA.fields)
        + [T.StructField("content_sha256", T.StringType())]
        + meta_fields
    )


def _invert_batches(meta_cols: list[str]):
    """mapInPandas worker: (docid, __text, meta...) -> flat rows."""

    def gen(iterator):
        for pdf in iterator:
            yield _invert_frame(
                pdf["__text"].fillna("").tolist(),
                pdf["docid"].to_numpy(),
                {c: pdf[c].tolist() for c in meta_cols},
            )

    return gen


def _invert_batches_assigning(offsets: dict[int, int], meta_cols: list[str]):
    """mapInPandas worker: (__pid, __text, meta...) -> flat rows, with
    docid assignment fused into the tokenize stage (one Python hop)."""

    def gen(iterator):
        for pdf, ids in _assign_ids_in_batches(iterator, offsets):
            yield _invert_frame(
                pdf["__text"].fillna("").tolist(),
                ids,
                {c: pdf[c].tolist() for c in meta_cols},
            )

    return gen


def _project_docids(offsets: dict[int, int], cols: list[str]):
    """mapInPandas worker: ordered corpus partition -> (docid, cols...)."""

    def gen(iterator):
        for pdf, ids in _assign_ids_in_batches(iterator, offsets):
            out = pdf[cols].copy()
            out.insert(0, "docid", ids)
            yield out

    return gen


def _pack_group(key, pdf):
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
    # the persisted single-scan output both docs and postings derive
    # from (None for a loaded index)
    flat: DataFrame | None = None

    @property
    def avgdl_inputs(self) -> tuple[int, int]:
        return self.sum_total_term_freq, self.max_doc

    def cache(self) -> "InvertedIndex":
        # docs/postings are cheap filters over the already-persisted
        # flat scan when it exists; only cache what adds reuse value
        if self.flat is None:
            self.docs.cache()
            self.postings.cache()
        self.packed.cache()
        self.term_stats.cache()
        return self

    def unpersist(self) -> "InvertedIndex":
        for df in (self.flat, self.docs, self.postings, self.packed, self.term_stats):
            if df is not None:
                df.unpersist()
        return self

    def save(self, path: str) -> None:
        """Persist as a parquet warehouse (Iceberg-shaped layout: the
        production deployment writes these same tables as Iceberg with
        snapshot commits; the sandbox has no Iceberg runtime jar).

        Only the PACKED postings are persisted — one posting store,
        like the reference's single ``.doc/.pos`` files; the flat
        per-(docid, term) view is reconstructed lazily on load via
        :func:`unpack_postings`. Writing both would double index bytes
        and write time for zero query benefit.
        """
        self.docs.write.mode("overwrite").parquet(os.path.join(path, "docs"))
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
        packed = spark.read.parquet(os.path.join(path, "packed"))
        return cls(
            docs=spark.read.parquet(os.path.join(path, "docs")),
            postings=unpack_postings(packed),
            packed=packed,
            term_stats=spark.read.parquet(os.path.join(path, "term_stats")),
            max_doc=stats["max_doc"],
            sum_total_term_freq=stats["sum_total_term_freq"],
        )


POSTINGS_UNPACKED_SCHEMA = T.StructType(
    [
        T.StructField("docid", T.LongType()),
        T.StructField("term", T.StringType()),
        T.StructField("freq", T.IntegerType()),
        T.StructField("positions", T.ArrayType(T.IntegerType())),
        T.StructField("norm", T.IntegerType()),
    ]
)


def unpack_postings(packed: DataFrame) -> DataFrame:
    """Lazy flat view over the packed blocks: decode delta+varbyte back
    to per-(docid, term) rows with positions and the norm byte. Filters
    on ``term`` placed above this view still push down to the packed
    parquet scan (the mapInPandas is per-block, so Catalyst prunes
    blocks first when the caller filters ``packed`` before unpacking —
    callers that can, should filter the packed DF and unpack the rest).
    """

    def unpack(iterator):
        for pdf in iterator:
            frames = []
            for term, docs_enc, freqs_enc, norms_enc, pos_enc, cnt in zip(
                pdf["term"], pdf["docs_enc"], pdf["freqs_enc"],
                pdf["norms_enc"], pdf["positions_enc"], pdf["count"],
            ):
                d = delta_decode_docids(bytes(docs_enc))
                f = decode_freqs(bytes(freqs_enc))
                n = np.frombuffer(bytes(norms_enc), dtype=np.uint8)
                pos = decode_positions(bytes(pos_enc), int(cnt))
                frames.append(
                    pd.DataFrame(
                        {
                            "docid": d,
                            "term": term,
                            "freq": f.astype(np.int32),
                            "positions": [p.astype(np.int32) for p in pos],
                            "norm": n.astype(np.int32),
                        }
                    )
                )
            if frames:
                yield pd.concat(frames)

    return packed.mapInPandas(unpack, schema=POSTINGS_UNPACKED_SCHEMA)


def assign_docids(
    corpus: DataFrame, spec: CorpusSpec, partitions: int | None = None
) -> DataFrame:
    """Attach a deterministic ``docid`` column.

    With ``id_col``: use it directly. Otherwise **range-partitioned
    rank**: ``repartitionByRange`` on the pinned order columns +
    ``sortWithinPartitions``, a tiny per-partition count job, then a
    prefix-sum of partition offsets broadcast into a mapInPandas that
    numbers rows partition-locally. This is the scalable form of
    ``row_number() over (order by ...)`` — a plain global window
    funnels the whole corpus through ONE partition (the sort has no
    partitionBy), serializing tokenization downstream; here every
    partition stays parallel and the only driver state is one offset
    per partition. docids are the global rank in the total order, so
    they are identical for ANY partition count/boundaries (the order
    columns are a unique key) — the partition-count-invariance the
    north rule's two-cluster-size run depends on.

    Cost: two passes over the corpus (count + assign). At 10^12 rows
    both passes are embarrassingly parallel.
    """
    if spec.id_col:
        return corpus.withColumn("docid", F.col(spec.id_col).cast("long"))
    ordered, offsets = _ordered_with_offsets(corpus, spec, partitions)
    cols = [f.name for f in corpus.schema.fields]
    out_schema = T.StructType(
        [T.StructField("docid", T.LongType())] + list(corpus.schema.fields)
    )
    return ordered.mapInPandas(_project_docids(offsets, cols), schema=out_schema)


def build_index(
    spark: SparkSession,
    corpus: DataFrame,
    spec: CorpusSpec | None = None,
    with_packed: bool = True,
) -> InvertedIndex:
    spec = spec or CorpusSpec()
    meta = [
        c for c in spec.meta_cols if c in corpus.columns and c != spec.text_col
    ]
    field_by_name = {f.name: f for f in corpus.schema.fields}
    schema = _flat_schema([field_by_name[c] for c in meta])

    # ONE corpus scan: the tokenize stage emits posting rows AND
    # doc-level marker rows (term NULL: field_length/norm/sha/meta) —
    # no second pass, no docid join to reattach norms
    if spec.id_col:
        with_ids = corpus.withColumn("docid", F.col(spec.id_col).cast("long"))
        flat_all = with_ids.select(
            "docid", F.col(spec.text_col).alias("__text"), *meta
        ).mapInPandas(_invert_batches(meta), schema=schema)
    else:
        # no pre-existing id: range-partitioned total order, with docid
        # assignment FUSED into the tokenize stage (a separate
        # assignment mapInPandas would double the JVM<->Python hops for
        # every content byte)
        ordered, offsets = _ordered_with_offsets(corpus, spec)
        flat_all = ordered.select(
            "__pid", F.col(spec.text_col).alias("__text"), *meta
        ).mapInPandas(_invert_batches_assigning(offsets, meta), schema=schema)
    flat_all = flat_all.persist()

    postings = flat_all.where(F.col("term").isNotNull()).select(
        *[f.name for f in POSTINGS_FLAT_SCHEMA.fields]
    )
    docs = flat_all.where(F.col("term").isNull()).select(
        "docid", *meta, "field_length", "norm", "content_sha256"
    )

    term_stats = postings.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("freq").alias("ttf")
    )

    corpus_agg = docs.agg(
        F.count("*").alias("max_doc"),
        F.coalesce(F.sum("field_length"), F.lit(0)).alias("sttf"),
    ).collect()[0]

    if with_packed:
        packed = (
            postings.withColumn(
                "bucket", (F.col("docid") / F.lit(BUCKET_DOCS)).cast("long")
            )
            .groupBy("term", "bucket")
            .applyInPandas(_pack_group, schema=PACKED_SCHEMA)
        )
    else:
        packed = spark.createDataFrame([], PACKED_SCHEMA)

    return InvertedIndex(
        docs=docs,
        postings=postings,
        packed=packed,
        term_stats=term_stats,
        max_doc=int(corpus_agg["max_doc"]),
        sum_total_term_freq=int(corpus_agg["sttf"]),
        spec=spec,
        flat=flat_all,
    )
