"""Classification over the index/corpus — the Lucene.Net.Classification
module re-expressed Spark-first (reference
``src/Lucene.Net.Classification/SimpleNaiveBayesClassifier.cs`` and
``KNearestNeighborClassifier.cs``).

The reference classifies ONE input string per call, issuing one
TotalHitCount query per (token, class) pair — O(tokens × classes)
searcher round-trips. Here training statistics are three hash
aggregations over the corpus and classification is a single joined
plan, so a 100 TB corpus classifies millions of inputs in one job:

- ``wf(term, class)`` — docs of class c containing term w — is one
  ``groupBy`` over the distinct (doc, term) pairs (shuffled on term,
  the natural key, so the later join with input tokens co-locates);
- the per-class constants (prior, smoothing denominator) are a tiny
  driver-side table broadcast into the plan;
- log-probabilities are FIXED-POINT int64 (``floor(ln(p) * 1e6)``,
  documented divergence from the reference's raw doubles): integer
  sums are associative, so scores are bit-identical under any
  partitioning / join order AND SQL-mirrorable — the repo's integer
  determinism discipline (same rationale as ops/similarity.py).

Semantics mirrored from the reference:
- prior  = ln(docCount(c)) - ln(totalDocs)        (:228)
- den(c) = avgUniqueTermsPerDoc * docCount(c) + totalDocs   (:196-206,
  avgUniqueTermsPerDoc = sumDocFreq / docCount over the text field)
- per token INSTANCE: ln((hits(word, c) + 1) / den(c))      (:172-194,
  add-1 smoothing; hits = doc frequency of word within class c)
- argmax class; ties break to the lexicographically smallest class
  (the reference keeps the first strictly-greater class in term
  enumeration order, which is lexicographic).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.analysis.analyzer import analyze

FP_SCALE = 1_000_000  # fixed-point log units: floor(ln(p) * 1e6)


def _token_pairs(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(docid, term, tf) — Arrow-batched StandardAnalyzer tokens with
    per-doc instance counts."""

    def tok(iterator):
        for pdf in iterator:
            ids, terms = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                for t, _pos in analyze(txt or ""):
                    ids.append(did)
                    terms.append(t)
            yield pd.DataFrame({"docid": pd.array(ids, dtype="int64"), "term": terms})

    pairs = docs.select(
        F.col(id_col).cast("long").alias(id_col), F.col(text_col)
    ).mapInPandas(tok, schema="docid long, term string")
    return pairs.groupBy("docid", "term").agg(F.count("*").alias("tf"))


def naive_bayes_classify(
    train: DataFrame,
    inputs: DataFrame,
    class_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Batch SimpleNaiveBayesClassifier: assign every ``inputs`` row a
    class from ``train``'s ``class_col``. Returns
    (doc_id, label, score_fp) — score_fp is the winning class's
    fixed-point log-posterior (prior + likelihood, 1e-6 log units)."""
    spark = train.sparkSession
    ttok = _token_pairs(train, id_col, text_col)
    labeled = train.select(
        F.col(id_col).cast("long").alias("docid"), F.col(class_col).alias("cls")
    ).where(F.col("cls").isNotNull())

    # corpus-level: sumDocFreq / docCount (reference :202-203)
    doc_count = train.where(F.col(text_col).isNotNull()).count()
    sum_doc_freq = ttok.count()  # distinct (doc, term) pairs
    avg_unique = sum_doc_freq / float(doc_count)

    cls_rows = labeled.groupBy("cls").agg(F.count("*").alias("ndocs")).collect()
    total = sum(int(r["ndocs"]) for r in cls_rows)
    cls_dim = []
    for r in sorted(cls_rows, key=lambda r: r["cls"]):
        nc = int(r["ndocs"])
        den = avg_unique * nc + total
        prior_fp = int(np.floor(np.log(float(nc)) * FP_SCALE)) - int(
            np.floor(np.log(float(total)) * FP_SCALE)
        )
        cls_dim.append((r["cls"], float(den), prior_fp))
    classes = spark.createDataFrame(cls_dim, "cls string, den double, prior_fp long")

    # wf(term, cls): docs of class c containing term (doc freq, not tf)
    wf = (
        ttok.select("docid", "term")
        .join(labeled, "docid")
        .groupBy("term", "cls")
        .agg(F.count("*").alias("wf"))
    )

    itok = _token_pairs(inputs, id_col, text_col)
    grid = itok.crossJoin(F.broadcast(classes)).join(
        wf, ["term", "cls"], "left"
    )

    @F.pandas_udf("long")
    def fp_ln(wf_s: pd.Series, den_s: pd.Series) -> pd.Series:
        w = wf_s.fillna(0).to_numpy(dtype=np.float64)
        d = den_s.to_numpy(dtype=np.float64)
        return pd.Series(
            np.floor(np.log((w + 1.0) / d) * FP_SCALE).astype(np.int64)
        )

    contrib = grid.select(
        "docid",
        "cls",
        "prior_fp",
        (F.col("tf").cast("long") * fp_ln(F.col("wf"), F.col("den"))).alias("c_fp"),
    )
    scores = contrib.groupBy("docid", "cls", "prior_fp").agg(
        F.sum("c_fp").alias("ll_fp")
    )
    w = Window.partitionBy("docid").orderBy(
        (F.col("prior_fp") + F.col("ll_fp")).desc(), F.col("cls").asc()
    )
    return (
        scores.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            F.col("docid").alias("doc_id"),
            F.col("cls").alias("label"),
            (F.col("prior_fp") + F.col("ll_fp")).cast("long").alias("score_fp"),
        )
    )


def knn_classify(
    searcher,
    docs: DataFrame,
    docid: int,
    k: int = 10,
    class_col: str = "source",
    id_col: str = "doc_id",
    **mlt_kwargs,
) -> DataFrame:
    """KNearestNeighborClassifier (reference
    ``KNearestNeighborClassifier.cs:71-127``): a MoreLikeThis query
    for the target doc, majority vote over the top-k neighbors'
    stored class (ties -> smallest class, pinned; the reference's
    dict-order tie is unspecified). Returns one row (label, votes)."""
    from lucenenet_spark.search.mlt import more_like_this

    q = more_like_this(searcher, docid=docid, **mlt_kwargs)
    top = searcher.search_df(q, k).select("docid")
    lab = docs.select(
        F.col(id_col).cast("long").alias("docid"), F.col(class_col).alias("label")
    )
    return (
        top.join(lab, "docid")
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("votes"))
        .orderBy(F.col("votes").desc(), F.col("label").asc())
        .limit(1)
    )


def confusion_matrix(
    predictions: DataFrame,
    truth: DataFrame,
    truth_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """ConfusionMatrixGenerator analog
    (``Classification/Utils/ConfusionMatrixGenerator.cs:35``): cross-tab
    of actual vs predicted class counts over a labeled evaluation set.
    Returns (actual, predicted, n) — the reference's nested
    per-class counts map, linearized; accuracy is
    ``sum(n where actual = predicted) / sum(n)``. One docid join plus
    one hash aggregate; output is |classes|^2 rows max."""
    t = truth.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(truth_col).alias("actual"),
    )
    return (
        predictions.select("doc_id", F.col("label").alias("predicted"))
        .join(t, "doc_id")
        .groupBy("actual", "predicted")
        .agg(F.count("*").cast("long").alias("n"))
    )
