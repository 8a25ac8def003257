"""Classification module — naive Bayes + kNN over the index/corpus."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lucenenet_spark.classification import knn_classify, naive_bayes_classify


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(12):
        rows.append((i, "py", "python spark dataframe shuffle executor python"))
    for i in range(12, 24):
        rows.append((i, "cs", "csharp dotnet linq roslyn nuget csharp msbuild"))
    rows.append((100, None, "python spark executor"))  # unlabeled
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_naive_bayes_separable_classes(corpus):
    inputs = corpus.where(F.col("doc_id").isin(0, 12, 100))
    got = {
        r["doc_id"]: r["label"]
        for r in naive_bayes_classify(corpus, inputs, class_col="source").collect()
    }
    assert got[0] == "py" and got[12] == "cs"
    assert got[100] == "py"  # unlabeled doc classified by its tokens


def test_naive_bayes_deterministic(corpus):
    inputs = corpus.where(F.col("doc_id") < 4)
    a = sorted(map(tuple, naive_bayes_classify(corpus, inputs).collect()))
    b = sorted(
        map(tuple, naive_bayes_classify(corpus, inputs.repartition(7)).collect())
    )
    assert a == b  # integer fixed-point scores: partition-invariant


def test_knn_majority_vote(spark, corpus):
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    idx = build_index(
        spark,
        corpus.where(F.col("source").isNotNull()),
        CorpusSpec(text_col="text", id_col="doc_id"),
    ).cache()
    s = IndexSearcher(idx)
    row = knn_classify(
        s, corpus, docid=0, k=5, class_col="source",
        max_query_terms=5, min_term_freq=1, min_doc_freq=1,
    ).collect()
    assert row and row[0]["label"] == "py" and row[0]["votes"] >= 3


def test_confusion_matrix_counts_and_accuracy(spark):
    from lucenenet_spark.classification import confusion_matrix

    preds = spark.createDataFrame(
        [(0, "a", 1), (1, "a", 1), (2, "b", 1), (3, "b", 1), (4, "a", 1)],
        "doc_id long, label string, score_fp long",
    )
    truth = spark.createDataFrame(
        [(0, "a"), (1, "b"), (2, "b"), (3, "b"), (4, "a"), (9, "c")],
        "doc_id long, source string",
    )
    got = {(r["actual"], r["predicted"]): r["n"] for r in
           confusion_matrix(preds, truth).collect()}
    # doc 9 has no prediction -> inner join drops it
    assert got == {("a", "a"): 2, ("b", "a"): 1, ("b", "b"): 2}
    correct = sum(n for (a, p), n in got.items() if a == p)
    assert correct / sum(got.values()) == pytest.approx(0.8)
