"""AllGroupHeadsCollector + Benchmark/Quality metrics (P@k, MRR,
NDCG) — hand-computed oracles."""

from __future__ import annotations

import math

import pytest

from lucenenet_spark.index.builder import CorpusSpec, build_index
from lucenenet_spark.search import collectors as coll
from lucenenet_spark.search.queries import TermQuery
from lucenenet_spark.search.searcher import IndexSearcher


@pytest.fixture(scope="module")
def qs(spark):
    rows = [
        ("g1", "a", "c", "spark spark spark top doc"),   # 0: rel 2
        ("g1", "b", "c", "spark spark middle doc"),      # 1: rel 1
        ("g2", "c", "c", "spark single mention"),        # 2: rel 0
        ("g2", "d", "c", "no match at all"),             # 3
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    idx = build_index(
        spark, df,
        CorpusSpec(order_cols=("repo", "path", "commit"), meta_cols=("repo",)),
    ).cache()
    return IndexSearcher(idx)


def test_all_group_heads(qs):
    got = [(r.grp, r.docid) for r in coll.all_group_heads(
        qs, TermQuery(term="spark"), "repo").collect()]
    # g1 head = doc0 (highest tf), g2 head = doc2 (only match)
    assert got == [("g1", 0), ("g2", 2)]


def test_quality_metrics_hand_computed(qs, spark):
    from lucenenet_spark.quality import freq_judgments, quality_metrics

    judg = freq_judgments(qs, {"q": "spark"}, cap=3)
    jrows = {(r.query_id, r.docid): r.rel for r in judg.collect()}
    assert jrows == {("q", 0): 2, ("q", 1): 1, ("q", 2): 0}

    out = quality_metrics(qs, {"q": TermQuery(term="spark")}, judg, 3).collect()
    assert len(out) == 1
    r = out[0]
    # ranking by BM25: doc0 (tf3), doc1 (tf2), doc2 (tf1)
    # rel>0 in top-3: docs 0,1 -> P@3 = 2/3; first rel at rank 1 -> MRR 1
    assert r.n_rel == 2
    assert r.p_at_k == pytest.approx(2 / 3)
    assert r.mrr == 1.0
    # DCG = (2^2-1)/log2(2) + (2^1-1)/log2(3) + 0
    dcg = 3.0 / 1.0 + 1.0 / math.log2(3.0)
    idcg = dcg  # ideal ordering equals actual here
    assert r.ndcg == pytest.approx(dcg / idcg)
    assert r.ndcg == 1.0
    # 2 of 2 judged-relevant docs retrieved -> recall 1
    assert r.recall == 1.0
    # AvP: relevant at ranks 1,2 -> (1/1 + 2/2) / maxGood(2) = 1
    assert r.avp == 1.0


def test_avp_recall_partial(qs, spark):
    """GetAvp with a miss: judge doc1 and the never-retrieved doc3
    relevant; retrieved ranking is doc0(rel0), doc1(rel1), doc2(rel0)
    -> AvP = (1/2) / 2, recall = 1/2."""
    from lucenenet_spark.quality import quality_metrics, quality_summary

    judg = spark.createDataFrame(
        [("q", 1, 1), ("q", 3, 2)], "query_id string, docid long, rel int"
    )
    per_q = quality_metrics(qs, {"q": TermQuery(term="spark")}, judg, 3)
    r = per_q.collect()[0]
    assert r.recall == pytest.approx(0.5)
    assert r.avp == pytest.approx((1.0 / 2.0) / 2.0)
    s = quality_summary(per_q).collect()[0]
    assert s.n_queries == 1
    assert s.map == pytest.approx(r.avp)
    assert s.mean_recall == pytest.approx(0.5)


def test_quality_metrics_no_relevant(qs):
    from lucenenet_spark.quality import quality_metrics

    judg = qs.index.docs.sparkSession.createDataFrame(
        [("q", 3, 1)], "query_id string, docid long, rel int"
    )
    r = quality_metrics(qs, {"q": TermQuery(term="spark")}, judg, 3).collect()[0]
    # doc 3 is judged relevant but never retrieved
    assert r.p_at_k == 0.0 and r.mrr == 0.0 and r.ndcg == 0.0
    assert r.recall == 0.0 and r.avp == 0.0
