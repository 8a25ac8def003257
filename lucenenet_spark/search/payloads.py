"""Payload scoring — PayloadTermQuery + payload functions (reference
``Search/Payloads/PayloadTermQuery.cs:43``, ``AveragePayloadFunction.cs``,
``MinPayloadFunction.cs``, ``MaxPayloadFunction.cs``; payload bytes are
float32 via ``PayloadHelper.EncodeSingle``).

score(doc) = spanScore(doc) * payloadFactor(doc)          (default)
           = payloadFactor(doc)                (include_span_score=False)

with spanScore = the similarity's term score (our unit-span term query
== the reference's SpanTermQuery scorer over the same stats) and
payloadFactor = avg | min | max over the doc's payloads for the term:
avg = f32(f32-ordered-sum / count) (AveragePayloadFunction.DocScore),
min/max exact.

One packed scan filtered to the query term BEFORE the unpack barrier
(same plan shape as the term scorer), payload decode + similarity math
in a single Arrow stage, native TakeOrdered top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from lucenenet_spark.functions.bm25 import float32_ordered_sum

_OUT = T.StructType(
    [
        T.StructField("docid", T.LongType()),
        T.StructField("score", T.FloatType()),
    ]
)


def _payload_factor(payloads, fn: str) -> np.float32:
    a = np.asarray(payloads, dtype=np.float32)
    if a.size == 0:
        return np.float32(1.0)
    if fn == "avg":
        return np.float32(float32_ordered_sum(a) / np.float32(a.size))
    if fn == "min":
        return np.float32(a.min())
    if fn == "max":
        return np.float32(a.max())
    raise ValueError(f"unknown payload function: {fn}")


def payload_term_query(
    searcher,
    term: str,
    k: int | None = 10,
    fn: str = "avg",
    include_span_score: bool = True,
) -> DataFrame:
    """PayloadTermQuery analog → (docid, score float32) top-k."""
    from lucenenet_spark.index.builder import unpack_postings_payloads

    m = searcher._stats_map()
    if m is False:
        rows = searcher.index.term_stats.where(F.col("term") == term).collect()
        stats = {r["term"]: (int(r["df"]), int(r["ttf"])) for r in rows}
    else:
        stats = {term: m[term]} if term in m else {}
    if term not in stats:
        return searcher.index.docs.sparkSession.createDataFrame([], _OUT)
    df_, ttf_ = stats[term]
    sim = searcher.sim
    weight = sim.weight(
        df_, searcher.index.max_doc, 1.0,
        ttf=ttf_, sttf=searcher.index.sum_total_term_freq,
    )
    src = unpack_postings_payloads(
        searcher.index.packed.where(F.col("term") == term)
    ).select("docid", "freq", "norm", "payloads")

    def gen(iterator):
        for pdf in iterator:
            f = pdf["freq"].to_numpy(dtype=np.float32)
            nb = pdf["norm"].to_numpy(dtype=np.uint8)
            base = (
                sim.score(f, nb, weight)
                if include_span_score
                else np.ones(len(pdf), dtype=np.float32)
            )
            pay = np.array(
                [_payload_factor(p, fn) for p in pdf["payloads"]],
                dtype=np.float32,
            )
            yield pd.DataFrame(
                {"docid": pdf["docid"], "score": (base * pay).astype(np.float32)}
            )

    scored = src.mapInPandas(gen, schema=_OUT)
    if searcher.tombstones is not None:
        scored = scored.join(searcher.tombstones, "docid", "left_anti")
    if k is None:
        return scored
    return scored.orderBy(F.col("score").desc(), F.col("docid").asc()).limit(k)
