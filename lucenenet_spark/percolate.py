"""Percolation — the MemoryIndex use case re-expressed Spark-first
(reference ``src/Lucene.Net.Memory/MemoryIndex.cs:78``: "a single-doc
index ... to match many queries against one document", the classic
percolator/alerting pattern).

The reference builds one in-RAM index per document and runs each
standing query against it. Here the document STREAM is the big side:
one Arrow-batched ``mapInPandas`` stage tokenizes each doc into a tiny
term->positions dict (the per-doc MemoryIndex) and evaluates the whole
broadcast standing-query set against it — no index build, no shuffle,
no join; output is the sparse (doc_id, query_id) match relation. At
100 TB this is a single map stage whose cost is corpus tokenization
plus queries-per-doc dictionary probes; the standing set rides the
task closure exactly like codebooks do in the ANN operators. Works
unchanged under Structured Streaming (a stateless map).

Matching semantics reuse the engine's pinned specs:
- Term / Prefix / Wildcard / Regexp probe the per-doc dictionary
  (wildcard/regexp via the SAME compiled patterns queries.py uses);
- BooleanQuery honors MUST / SHOULD / MUST_NOT and
  minimumNumberShouldMatch (``BooleanQuery.cs`` semantics);
- PhraseQuery slop=0 requires consecutive positions (with
  ``term_positions`` gaps honored); slop>0 matches iff the engine's
  ``sloppy_phrase_freq`` (functions/sloppy.py) is positive — the same
  function the scorer uses, so percolation agrees with search.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.functions.sloppy import sloppy_phrase_freq
from lucenenet_spark.search.queries import (
    BooleanQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    WildcardQuery,
)


def _matches(q: Query, tp: dict[str, list[int]]) -> bool:
    """Evaluate one query against one doc's term->positions dict."""
    if isinstance(q, TermQuery):
        return q.term in tp
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in tp)
    if isinstance(q, (WildcardQuery, RegexpQuery)):
        return any(q.python_predicate(t) for t in tp)
    if isinstance(q, MatchAllDocsQuery):
        return True
    if isinstance(q, PhraseQuery):
        terms = list(q.phrase_terms)
        if any(t not in tp for t in terms):
            return False
        offs = list(q.term_positions) if q.term_positions else list(range(len(terms)))
        pos = [np.asarray(tp[t], dtype=np.int64) for t in terms]
        if q.slop == 0:
            base = set((pos[0] - offs[0]).tolist())
            for p, o in zip(pos[1:], offs[1:]):
                base &= set((p - o).tolist())
                if not base:
                    return False
            return True
        return bool(
            sloppy_phrase_freq(pos, q.slop, offsets=offs, term_keys=terms) > 0
        )
    if isinstance(q, BooleanQuery):
        n_should = 0
        has_should = False
        for c in q.clauses:
            hit = _matches(c.query, tp)
            if c.occur == Occur.MUST and not hit:
                return False
            if c.occur == Occur.MUST_NOT and hit:
                return False
            if c.occur == Occur.SHOULD:
                has_should = True
                n_should += int(hit)
        need = q.minimum_number_should_match
        if has_should:
            # pure-SHOULD queries need >=1 match even when msm == 0
            has_must = any(c.occur == Occur.MUST for c in q.clauses)
            floor = need if need > 0 else (0 if has_must else 1)
            return n_should >= floor
        return True
    raise NotImplementedError(type(q).__name__)


def percolate(
    docs: DataFrame,
    queries: dict[str, Query],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Match every doc against every standing query; returns the
    sparse (doc_id, query_id) relation, sorted. One map stage."""
    items = sorted(queries.items())

    def run(iterator):
        for pdf in iterator:
            out_d, out_q = [], []
            for did, txt in zip(pdf[id_col], pdf[text_col]):
                tp: dict[str, list[int]] = {}
                for t, p in analyze(txt or ""):
                    tp.setdefault(t, []).append(p)
                for name, q in items:
                    if _matches(q, tp):
                        out_d.append(did)
                        out_q.append(name)
            yield pd.DataFrame(
                {"doc_id": pd.array(out_d, dtype="int64"), "query_id": out_q}
            )

    out = docs.select(id_col, text_col).mapInPandas(
        run, schema="doc_id long, query_id string"
    )
    if docs.isStreaming:
        # global sort is not streamable (and meaningless mid-stream);
        # the unordered match relation IS the operator's output
        return out
    return out.orderBy("doc_id", "query_id")
