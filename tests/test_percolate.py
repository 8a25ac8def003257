"""Percolation over a document stream (reference
``src/Lucene.Net.Memory/MemoryIndex.cs:78`` use case: match many
standing queries against each document). Verified against an
independent per-doc oracle built from the same analyzer output."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.percolate import percolate
from lucenenet_spark.search.queries import (
    BooleanQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    RegexpQuery,
    TermQuery,
    WildcardQuery,
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "a quick merge of the hash table into the spark engine"),
    (2, "spark streaming merges micro batches"),
    (3, "hash table lookups are quick and the table hash is stable"),
    (4, "nothing relevant here at all"),
    (5, ""),
    (6, "quick quick quick brown"),
]

STANDING = {
    "term_quick": TermQuery(term="quick"),
    "prefix_ha": PrefixQuery(prefix="ha"),
    "wild_br": WildcardQuery(pattern="br*n"),
    "regexp_sp": RegexpQuery(pattern="spark|merge[sd]?"),
    "phrase_th": PhraseQuery(phrase_terms=("table", "hash")),
    "sloppy_qb": PhraseQuery(phrase_terms=("quick", "brown"), slop=2),
    "bool_mix": BooleanQuery.of(
        (TermQuery(term="quick"), Occur.MUST),
        (TermQuery(term="merge"), Occur.MUST_NOT),
        (TermQuery(term="table"), Occur.SHOULD),
    ),
    "msm2": BooleanQuery.of(
        (TermQuery(term="spark"), Occur.SHOULD),
        (TermQuery(term="hash"), Occur.SHOULD),
        (TermQuery(term="quick"), Occur.SHOULD),
        min_should_match=2,
    ),
    "match_all": MatchAllDocsQuery(),
}


def _oracle_pairs():
    """Independent re-derivation: brute-force each (doc, query) with a
    handwritten matcher over the analyzer's own token stream."""
    out = set()
    for did, txt in ROWS:
        toks = list(analyze(txt))
        terms = {t for t, _ in toks}
        pos = {}
        for t, p in toks:
            pos.setdefault(t, []).append(p)
        # handwritten per-query truth (kept deliberately non-generic)
        if "quick" in terms:
            out.add((did, "term_quick"))
        if any(t.startswith("ha") for t in terms):
            out.add((did, "prefix_ha"))
        if any(t.startswith("br") and t.endswith("n") and len(t) >= 3 for t in terms):
            out.add((did, "wild_br"))
        if any(t == "spark" or t in ("merge", "merges", "merged") for t in terms):
            out.add((did, "regexp_sp"))
        if any(
            p + 1 in pos.get("hash", []) for p in pos.get("table", [])
        ):
            out.add((did, "phrase_th"))
        # slop<=2 "quick brown": |(pq - pb) - (0 - 1)| <= 2 with order
        # freedom per sloppy spec — delegate to presence within window
        for pq in pos.get("quick", []):
            for pb in pos.get("brown", []):
                if abs((pb - pq) - 1) <= 2:
                    out.add((did, "sloppy_qb"))
        if "quick" in terms and "merge" not in terms:
            out.add((did, "bool_mix"))
        if sum(t in terms for t in ("spark", "hash", "quick")) >= 2:
            out.add((did, "msm2"))
        out.add((did, "match_all"))
    return out


def test_percolate_matches_bruteforce_oracle(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    got = {
        (r.doc_id, r.query_id)
        for r in percolate(docs, STANDING).collect()
    }
    assert got == _oracle_pairs()


def test_percolate_is_single_map_stage(spark):
    """Scale guard: the plan must be scan -> mapInPandas -> sort; no
    joins, no index build, no aggregate."""
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    plan = percolate(docs, {"q": TermQuery(term="quick")})._jdf.queryExecution().toString()
    assert "Join" not in plan
    assert "Aggregate" not in plan


def test_percolate_empty_standing_set(spark):
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    assert percolate(docs, {}).count() == 0


def test_percolate_pure_should_needs_one(spark):
    docs = spark.createDataFrame([(0, "alpha beta")], "doc_id long, text string")
    q = BooleanQuery.of(
        (TermQuery(term="zzz"), Occur.SHOULD),
        (TermQuery(term="yyy"), Occur.SHOULD),
    )
    assert percolate(docs, {"q": q}).count() == 0
    q2 = BooleanQuery.of(
        (TermQuery(term="alpha"), Occur.SHOULD),
        (TermQuery(term="yyy"), Occur.SHOULD),
    )
    assert percolate(docs, {"q": q2}).count() == 1


def test_percolate_streaming_equals_batch(spark, tmp_path_factory):
    """The percolator is a stateless map: attached to a file-source
    readStream it must emit exactly the batch result (the reference's
    alerting/MemoryIndex deployment shape)."""
    import os

    base = str(tmp_path_factory.mktemp("perc_stream"))
    src, out = os.path.join(base, "in"), os.path.join(base, "out")
    docs = spark.createDataFrame(ROWS, "doc_id long, text string")
    docs.write.parquet(src)

    standing = {
        "term_quick": STANDING["term_quick"],
        "phrase_th": STANDING["phrase_th"],
        "bool_mix": STANDING["bool_mix"],
    }
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    # orderBy is not streamable; the match relation itself is the op
    matched = percolate(stream, standing)
    q = (
        matched.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", os.path.join(base, "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r.doc_id, r.query_id) for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.doc_id, r.query_id)
        for r in percolate(docs, standing).collect()
    }
    assert got == want and len(want) > 0
