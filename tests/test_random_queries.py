"""Randomized query-tree identity: seeded random boolean trees over
the corpus vocabulary must produce rank- AND float32-score-identical
top-k between the distributed engine and the pure-Python oracle — the
RandomIndexWriter + CheckHits style of the reference test framework
(SURVEY.md §5.2)."""

from __future__ import annotations

import random

import pytest

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.oracle import OracleSearcher
from lucenenet_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher

N_TREES = 12
SEED = 1234


def _vocab(corpus_rows) -> list[str]:
    seen: set[str] = set()
    for r in corpus_rows[:50]:
        seen.update(t for t, _ in analyze(r["content"]))
    return sorted(seen)


def _leaf(rng: random.Random, vocab: list[str]) -> Query:
    r = rng.random()
    if r < 0.5:
        return TermQuery(term=rng.choice(vocab), boost=rng.choice([1.0, 1.0, 2.0, 0.5]))
    if r < 0.62:
        t0, t1 = rng.choice(vocab), rng.choice(vocab)
        return PhraseQuery(phrase_terms=(t0, t1))
    if r < 0.72:
        # sloppy, sometimes with a REPEATED term (the PQ algorithm's
        # hard corner) and sometimes a 3-term phrase
        t0 = rng.choice(vocab)
        t1 = t0 if rng.random() < 0.3 else rng.choice(vocab)
        terms = (t0, t1) if rng.random() < 0.7 else (t0, t1, rng.choice(vocab))
        return PhraseQuery(phrase_terms=terms, slop=rng.choice([1, 2, 3]))
    if r < 0.8:
        t0, t1a, t1b = rng.choice(vocab), rng.choice(vocab), rng.choice(vocab)
        return MultiPhraseQuery(slots=((t0,), (t1a, t1b)))
    if r < 0.88:
        return PrefixQuery(prefix=rng.choice(vocab)[:2])
    if r < 0.94:
        return RegexpQuery(pattern=rng.choice(vocab)[:2] + ".*")
    return FuzzyQuery(term=rng.choice(vocab), max_edits=1)


def _tree(rng: random.Random, vocab: list[str], depth: int = 2) -> Query:
    if depth == 0 or rng.random() < 0.3:
        return _leaf(rng, vocab)
    kind = rng.random()
    if kind < 0.75:
        n = rng.randint(2, 4)
        clauses = []
        has_positive = False
        for _ in range(n):
            occ = rng.choice([Occur.MUST, Occur.SHOULD, Occur.SHOULD, Occur.MUST_NOT])
            if occ != Occur.MUST_NOT:
                has_positive = True
            clauses.append((_tree(rng, vocab, depth - 1), occ))
        if not has_positive:
            clauses.append((_leaf(rng, vocab), Occur.SHOULD))
        msm = rng.choice([0, 0, 0, 1, 2])
        return BooleanQuery.of(*clauses, min_should_match=msm)
    return DisjunctionMaxQuery(
        disjuncts=tuple(_tree(rng, vocab, depth - 1) for _ in range(rng.randint(2, 3))),
        tie_breaker=rng.choice([0.0, 0.1, 0.5]),
    )


@pytest.fixture(scope="module")
def random_trees(corpus_rows):
    rng = random.Random(SEED)
    vocab = _vocab(corpus_rows)
    return [_tree(rng, vocab) for _ in range(N_TREES)]


def test_random_trees_rank_and_score_identical(spark_index, oracle_index, random_trees):
    spark_s = IndexSearcher(spark_index)
    oracle_s = OracleSearcher(oracle_index)
    for i, q in enumerate(random_trees):
        got = [(h.docid, h.score) for h in spark_s.search(q, 10)]
        expect = [(d, float(s)) for d, s in oracle_s.search(q, 10)]
        assert got == expect, f"tree {i}: {q}"


def test_random_trees_counts_match(spark_index, oracle_index, random_trees):
    spark_s = IndexSearcher(spark_index)
    oracle_s = OracleSearcher(oracle_index)
    for i, q in enumerate(random_trees[:6]):
        assert spark_s.count(q) == oracle_s.count(q), f"tree {i}"
