"""Infix-substring search over an n-gram index — the NGramTokenFilter
deployment idiom (``Analysis/NGram/NGramTokenFilter.cs:53``; the same
role ElasticSearch's ``ngram`` field plays for ``*lit*`` wildcards).

A plain infix wildcard must regex-scan the ENTIRE term dictionary —
no sort order prunes ``*lit*`` — and at a 10^9-term dictionary that is
the query's whole cost. With a ``CorpusSpec(ngram=(lo, hi))`` companion
index the literal becomes exact term lookups:

- ``lo <= len(literal) <= hi``: the literal IS an index term — ONE
  pruned packed-block read.
- ``len(literal) > hi``: every length-``hi`` gram of the literal must
  occur in a matching doc, so candidates = AND over the literal's
  distinct max-grams (each a pruned block read, one shared scan), then
  an exact ``contains`` verify against the stored text of ONLY the
  candidate docs. Gram conjunction is necessary-not-sufficient (grams
  may match at scattered offsets); the verify restores exactness and
  touches candidates only — the classic candidate-generate + verify
  shape, same as the MinHash→Jaccard pipeline in ops/dedup.py.

Both shapes are rank-free set queries (the reference's
ConstantScoreQuery rewrite for wildcards).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucenenet_spark.search.queries import (
    BooleanQuery,
    Occur,
    TermQuery,
)


def substring_grams(literal: str, min_gram: int, max_gram: int) -> list[str]:
    """The distinct index terms that certify a candidate: the literal
    itself when it fits the gram range, else its distinct max-grams."""
    if len(literal) < min_gram:
        raise ValueError(
            f"literal shorter than min_gram={min_gram}: a {len(literal)}-char "
            "substring is not indexed; use a smaller min_gram at build time"
        )
    if len(literal) <= max_gram:
        return [literal]
    seen: dict[str, None] = {}
    for s in range(0, len(literal) - max_gram + 1):
        seen.setdefault(literal[s : s + max_gram])
    return list(seen)


def substring_docs(
    searcher,
    source_docs: DataFrame,
    literal: str,
    min_gram: int,
    max_gram: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """docids whose text contains ``literal`` (case-folded), via the
    n-gram index of ``searcher`` built with ``CorpusSpec(ngram=(lo,hi))``.

    The index prunes: candidate docids come from one packed scan with
    ``term IN (grams)`` pushdown; the ``contains`` verify then reads
    ONLY the candidate rows of the source table (broadcast semi-join
    when the candidate set is small). The source table is never
    full-scanned for the text check at any corpus size.

    Exactness bound: the literal must be lowercase and consist of
    characters the tokenizer keeps inside one token (``\\w`` and the
    dotted-numeric dot) — an occurrence then lies within a single
    maximal token, so all its grams are indexed and recall is total.
    """
    lit = literal.lower()
    grams = substring_grams(lit, min_gram, max_gram)
    if len(grams) == 1:
        cand = searcher.matching_docids(TermQuery(term=grams[0]))
    else:
        cand = searcher.matching_docids(
            BooleanQuery.of(*[(TermQuery(term=g), Occur.MUST) for g in grams])
        )
    # broadcast: the gram conjunction is selective by construction
    # (every max-gram must co-occur); for a pathological literal made
    # of stop-gram text, drop the hint and AQE picks a shuffle join
    verified = source_docs.join(
        F.broadcast(cand.select(F.col("docid").alias(id_col))), id_col
    )
    return verified.where(
        F.contains(F.lower(F.col(text_col)), F.lit(lit))
    ).select(F.col(id_col).cast("long").alias("docid"))
