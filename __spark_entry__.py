"""Driver contract: entry / queries / oracle_sql for the
lucenenet_spark engine (PySpark-native inverted index + BM25).

Every entry pairs a Spark DataFrame pipeline with a DuckDB SQL oracle
from :mod:`lucenenet_spark.oracle_sql` whose float32 arithmetic is
bit-exact against the engine (verified: scores hash-match, not just
ranks). Corpus = the ``documents`` table (doc_id, text, lang, source,
n_chars); docid ≡ doc_id.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# The engine's Arrow UDF closures import lucenenet_spark inside Python
# workers; the worker daemon inherits the DRIVER process env, so pin
# PYTHONPATH before any session spawns workers (harmless if the caller
# already did). Same for the BLAS pools (see session.py).
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = os.pathsep.join(p for p in (_REPO, _pp) if p)
for _var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS"):
    os.environ.setdefault(_var, "1")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lucenenet_spark import oracle_sql as osql
from lucenenet_spark.ops import dedup as dd
from lucenenet_spark.ops import multimodal as mm
from lucenenet_spark.ops import oracle_sql as oosql
from lucenenet_spark.ops import similarity as sim
from lucenenet_spark.ops import text as tx
from lucenenet_spark.index.builder import CorpusSpec, InvertedIndex, build_index
from lucenenet_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search import collectors as coll
from lucenenet_spark.search.searcher import IndexSearcher

_SPEC = CorpusSpec(text_col="text", id_col="doc_id", meta_cols=("lang", "source"))
_CACHE: dict[tuple[str, str], tuple[InvertedIndex, IndexSearcher]] = {}


def _searcher(spark: SparkSession, sf_dir: str) -> tuple[InvertedIndex, IndexSearcher]:
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CACHE:
        corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        idx = build_index(spark, corpus, _SPEC).cache()
        _CACHE[key] = (idx, IndexSearcher(idx))
    return _CACHE[key]


def _ranked(df: DataFrame) -> DataFrame:
    """(docid, score:float32) top-k -> (rank, docid, score:double).

    The window runs over the already-limited k rows; float32 scores are
    widened to double (exact) so both sides hash identically.
    """
    w = Window.orderBy(F.col("score").desc(), F.col("docid").asc())
    return df.select(
        F.row_number().over(w).cast("long").alias("rank"),
        F.col("docid"),
        F.col("score").cast("double").alias("score"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: boolean MUST(merge) MUST(sort) BM25 top-10 at sf0.001."""
    _, s = _searcher(spark, "/root/testdata/sf0.001")
    q = BooleanQuery.of((TermQuery(term="merge"), Occur.MUST), (TermQuery(term="sort"), Occur.MUST))
    return _ranked(s.search_df(q, 10))


# ---------------------------------------------------------------- index side

def _q_tokenize(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    return idx.postings.select("docid", "term", F.col("freq").cast("long").alias("freq"))


def _q_positions(spark, sf_dir):
    from lucenenet_spark.index.builder import unpack_postings

    idx, _ = _searcher(spark, sf_dir)
    # filter the PACKED table, then unpack: a term filter above the
    # unpack barrier would decode the whole index
    return (
        unpack_postings(idx.packed.where(F.col("term") == "dup"))
        .select("docid", "term", F.explode("positions").alias("pos"))
        .withColumn("pos", F.col("pos").cast("long"))
    )


def _q_term_stats(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    return idx.term_stats.select("term", F.col("df").cast("long"), F.col("ttf").cast("long"))


def _q_doc_norms(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    return idx.docs.select(
        "docid",
        F.col("field_length").cast("long").alias("field_length"),
        F.col("norm").cast("long").alias("norm"),
    )


def _q_corpus_stats(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    return spark.createDataFrame(
        [(idx.max_doc, idx.sum_total_term_freq, idx.term_stats.count())],
        "max_doc long, sum_total_term_freq long, n_terms long",
    )


# --------------------------------------------------------------- search side

def _q_term(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_term_rare(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(TermQuery(term="dup"), 10))


def _q_bool_and(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of((TermQuery(term="merge"), Occur.MUST), (TermQuery(term="sort"), Occur.MUST))
    return _ranked(s.search_df(q, 10))


def _q_bool_or(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of((TermQuery(term="hash"), Occur.SHOULD), (TermQuery(term="dup"), Occur.SHOULD))
    return _ranked(s.search_df(q, 10))


def _q_bool_not(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="table"), Occur.MUST), (TermQuery(term="window"), Occur.MUST_NOT)
    )
    return _ranked(s.search_df(q, 10))


def _q_min_should_match(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="hash"), Occur.SHOULD),
        (TermQuery(term="merge"), Occur.SHOULD),
        (TermQuery(term="scan"), Occur.SHOULD),
        min_should_match=2,
    )
    return _ranked(s.search_df(q, 10))


def _q_dismax(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = DisjunctionMaxQuery(
        disjuncts=(TermQuery(term="spark"), TermQuery(term="stream")), tie_breaker=0.5
    )
    return _ranked(s.search_df(q, 10))


def _q_phrase(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(PhraseQuery(phrase_terms=("table", "hash")), 10))


def _q_prefix_docs(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    df = s.search_df(PrefixQuery(prefix="s"), k=None)
    return df.select("docid", F.col("score").cast("double").alias("score"))


def _q_span_near_ordered(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.span_near(s, "table", "hash", slop=3, in_order=True)


def _q_span_near3(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanNearQuery(
        (sp.SpanTermQuery("table"), sp.SpanTermQuery("hash"), sp.SpanTermQuery("scan")),
        slop=12,
        in_order=True,
    )
    return sp.span_query(s, q)


def _q_span_first(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    return sp.span_query(s, sp.SpanFirstQuery(sp.SpanTermQuery("table"), end=15))


def _q_span_not(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanNotQuery(
        sp.SpanNearQuery(
            (sp.SpanTermQuery("table"), sp.SpanTermQuery("hash")), slop=6, in_order=True
        ),
        sp.SpanTermQuery("scan"),
    )
    return sp.span_query(s, q)


def _q_span_near3_unordered(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanNearQuery(
        (sp.SpanTermQuery("table"), sp.SpanTermQuery("hash"), sp.SpanTermQuery("scan")),
        slop=10,
        in_order=False,
    )
    return sp.span_query(s, q)


def _q_span_near_scored(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanNearQuery(
        (sp.SpanTermQuery("table"), sp.SpanTermQuery("hash")), slop=4, in_order=True
    )
    return _ranked(sp.span_query_scored(s, q, 10))


def _q_span_or_near(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanNearQuery(
        (
            sp.SpanOrQuery((sp.SpanTermQuery("table"), sp.SpanTermQuery("merge"))),
            sp.SpanTermQuery("hash"),
        ),
        slop=8,
        in_order=True,
    )
    return sp.span_query(s, q)


def _q_span_near_unordered(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.span_near(s, "table", "hash", slop=3, in_order=False)


def _q_sloppy_phrase(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = PhraseQuery(phrase_terms=("table", "hash"), slop=2)
    return s.scored_docs(q).select("docid")


def _q_multi_phrase(spark, sf_dir):
    from lucenenet_spark.search.queries import MultiPhraseQuery

    _, s = _searcher(spark, sf_dir)
    q = MultiPhraseQuery(slots=(("table",), ("hash", "scan")))
    return _ranked(s.search_df(q, 10))


def _q_regexp_terms(spark, sf_dir):
    from lucenenet_spark.search.queries import RegexpQuery

    idx, _ = _searcher(spark, sf_dir)
    q = RegexpQuery(pattern="s.+a.*")
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_match_all(spark, sf_dir):
    from lucenenet_spark.search.queries import MatchAllDocsQuery

    _, s = _searcher(spark, sf_dir)
    return s.search_df(MatchAllDocsQuery(), k=None).select(
        "docid", F.col("score").cast("double").alias("score")
    )


def _q_field_value_filter(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(coll.field_value_filter(s, TermQuery(term="spark"), "source", 10))


def _q_wildcard_terms(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    q = WildcardQuery(pattern="s*a*")
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_fuzzy_terms(spark, sf_dir):
    """Plain-Levenshtein dialect (transpositions=False — the
    FuzzyQuery.cs:45 ctor parameter); fuzzy_terms_osa exercises the
    reference default."""
    idx, _ = _searcher(spark, sf_dir)
    q = FuzzyQuery(term="scann", max_edits=2, transpositions=False)
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_term_range(spark, sf_dir):
    idx, _ = _searcher(spark, sf_dir)
    q = TermRangeQuery(lower="p", upper="t", include_upper=False)
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_sha_verify(spark, sf_dir):
    from lucenenet_spark.index.builder import verify_content_sha

    idx, _ = _searcher(spark, sf_dir)
    n_docs, n_mismatch = verify_content_sha(_docs(spark, sf_dir), idx, _SPEC)
    return spark.createDataFrame([(n_docs, n_mismatch)], "n_docs long, n_mismatch long")


def _q_facet(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.facet_counts(s, TermQuery(term="spark"), "lang")


def _q_filtered(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(coll.filtered_topk(s, TermQuery(term="spark"), F.col("lang") == "en", 10))


def _q_numeric_range(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(
        coll.filtered_topk(
            s, TermQuery(term="spark"), F.col("field_length").between(20, 30), 10
        )
    )


def _q_sort_by_field(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.sort_topk(
        s,
        TermQuery(term="spark"),
        [coll.SortField("field_length"), coll.SortField(coll.SortField.SCORE)],
        10,
    )


def _q_sort_by_meta_desc(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.sort_topk(
        s,
        TermQuery(term="spark"),
        [coll.SortField("lang", reverse=True), coll.SortField(coll.SortField.SCORE)],
        10,
    )


def _q_expression_topk(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    # sqrt/+/*// are IEEE correctly-rounded in BOTH engines; ln is
    # last-ulp engine-dependent (JVM StrictMath vs libm), so the
    # oracle-checked expression sticks to exactly-rounded ops
    return coll.expression_topk(
        s, TermQuery(term="spark"), "score * sqrt(field_length) + 0.25 * field_length", 10
    )


def _q_facet_taxonomy(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.facet_taxonomy(s, TermQuery(term="spark"), ["lang", "source"])


def _q_block_join(spark, sf_dir):
    from lucenenet_spark.search.join import to_parent_join

    _, s = _searcher(spark, sf_dir)
    parent = F.col("docid") - F.pmod(F.col("docid"), 10)
    return _ranked(to_parent_join(s, TermQuery(term="hash"), parent, "avg", 10))


def _q_block_join_children(spark, sf_dir):
    from lucenenet_spark.search.join import to_child_join

    _, s = _searcher(spark, sf_dir)
    parent = F.col("docid") - F.pmod(F.col("docid"), 10)
    return _ranked(to_child_join(s, TermQuery(term="hash"), parent, 10))


def _q_join_query_max(spark, sf_dir):
    from lucenenet_spark.search.join import join_query

    _, s = _searcher(spark, sf_dir)
    return _ranked(join_query(s, TermQuery(term="dup"), "source", "source", "max", 10))


def _q_join_query_total(spark, sf_dir):
    from lucenenet_spark.search.join import join_query

    _, s = _searcher(spark, sf_dir)
    return _ranked(join_query(s, TermQuery(term="dup"), "source", "source", "total", 10))


def _q_sort_rescore(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.sort_rescore(
        s, TermQuery(term="spark"), [coll.SortField("field_length")], 50, 10
    )


def _q_term_vector(spark, sf_dir):
    from lucenenet_spark.search.mlt import term_vector

    idx, _ = _searcher(spark, sf_dir)
    return term_vector(IndexSearcher(idx), 0)


def _q_classic_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import ClassicSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx, similarity=ClassicSimilarity())
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_lm_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import LMDirichletSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx, similarity=LMDirichletSimilarity())
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_dfr_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import DFRInL2Similarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(idx, similarity=DFRInL2Similarity(s._avgdl))
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_dfr_pl2_term(spark, sf_dir):
    """DFR Poisson basic model (BasicModelP.cs:46) x AfterEffectL x
    NormalizationH2 — nonlinear: lambda packed into the weight slot."""
    from lucenenet_spark.functions.similarity import DFRSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(
        idx,
        similarity=DFRSimilarity(
            s._avgdl, basic_model="p", after_effect="l", normalization="h2"
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_dfr_dlz_term(spark, sf_dir):
    """DFR divergence-approximation basic model (BasicModelD.cs:33)
    x AfterEffectL x NormalizationZ (NormalizationZ.cs:47, z=0.30) —
    packs ttf; the collection N rides on the similarity instance."""
    from lucenenet_spark.functions.similarity import DFRSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(
        idx,
        similarity=DFRSimilarity(
            s._avgdl, basic_model="d", after_effect="l", normalization="z",
            n_docs=idx.max_doc,
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_dfr_bel1_term(spark, sf_dir):
    """DFR Bose-Einstein basic model (BasicModelBE.cs:36) x
    AfterEffectL x NormalizationH1."""
    from lucenenet_spark.functions.similarity import DFRSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(
        idx,
        similarity=DFRSimilarity(
            s._avgdl, basic_model="be", after_effect="l",
            normalization="h1", n_docs=idx.max_doc,
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _spatial_pts(spark, sf_dir):
    from lucenenet_spark.spatial import synthetic_points

    return synthetic_points(_docs(spark, sf_dir))


def _q_spatial_bbox(spark, sf_dir):
    from lucenenet_spark.spatial import bbox_query

    return bbox_query(_spatial_pts(spark, sf_dir), -30.0, 30.0, -60.0, 60.0)


def _q_spatial_distance_topk(spark, sf_dir):
    from lucenenet_spark.spatial import distance_topk

    return distance_topk(_spatial_pts(spark, sf_dir), 48.85, 2.35, k=10)


def _q_spatial_distance_join(spark, sf_dir):
    from lucenenet_spark.spatial import distance_join

    return distance_join(_spatial_pts(spark, sf_dir), radius_km=500.0)


_POLY_WKT = (
    "POLYGON ((-60.00005 -30.00005, 60.00005 -40.00005, 70.00005 20.00005, "
    "0.00005 55.00005, -65.00005 25.00005, -60.00005 -30.00005), "
    "(-20.00005 -10.00005, 20.00005 -10.00005, 20.00005 15.00005, "
    "-20.00005 15.00005, -20.00005 -10.00005))"
)


def _q_spatial_polygon(spark, sf_dir):
    """WKT polygon (pentagon with a rectangular hole) containment —
    RecursivePrefixTreeStrategy.cs:46 shape support; vertices sit off
    the synthetic points' 1e-4 lattice so the even-odd boundary rule
    is never exercised."""
    from lucenenet_spark.spatial import polygon_contains_query

    return polygon_contains_query(_spatial_pts(spark, sf_dir), _POLY_WKT)


def _q_percolate(spark, sf_dir):
    from lucenenet_spark.percolate import percolate

    standing = {
        "spark_term": TermQuery(term="spark"),
        "spark_not_merge": BooleanQuery.of(
            (TermQuery(term="spark"), Occur.MUST),
            (TermQuery(term="merge"), Occur.MUST_NOT),
        ),
        "table_hash_phrase": PhraseQuery(phrase_terms=("table", "hash")),
        "par_prefix": PrefixQuery(prefix="par"),
    }
    return percolate(_docs(spark, sf_dir), standing)


_SYN_MAP = (("merge", ("join",)),)


def _q_synonym_index_term(spark, sf_dir):
    """Index-time SynonymFilter: merge->join injected at index build;
    TermQuery('join') then also hits every 'merge' doc, with df/tf
    from the augmented postings and base-token norms."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        synonyms=_SYN_MAP,
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="join"), 10))


def _q_synonym_expand_or(spark, sf_dir):
    """Query-time synonym expansion: TermQuery('merge') rewrites to
    SHOULD(merge, join) — identical plan/scores to boolean_or."""
    from lucenenet_spark.analysis.synonyms import expand_query

    _, s = _searcher(spark, sf_dir)
    q = expand_query(TermQuery(term="merge"), dict(_SYN_MAP))
    return _ranked(s.search_df(q, 10))


def _q_synonym_expand_phrase(spark, sf_dir):
    """Query-time expansion inside a phrase: slot alternatives via
    MultiPhraseQuery (the analyzer-graph phrase)."""
    from lucenenet_spark.analysis.synonyms import expand_query

    _, s = _searcher(spark, sf_dir)
    q = expand_query(
        PhraseQuery(phrase_terms=("fast", "merge")), dict(_SYN_MAP)
    )
    return _ranked(s.search_df(q, 10))


def _q_shingle_term(spark, sf_dir):
    """ShingleFilter index: bigram 'table hash' is a single index term
    — a phrase query served by one pruned term lookup (no positions
    join), the phrase-at-scale fast path."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        shingle_size=2,
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="table hash"), 10))


_CODE_CACHE: dict[tuple[str, str], IndexSearcher] = {}


def _code_searcher(spark, sf_dir) -> IndexSearcher:
    """Searcher over the code-analyzed index (WordDelimiterFilter role,
    the north-star 'code-aware splitting' axis). Corpus = deterministic
    synthetic source-code identifiers derived from doc_id by the
    dialect-portable SQL in sources/synthetic.py; ``CorpusSpec(code=
    True)`` applies the pinned WDF boundary chain JVM-side
    (regexp_replace inside whole-stage codegen — zero Python cost), so
    ``getUsrRec_42`` indexes as get/usr/rec/42 at consecutive
    positions."""
    from lucenenet_spark.sources.synthetic import code_text_expr

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(code_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", code=True)
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    return _CODE_CACHE[key]


def _uax29_searcher(spark, sf_dir) -> IndexSearcher:
    """Searcher over the full-UAX#29 index (CorpusSpec(uax29=True),
    StandardTokenizerImpl.cs Mid*-class parity). Corpus = deterministic
    Mid*-token text derived from doc_id by dialect-portable SQL
    (sources/synthetic.py::mid_text_expr), so 'mrg:srt', '4,600'-class
    numbers, and '1.2.3' versions index as WHOLE terms."""
    from lucenenet_spark.sources.synthetic import mid_text_expr

    key = ("uax29", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(mid_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", uax29=True)
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    return _CODE_CACHE[key]


def _q_uax29_term_query(spark, sf_dir):
    """BM25 TermQuery for 'mrg:srt' — a term that EXISTS only because
    the UAX#29 MidLetter rule kept the colon pair whole (the pinned
    default tokenizer splits it into 'mrg', 'srt')."""
    s = _uax29_searcher(spark, sf_dir)
    return _ranked(s.search_df(TermQuery(term="mrg:srt"), 10))


def _q_uax29_mid_terms(spark, sf_dir):
    """Dictionary slice of the UAX#29 index: every term kept whole
    across a MidLetter/MidNum joiner (':' or ','), with df/ttf —
    the \"A:B\" / \"4,600\" classes of TestStandardAnalyzer.cs TestMid."""
    s = _uax29_searcher(spark, sf_dir)
    return s.index.term_stats.where(F.col("term").rlike("[:,]")).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_ja_term_query(spark, sf_dir):
    """Kuromoji-role BM25 TermQuery: '検索' over a CorpusSpec(ja=True)
    index (analysis/japanese.py min-cost lattice segmentation) on the
    deterministic JA_TEMPLATES corpus. Multi-character dictionary
    words index WHOLE (検索/形態素/データ...), unlike the CJK bigram
    analyzer — the JapaneseTokenizer.cs role."""
    from lucenenet_spark.sources.synthetic import ja_text_expr

    key = ("ja", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(ja_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", ja=True)
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(TermQuery(term="検索"), 10))


def _q_ja_phrase_query(spark, sf_dir):
    """PhraseQuery('形態素 解析') over the ja index: the two dictionary
    words sit at adjacent positions ONLY because the lattice segmented
    them out of the unbroken run 形態素解析を… — verifies the
    positional payload of the CorpusSpec(ja=True) build path."""
    from lucenenet_spark.sources.synthetic import ja_text_expr

    key = ("ja", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(ja_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", ja=True)
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(PhraseQuery(phrase_terms=("形態素", "解析")), 10))


def _q_fuzzy_osa_topk(spark, sf_dir):
    """Scored FuzzyQuery end-to-end with the reference-default
    transpositions=true: every OSA<=2 dictionary variant of 'scann'
    becomes a SHOULD clause boosted by 1 - dist/min(len)
    (FuzzyTermsEnum), float32-folded in term-asc emit order."""
    _, s = _searcher(spark, sf_dir)
    q = FuzzyQuery(term="scann", max_edits=2, transpositions=True)
    return _ranked(s.search_df(q, 10))


def _q_zh_term_query(spark, sf_dir):
    """SmartCn-role BM25 TermQuery: '检索' over a CorpusSpec(zh=True)
    index (analysis/chinese.py min-cost word-DAG segmentation,
    HHMMSegmenter.cs role) on the deterministic ZH_TEMPLATES corpus."""
    from lucenenet_spark.sources.synthetic import zh_text_expr

    key = ("zh", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(zh_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", zh=True)
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(TermQuery(term="检索"), 10))


def _q_limit_tokens_term(spark, sf_dir):
    """LimitTokenCountFilter role: index only the first 64 emitted
    tokens per doc; scores reflect both the truncated tf AND the
    truncated norms."""
    key = ("limit64", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        idx = build_index(
            spark, corpus,
            CorpusSpec(text_col="text", id_col="doc_id", max_tokens=64),
        ).cache()
        _CODE_CACHE[key] = IndexSearcher(idx)
    return _ranked(_CODE_CACHE[key].search_df(TermQuery(term="table"), 10))


def _q_length_filter_term(spark, sf_dir):
    """LengthFilter role: index only tokens of length 4-8 (position
    gaps preserved); norms count the kept tokens."""
    key = ("len48", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        idx = build_index(
            spark, corpus,
            CorpusSpec(text_col="text", id_col="doc_id", token_length=(4, 8)),
        ).cache()
        _CODE_CACHE[key] = IndexSearcher(idx)
    return _ranked(_CODE_CACHE[key].search_df(TermQuery(term="table"), 10))


def _q_code_term(spark, sf_dir):
    """TermQuery('usr') hits docs only via sub-word splits — 'usr'
    never appears as a standalone word in the raw identifiers."""
    return _ranked(_code_searcher(spark, sf_dir).search_df(TermQuery(term="usr"), 10))


def _q_code_phrase(spark, sf_dir):
    """Phrase over adjacent sub-words of one identifier (camelCase /
    snake_case splits put parts at consecutive positions)."""
    s = _code_searcher(spark, sf_dir)
    return _ranked(s.search_df(PhraseQuery(phrase_terms=("get", "set")), 10))


_REV_CACHE: dict[tuple[str, str], IndexSearcher] = {}


def _rev_searcher(spark, sf_dir) -> IndexSearcher:
    """Searcher over the ReverseStringFilter companion index
    (CorpusSpec(reverse=True)): every token stored reversed, so a
    leading wildcard becomes a sorted-dictionary prefix lookup."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _REV_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        spec = CorpusSpec(
            text_col="text", id_col="doc_id", meta_cols=(), reverse=True
        )
        _REV_CACHE[key] = IndexSearcher(build_index(spark, docs, spec).cache())
    return _REV_CACHE[key]


def _q_leading_wildcard(spark, sf_dir):
    """ConstantScore(*ark) via the reversed index: PrefixQuery('kra')
    over reversed terms == WildcardQuery('*ark') over the base index,
    without the full-dictionary regex scan."""
    from lucenenet_spark.search.queries import leading_wildcard_query

    s = _rev_searcher(spark, sf_dir)
    df = s.search_df(leading_wildcard_query("*ark"), k=None)
    return df.select("docid", F.col("score").cast("double").alias("score"))


def _q_word_breaks(spark, sf_dir):
    """WordBreakSpellChecker.SuggestWordBreaks over a word batch —
    one broadcast join against the distributed dictionary."""
    from lucenenet_spark.search import spell

    _, s = _searcher(spark, sf_dir)
    return spell.suggest_word_breaks(
        s,
        ["tablescan", "sparkmergesort", "keyvalue", "nosuchword"],
        max_changes=2,
        min_break_length=2,
    )


def _q_word_combinations(spark, sf_dir):
    """WordBreakSpellChecker.SuggestWordCombinations: adjacent query
    terms re-joined into dictionary words."""
    from lucenenet_spark.search import spell

    _, s = _searcher(spark, sf_dir)
    return spell.suggest_word_combinations(
        s, ("win", "dow", "cust", "omer", "big"), max_changes=2
    )


def _q_time_limited(spark, sf_dir):
    """TimeLimitingCollector analog: deterministic work budget (docid
    prefix) instead of a wall clock; budget prunes the parquet scan,
    results flagged partial."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    return coll.time_limited_topk(s, TermQuery(term="table"), doc_budget=300, k=10)


def _q_phrase_snippets(spark, sf_dir):
    """FastVectorHighlighter role: char spans of WHOLE-phrase
    occurrences (not per-term windows) in the phrase query's top-k
    docs, offsets re-analyzed from stored text."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    return coll.phrase_snippets(
        s, ["table", "hash"], _docs(spark, sf_dir), k=10
    )


def _q_pk_split_search(spark, sf_dir):
    """PKIndexSplitter: one shared index masked into (lang=='en',
    rest) parts via the tombstone surface — fake-delete semantics, so
    per-part scores are bit-identical to the unsplit index."""
    from lucenenet_spark.index.splitter import pk_split

    idx, _ = _searcher(spark, sf_dir)
    passing, failing = pk_split(idx, F.col("lang") == "en")
    q = TermQuery(term="table")
    parts = []
    for name, s in (("pass", passing), ("fail", failing)):
        parts.append(
            _ranked(s.search_df(q, 10)).withColumn("part", F.lit(name))
        )
    return parts[0].unionByName(parts[1]).select("part", "rank", "docid", "score")


def _q_dsir_resample(spark, sf_dir):
    """Gumbel-top-k resampling over DSIR weights: softmax-proportional
    sample without replacement, noise a pure function of (seed, id) —
    deterministic across cluster sizes and engines."""
    from lucenenet_spark.ops.sampling import dsir_weights, gumbel_topk_sample

    w = dsir_weights(_docs(spark, sf_dir), F.col("lang") == "en")
    return gumbel_topk_sample(w, n=50)


def _q_exact_substr_spans(spark, sf_dir):
    """ExactSubstr dedup spans (Lee et al. 2022): 8-token windows
    occurring >1 time anywhere in the corpus, merged per doc into
    maximal token-index spans — one window-hash aggregate, no
    all-pairs, no global sort."""
    from lucenenet_spark.ops.text import exact_substr_spans

    return exact_substr_spans(_docs(spark, sf_dir), k=8)


def _q_dsir_weights(spark, sf_dir):
    """DSIR importance weights: hashed uni+bigram features, fixed-
    point log-ratio of target (lang='en') vs source distributions —
    integer sums, partition-invariant."""
    from lucenenet_spark.ops.sampling import dsir_weights

    return dsir_weights(_docs(spark, sf_dir), F.col("lang") == "en")


def _q_hybrid_rrf(spark, sf_dir):
    """Hybrid lexical+vector retrieval: BM25 top-50 fused with cosine
    top-50 by reciprocal rank (1/(60+rank) each, lexical-first double
    sum) — the no-score-normalization fusion a RAG/serving tier runs."""
    from lucenenet_spark.ops.hybrid import hybrid_rrf

    _, s = _searcher(spark, sf_dir)
    return hybrid_rrf(s, _emb(spark, sf_dir), TermQuery(term="table"), [1.0] * 64)


def _q_grouped_topk_expr(spark, sf_dir):
    """GroupingSearch.ByFunction: two-pass grouping keyed by a
    computed ValueSource (floor(field_length/16)) instead of a stored
    column — the function key rides the same docs join."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    out = coll.grouped_topk(
        s,
        TermQuery(term="hash"),
        F.floor(F.col("field_length") / F.lit(16.0)).cast("long"),
        k_groups=10,
        k_per_group=3,
    )
    return out.withColumn("grp", F.col("grp").cast("long"))


def _q_scale_function(spark, sf_dir):
    """scale(field_length, 0, 1) value source folded into a BM25
    subquery — two-pass min/max normalization as one broadcast
    aggregate (ScaleFloatFunction.cs:116,148)."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    return _ranked(
        coll.scale_function_topk(s, TermQuery(term="table"), "field_length", 0.0, 1.0, 10)
    )


def _q_custom_score(spark, sf_dir):
    """CustomScoreQuery default provider: BM25 subquery × two value
    sources (sqrt(field_length), 1+(docid%7)/8), f32 fold in clause
    order (CustomScoreProvider.cs:70)."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    out = coll.custom_score_topk(
        s,
        TermQuery(term="table"),
        [
            F.sqrt(F.col("field_length")),
            F.lit(1.0) + (F.col("docid") % 7) / F.lit(8.0),
        ],
        k=10,
    )
    return _ranked(out)


def _q_chained_filter_xor(spark, sf_dir):
    """ChainedFilter fold [lang=='en' AND, term('table') XOR,
    source=='src1' ANDNOT] — the XOR step is the set-algebra op the
    boolean query surface doesn't cover (ChainedFilter.cs:120)."""
    from lucenenet_spark.search import collectors as coll

    _, s = _searcher(spark, sf_dir)
    out = coll.chained_filter(
        s,
        [F.col("lang") == "en", TermQuery(term="table"), F.col("source") == "src1"],
        ["and", "xor", "andnot"],
    )
    return out.select(F.col("docid").cast("long").alias("docid"))


def _q_direct_spell(spark, sf_dir):
    """DirectSpellChecker.SuggestSimilar over a misspelled-word batch:
    prefix/length-banded broadcast join against ONE dictionary scan,
    score-desc/df-desc ranking, two-pass ed1/ed2 rule at count level
    (DirectSpellChecker.cs:322). This entry exercises the selectable
    plain-Levenshtein distance (the reference's LevensteinDistance.cs
    via the Distance property); direct_spell_osa exercises the
    reference-default internal OSA distance."""
    from lucenenet_spark.search import spell

    _, s = _searcher(spark, sf_dir)
    return spell.direct_spell_suggest(
        s,
        ["tabel", "windoe", "strem", "batk", "table", "xyzq"],
        num_sug=5,
        distance="levenshtein",
    )


def _q_direct_spell_osa(spark, sf_dir):
    """DirectSpellChecker.SuggestSimilar with the reference-default
    LuceneLevenshteinDistance (DirectSpellChecker.cs:46): OSA edit
    distance — adjacent transpositions count one edit, so e.g.
    'tabel' -> 'table' scores 1 - 1/5 = 0.8 instead of 0.6. Oracle
    uses DuckDB's damerau_levenshtein; full DL == OSA on every
    in-band (word, term) pair of this corpus (asserted by
    tests/test_osa.py's corpus sweep)."""
    from lucenenet_spark.search import spell

    _, s = _searcher(spark, sf_dir)
    return spell.direct_spell_suggest(
        s, ["tabel", "windoe", "strem", "batk", "table", "xyzq"], num_sug=5
    )


def _q_fuzzy_terms_osa(spark, sf_dir):
    """FuzzyQuery dictionary expansion with the reference-default
    transpositions=true (FuzzyQuery.cs:45): OSA distance <= 2 from
    'scann'. The distributed-dictionary path: JVM length-band +
    levenshtein<=4 prefilters push to the scan, the exact OSA DP runs
    as an Arrow-batched pandas UDF over the survivors."""
    idx, _ = _searcher(spark, sf_dir)
    q = FuzzyQuery(term="scann", max_edits=2, transpositions=True)
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_phonetic_terms(spark, sf_dir):
    """Dictionary expansion of a sounds-like query: every term with
    soundex('merj') = M620 (e.g. 'merge')."""
    from lucenenet_spark.analysis.phonetic import soundex_col
    from lucenenet_spark.search.queries import PhoneticQuery

    idx, _ = _searcher(spark, sf_dir)
    q = PhoneticQuery(name="merj")
    return (
        idx.term_stats.where(q.dict_predicate())
        .select("term", F.col("df").cast("long"), F.col("ttf").cast("long"))
    )


def _q_phonetic_docs(spark, sf_dir):
    """ConstantScore(PhoneticQuery('merj')): docs containing any
    sounds-like term."""
    from lucenenet_spark.search.queries import PhoneticQuery

    _, s = _searcher(spark, sf_dir)
    df = s.search_df(PhoneticQuery(name="merj"), k=None)
    return df.select("docid", F.col("score").cast("double").alias("score"))


def _q_surround_infix(spark, sf_dir):
    """Surround parser infix distance: 'table 3w hash' == ordered
    SpanNear slop 2 (DistanceQuery.cs opDistance-1)."""
    from lucenenet_spark.search.surround import run_surround

    _, s = _searcher(spark, sf_dir)
    return run_surround(s, "table 3w hash")


def _q_surround_prefix_n(spark, sf_dir):
    """Surround prefix form: '2n(table, hash)' == unordered slop 1."""
    from lucenenet_spark.search.surround import run_surround

    _, s = _searcher(spark, sf_dir)
    return run_surround(s, "2n(table, hash)")


def _q_surround_or_near(spark, sf_dir):
    """OR inside a distance op -> SpanOr leaf: '(merge OR sort) 2w hash'."""
    from lucenenet_spark.search.surround import run_surround

    _, s = _searcher(spark, sf_dir)
    return run_surround(s, "(merge OR sort) 2w hash")


def _q_surround_bool(spark, sf_dir):
    """Boolean-only surround: 'spark AND merge' -> scored BooleanQuery."""
    from lucenenet_spark.search.surround import run_surround

    _, s = _searcher(spark, sf_dir)
    return _ranked(run_surround(s, "spark AND merge", 10))


def _q_slow_fuzzy_terms(spark, sf_dir):
    """SlowFuzzyQuery (Sandbox): edit budget 3 — beyond FuzzyQuery's
    automaton ceiling of 2."""
    from lucenenet_spark.search.queries import SlowFuzzyQuery

    idx, _ = _searcher(spark, sf_dir)
    q = SlowFuzzyQuery(term="scann", minimum_similarity=3.0)
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_slow_fuzzy_frac(spark, sf_dir):
    """SlowFuzzyQuery fractional form: length-scaled similarity 0.5."""
    from lucenenet_spark.search.queries import SlowFuzzyQuery

    idx, _ = _searcher(spark, sf_dir)
    q = SlowFuzzyQuery(term="stream", minimum_similarity=0.5)
    return idx.term_stats.where(q.dict_predicate()).select(
        "term", F.col("df").cast("long"), F.col("ttf").cast("long")
    )


def _q_ascii_fold_term(spark, sf_dir):
    """ASCIIFoldingFilter: accents injected into the corpus (a -> á),
    folded back by CorpusSpec(ascii_fold=True) — the resulting index
    is bit-identical to the plain one, so the PLAIN term_query oracle
    must hash-match."""
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    accented = docs.withColumn("text", F.replace(F.col("text"), F.lit("a"), F.lit("á")))
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=(), ascii_fold=True
    )
    s = IndexSearcher(build_index(spark, accented, spec).cache())
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


_PAYLOAD_CACHE: dict[tuple[str, str], IndexSearcher] = {}


def _payload_searcher(spark, sf_dir) -> IndexSearcher:
    """Searcher over the DelimitedPayloadTokenFilter index: every
    whitespace chunk of the documents text gets '|{(len%4)+0.5}'
    appended (deterministic payload rule), parsed back at index time
    into per-position float32 payloads."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _PAYLOAD_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        # payload varies per OCCURRENCE (position enters the rule), so
        # payload-sensitive operators cannot degenerate into
        # term-constant factors
        annotated = docs.withColumn(
            "text",
            F.expr(
                "array_join(transform(split(text, ' +'), "
                "(x, i) -> concat(x, '|', cast(((length(x) + i) % 4) + 0.5 as string))), ' ')"
            ),
        )
        spec = CorpusSpec(
            text_col="text", id_col="doc_id", meta_cols=(), payload_delim="|"
        )
        _PAYLOAD_CACHE[key] = IndexSearcher(build_index(spark, annotated, spec).cache())
    return _PAYLOAD_CACHE[key]


def _q_payload_term_avg(spark, sf_dir):
    """PayloadTermQuery, AveragePayloadFunction."""
    from lucenenet_spark.search.payloads import payload_term_query

    s = _payload_searcher(spark, sf_dir)
    return _ranked(payload_term_query(s, "spark", 10, fn="avg"))


def _q_payload_term_max(spark, sf_dir):
    """PayloadTermQuery, MaxPayloadFunction."""
    from lucenenet_spark.search.payloads import payload_term_query

    s = _payload_searcher(spark, sf_dir)
    return _ranked(payload_term_query(s, "table", 10, fn="max"))


def _q_payload_near(spark, sf_dir):
    """PayloadNearQuery: ordered 2-term near, payload-avg factor."""
    from lucenenet_spark.search.payloads import payload_near_query

    s = _payload_searcher(spark, sf_dir)
    return _ranked(payload_near_query(s, "table", "hash", slop=3, k=10, fn="avg"))


def _q_span_payload_check(spark, sf_dir):
    """SpanPayloadCheckQuery: 'table' positions carrying payload 2.5."""
    from lucenenet_spark.search.payloads import span_payload_check

    s = _payload_searcher(spark, sf_dir)
    return span_payload_check(s, "table", 2.5)


def _q_span_near_payload_check(spark, sf_dir):
    """SpanNearPayloadCheckQuery: table->hash near spans whose payload
    pair is (2.5, 1.5)."""
    from lucenenet_spark.search.payloads import span_near_payload_check

    s = _payload_searcher(spark, sf_dir)
    return span_near_payload_check(s, "table", "hash", 3, (2.5, 1.5))


_SORTED_CACHE: dict[tuple[str, str], InvertedIndex] = {}


def _sorted_index(spark, sf_dir) -> InvertedIndex:
    """Index built SORTED by (n_chars DESC, doc_id) — the
    SortingMergePolicy role: docid order == sort order."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _SORTED_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.withColumn("neg_chars", -F.col("n_chars"))
        spec = CorpusSpec(
            text_col="text",
            id_col=None,
            order_cols=("neg_chars", "doc_id"),
            meta_cols=("n_chars",),
        )
        _SORTED_CACHE[key] = build_index(spark, corpus, spec).cache()
    return _SORTED_CACHE[key]


def _q_sorted_early_topk(spark, sf_dir):
    """Early-terminating sorted top-k: docids [0, k) of the sort-built
    index ARE the global top-k by n_chars DESC."""
    idx = _sorted_index(spark, sf_dir)
    return coll.early_terminating_sorted_topk(idx, 10, ["n_chars"]).withColumn(
        "n_chars", F.col("n_chars").cast("long")
    )


def _q_split_index_stats(spark, sf_dir):
    """MultiPassIndexSplitter(-seq) analog: bucket-aligned 2-way split;
    per-part collection stats + 'spark' term stats (metadata-only
    filters, no posting decode)."""
    from lucenenet_spark.index.splitter import split_index

    idx, _ = _searcher(spark, sf_dir)
    parts = split_index(idx, 2)
    rows = []
    for i, p in enumerate(parts):
        ts = p.term_stats.where(F.col("term") == "spark").first()
        rows.append(
            (
                i,
                p.max_doc,
                p.sum_total_term_freq,
                int(ts.df) if ts else 0,
                int(ts.ttf) if ts else 0,
            )
        )
    return spark.createDataFrame(
        rows, "part int, max_doc long, sttf long, df_spark long, ttf_spark long"
    )


def _q_pii_scrub(spark, sf_dir):
    """PII scrub over a deterministically injected corpus: per-class
    counts + sentinel-redacted text, all JVM regexp (one codegen pass)."""
    docs = _docs(spark, sf_dir)
    injected = docs.select(
        F.col("doc_id"),
        F.expr(
            "coalesce(text, '') || ' contact user' || cast(doc_id as string)"
            " || '@example.com or +1 (555) 010-' || lpad(cast(doc_id % 10000 as string), 4, '0')"
            " || ' host 10.0.' || cast(doc_id % 256 as string) || '.'"
            " || cast(doc_id % 100 as string) || ' end'"
        ).alias("text"),
    )
    return tx.pii_scrub(injected)


def _q_line_dedup(spark, sf_dir):
    """Line-level boilerplate removal: a shared ALL-RIGHTS-RESERVED
    line injected into every doc is dropped; unique tails survive."""
    docs = _docs(spark, sf_dir)
    injected = docs.select(
        F.col("doc_id"),
        F.expr(
            "coalesce(text, '') || chr(10) || 'ALL RIGHTS RESERVED boilerplate line'"
            " || chr(10) || 'unique tail ' || cast(doc_id as string)"
        ).alias("text"),
    )
    return tx.line_dedup(injected)


def _q_block_join_top_children(spark, sf_dir):
    """ToParentBlockJoinCollector.GetTopGroups: top parents each with
    their top-3 matching children."""
    from lucenenet_spark.search.join import to_parent_join_with_children

    _, s = _searcher(spark, sf_dir)
    parent = F.col("docid") - F.pmod(F.col("docid"), 10)
    return to_parent_join_with_children(
        s, TermQuery(term="hash"), parent, "avg", k=10, children_per_parent=3
    )


_CG_CACHE: dict[tuple[str, str], IndexSearcher] = {}


def _cg_searcher(spark, sf_dir) -> IndexSearcher:
    """Searcher over the CommonGramsFilter index (stopword-adjacent
    bigram overlap terms)."""
    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CG_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        spec = CorpusSpec(
            text_col="text", id_col="doc_id", meta_cols=(), common_grams=True
        )
        _CG_CACHE[key] = IndexSearcher(build_index(spark, docs, spec).cache())
    return _CG_CACHE[key]


def _q_common_grams_term(spark, sf_dir):
    """A stopword phrase ('the batch') as ONE rare-term lookup."""
    s = _cg_searcher(spark, sf_dir)
    return _ranked(s.search_df(TermQuery(term="the_batch"), 10))


def _q_common_grams_phrase(spark, sf_dir):
    """CommonGramsQueryFilter rewrite: 'hash the batch' -> phrase over
    the (hash_the, the_batch) bigram slots."""
    from lucenenet_spark.analysis.commongrams import common_grams_query_terms

    s = _cg_searcher(spark, sf_dir)
    pairs = common_grams_query_terms("hash the batch")
    q = PhraseQuery(
        phrase_terms=tuple(t for t, _ in pairs),
        term_positions=tuple(p for _, p in pairs),
    )
    return _ranked(s.search_df(q, 10))


def _q_lm_doc_quality(spark, sf_dir):
    """Perplexity-style quality filter: mean bigram stupid-backoff
    log-prob per doc under the corpus LM."""
    return tx.lm_doc_quality(_docs(spark, sf_dir))


def _q_pack_sequences(spark, sf_dir):
    """Training-sequence packing (ops/sampling.py): fixed 512-token
    budget, boundary-crossing layout, one window per lang shard."""
    from lucenenet_spark.ops import sampling as smp

    return smp.pack_sequences(_docs(spark, sf_dir), budget=512)


def _q_stratified_split(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split per lang stratum
    keyed on the md5-prefix integer of doc_id."""
    from lucenenet_spark.ops import sampling as smp

    return smp.stratified_split(_docs(spark, sf_dir))


def _q_temperature_mix(spark, sf_dir):
    """Temperature-2 mixture weights per lang: integer-exact
    sqrt-scaled weights and ppm shares."""
    from lucenenet_spark.ops import sampling as smp

    return smp.temperature_mix(_docs(spark, sf_dir))


def _q_sweetspot_term(spark, sf_dir):
    """SweetSpotSimilarity (Misc/SweetSpotSimilarity.cs): plateau
    length norm [2, 8] + baselineTf(base=1.5, min=2)."""
    from lucenenet_spark.functions.similarity import SweetSpotSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(
        idx,
        similarity=SweetSpotSimilarity(
            ln_min=2, ln_max=8, steepness=0.5, tf_base=1.5, tf_min=2.0
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_high_freq_terms(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.high_freq_terms(s, 10, "df")


def _q_duplicate_filter(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(
        coll.duplicate_filter(s, TermQuery(term="spark"), "source", "first", 10)
    )


def _q_boosting_query(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(
        coll.boosting_query(
            s, TermQuery(term="spark"), TermQuery(term="merge"), 0.5, 10
        )
    )


def _q_simple_parse(spark, sf_dir):
    """SimpleQueryParser: 'spark + merge | batch' -> (spark AND merge)
    OR batch via the reference's BuildQueryTree op-change nesting."""
    from lucenenet_spark.search.simple_parser import parse_simple

    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(parse_simple("spark + merge | batch"), 10))


def _q_standard_parse(spark, sf_dir):
    """Flexible StandardQueryParser: 'spark OR merge AND batch' ->
    spark OR (merge AND batch) via the precedence grammar
    (StandardSyntaxParser.cs:170) — the Classic parser flat-folds the
    same string, so this entry pins the flexible dialect."""
    from lucenenet_spark.search.standard_parser import parse_standard

    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(parse_standard("spark OR merge AND batch"), 10))


def _snowball_de_class(stem: str) -> list[str]:
    from lucenenet_spark.analysis.snowball import german_stem_class

    return german_stem_class(stem)


def _snowball_da_class(stem: str) -> list[str]:
    from lucenenet_spark.analysis.snowball import danish_stem_class

    return danish_stem_class(stem)


def _q_stemmed_term_de(spark, sf_dir):
    """German Snowball-stemmed index (SnowballFilter.cs:30 role):
    TermQuery('tabl') — the stem of 'table' — over an index built with
    CorpusSpec(stem_lang='de'); the oracle recomputes BM25 from raw
    text with the stemmer-verified surface-form class (no stop filter:
    doclen/norms count all tokens)."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        stem_lang="de",
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="tabl"), 10))


def _q_stemmed_term_da(spark, sf_dir):
    """Danish Snowball-stemmed index (SnowballFilter.cs:30 role,
    name="Danish"): TermQuery('tabl') over an index built with
    CorpusSpec(stem_lang='da'); the oracle recomputes BM25 from raw
    text with the stemmer-verified surface-form class
    (analysis/snowball.py::danish_stem_class)."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        stem_lang="da",
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="tabl"), 10))


def _q_stemmed_term_pl(spark, sf_dir):
    """Polish Stempel-role stemmed index (Lucene.Net.Analysis.Stempel,
    StempelStemmer.cs wraps Egothor trained tables — the model files
    are out of scope, the stemming ROLE is kept by the pinned
    light stemmer analysis/polish.py): TermQuery('indeks') over a
    CorpusSpec(stem_lang='pl') index on the deterministic PL_TEMPLATES
    corpus, where 5 different surface forms (indeks / indeksowania /
    indeksie / indeksu / indeksów) all reach the queried stem."""
    from lucenenet_spark.sources.synthetic import pl_text_expr

    key = ("pl", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(pl_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", stem_lang="pl")
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(TermQuery(term="indeks"), 10))


def _q_translit_term_query(spark, sf_dir):
    """ICUTransformFilter-role transliterated index
    (Lucene.Net.Analysis.ICU/Analysis/Icu/ICUTransformFilter.cs wraps
    an ICU Transliterator — the CLDR transform data is out of scope,
    the transform ROLE is kept by the pinned tables/rule engine in
    analysis/icu_transform.py): TermQuery('katálogos') over a
    CorpusSpec(translit='Any-Latin') index on the deterministic Greek
    EL_TEMPLATES corpus — the Latin-script query term only matches
    because every Greek token was transliterated at index time."""
    from lucenenet_spark.sources.synthetic import el_text_expr

    key = ("translit", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(el_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(text_col="text", id_col="doc_id", translit="Any-Latin")
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(TermQuery(term="katálogos"), 10))


def _q_collation_sort_fr(spark, sf_dir):
    """CollationKeyAnalyzer / ICUCollationKeyAnalyzer role
    (Analysis.Common/Collation/CollationKeyAnalyzer.cs, ICU/Collation/
    ICUCollationKeyAnalyzer.cs — the ICU collators are out of scope,
    the two-level UCA key over pinned locale tailorings keeps the
    role): per-word doc counts over the CollationTestBase fixture
    words, ranked by the FRENCH collation key materialized index-time
    by one Arrow-batched pass (the reference computes keys at index
    time for exactly this reason — query-time order is binary
    comparison). fr is forward-secondary (acute < circumflex):
    péché < pêche."""
    from pyspark.sql import Window

    from lucenenet_spark.analysis.collation import add_collation_key
    from lucenenet_spark.sources.synthetic import collate_text_expr

    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    words = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(collate_text_expr("doc_id")).alias("word"),
    )
    keyed = add_collation_key(words, "word", "fr")
    agg = keyed.groupBy("word", "ckey").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.min("doc_id").alias("min_doc"),
    )
    # 10-row post-aggregate window: bounded by the distinct word count
    w = Window.orderBy("ckey")
    return agg.select(
        F.row_number().over(w).alias("rk"), "word", "n_docs", "min_doc"
    )


def _q_collation_range_sv(spark, sf_dir):
    """TermRangeQuery-with-collator role (CollationTestBase Farsi
    range shape, Swedish tailoring): keep fixture words sorting
    within [HOT, HÅT] under sv (å ä ö AFTER z, so HUT and HÅT
    qualify, HAT and HØT do not) — binary range predicates on the
    materialized key column, JVM-side."""
    from lucenenet_spark.analysis.collation import collated_range
    from lucenenet_spark.sources.synthetic import collate_text_expr

    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    words = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.expr(collate_text_expr("doc_id")).alias("word"),
    )
    ranged = collated_range(words, "word", "sv", "HOT", "HÅT")
    return (
        ranged.groupBy("word")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("word")
    )


def _q_opennlp_noun_term(spark, sf_dir):
    """OpenNLP-role POS-gated index (OpenNLPTokenizer.cs sentence
    detection + OpenNLPPOSFilter.cs tagging + TypeTokenFilter
    consumer; the trained maxent models are out of scope — the pinned
    rule tagger in analysis/opennlp_role.py keeps the role):
    TermQuery('documents') over a CorpusSpec(opennlp_keep=('NN','NNP'))
    index on EN_POS_TEMPLATES — only noun-tagged tokens are indexed,
    removed tokens leave position gaps and norms count kept tokens."""
    from lucenenet_spark.sources.synthetic import en_pos_text_expr

    key = ("opennlp", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _CODE_CACHE:
        docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
        corpus = docs.select(
            "doc_id", F.expr(en_pos_text_expr("doc_id")).alias("text")
        )
        spec = CorpusSpec(
            text_col="text", id_col="doc_id", opennlp_keep=("NN", "NNP")
        )
        _CODE_CACHE[key] = IndexSearcher(build_index(spark, corpus, spec))
    s = _CODE_CACHE[key]
    return _ranked(s.search_df(TermQuery(term="documents"), 10))


def _q_complex_phrase(spark, sf_dir):
    """ComplexPhraseQueryParser: prefix inside a phrase -> span near
    with a SpanMultiTermQuery slot, one term-pruned packed scan."""
    from lucenenet_spark.search import spans as sp
    from lucenenet_spark.search.complex_phrase import parse_complex_phrase

    _, s = _searcher(spark, sf_dir)
    return sp.span_query(s, parse_complex_phrase('"table ha*"'))


def _q_complex_phrase_group(spark, sf_dir):
    """ComplexPhrase with an OR-group slot and a prefix slot:
    '"fast (merge join) ta*"~4'."""
    from lucenenet_spark.search import spans as sp
    from lucenenet_spark.search.complex_phrase import parse_complex_phrase

    _, s = _searcher(spark, sf_dir)
    return sp.span_query(s, parse_complex_phrase('"fast (merge join) ta*"~4'))


def _q_facet_sum_value(spark, sf_dir):
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "n_chars")
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return coll.facet_sum_value(s, TermQuery(term="spark"), "lang", "n_chars")


def _q_repetition_stats(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    return tx.repetition_stats(docs, max_n=3)


def _q_ngram_contamination(spark, sf_dir):
    """GPT-3-style n-gram contamination: benchmark = every 50th doc,
    the rest checked for 3-gram occurrence overlap (3 instead of 13
    so the synthetic 30-word vocabulary actually collides)."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % 50 == 0)
    rest = docs.where(F.col("doc_id") % 50 != 0)
    return tx.ngram_contamination(rest, bench, n=3)


def _q_ngram_term(spark, sf_dir):
    """NGram index (infix substring): 'ndow' (inside 'window') is an
    exact index term — one pruned packed scan, no dictionary regex."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        ngram=(3, 4),
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="ndow"), 10))


def _q_substring_search(spark, sf_dir):
    """Long infix literal 'ustomer' (> max_gram) via the n-gram index:
    AND over its distinct 4-grams (one pruned packed scan) + exact
    contains() verify over ONLY the candidate docs."""
    from lucenenet_spark.search.substring import substring_docs

    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        ngram=(3, 4),
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return substring_docs(s, corpus, "ustomer", 3, 4).orderBy("docid")


def _q_sampled_facets(spark, sf_dir):
    """RandomSamplingFacetsCollector: deterministic 20% doc sample,
    counts + integer-exact amortized estimates."""
    _, s = _searcher(spark, sf_dir)
    return coll.sampled_facet_counts(s, TermQuery(term="table"), "lang", 20)


def _q_flt_terms(spark, sf_dir):
    """FuzzyLikeThisQuery rewrite product: variants of the misspelled
    'tabel hsah', edit-sim² × source-idf boosts, pinned clause order."""
    from lucenenet_spark.search import flt

    _, s = _searcher(spark, sf_dir)
    return flt.fuzzy_like_this_terms(s, "tabel data1", 0.4, 0, 20)


def _q_flt_topk(spark, sf_dir):
    from lucenenet_spark.search import flt

    _, s = _searcher(spark, sf_dir)
    return _ranked(flt.fuzzy_like_this_topk(s, "tabel data1", 0.4, 0, 20, 10))


def _q_domain_cap(spark, sf_dir):
    """RefinedWeb-style per-domain cap: deterministic hash-ranked keep
    set, at most 40 docs per source domain."""
    from lucenenet_spark.ops import sampling as smp

    return smp.domain_cap(_docs(spark, sf_dir), cap=10)


def _q_xml_boolean(spark, sf_dir):
    """CoreParser surface: XML BooleanQuery == the programmatic AND."""
    from lucenenet_spark.search.xmlparser import parse_xml_query

    _, s = _searcher(spark, sf_dir)
    q = parse_xml_query(
        "<BooleanQuery>"
        '<Clause occurs="must"><TermQuery>table</TermQuery></Clause>'
        '<Clause occurs="must"><TermQuery>hash</TermQuery></Clause>'
        "</BooleanQuery>"
    )
    return _ranked(s.search_df(q, 10))


def _q_xml_dismax(spark, sf_dir):
    from lucenenet_spark.search.xmlparser import parse_xml_query

    _, s = _searcher(spark, sf_dir)
    q = parse_xml_query(
        '<DisjunctionMaxQuery tieBreaker="0.1">'
        "<TermQuery>merge</TermQuery><TermQuery>sort</TermQuery>"
        "</DisjunctionMaxQuery>"
    )
    return _ranked(s.search_df(q, 10))


def _q_xml_span_near(spark, sf_dir):
    from lucenenet_spark.search.spans import span_query
    from lucenenet_spark.search.xmlparser import parse_xml_query

    _, s = _searcher(spark, sf_dir)
    q = parse_xml_query(
        '<SpanNear slop="2" inOrder="true">'
        "<SpanTerm>table</SpanTerm><SpanTerm>hash</SpanTerm>"
        "</SpanNear>"
    )
    return span_query(s, q).orderBy("docid")


def _q_edge_ngram_term(spark, sf_dir):
    """EdgeNGram index (autocomplete): prefix 'spar' is an exact index
    term — one pruned packed scan, no dictionary expansion."""
    corpus = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    spec = CorpusSpec(
        text_col="text", id_col="doc_id", meta_cols=("lang", "source"),
        edge_ngram=(2, 4),
    )
    s = IndexSearcher(build_index(spark, corpus, spec))
    return _ranked(s.search_df(TermQuery(term="spar"), 10))


def _q_all_group_heads(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.all_group_heads(s, TermQuery(term="spark"), "lang")


def _q_quality_metrics(spark, sf_dir):
    """Benchmark/Quality analog: P@10, MRR, NDCG@10 for two judged
    queries; judgments = deterministic freq grading (rel = freq-1
    capped at 3)."""
    from lucenenet_spark.quality import freq_judgments, quality_metrics

    _, s = _searcher(spark, sf_dir)
    terms = {"q_dup": "dup", "q_spark": "spark"}
    judg = freq_judgments(s, terms, cap=3)
    return quality_metrics(
        s, {qid: TermQuery(term=t) for qid, t in terms.items()}, judg, 10
    )


def _q_quality_summary(spark, sf_dir):
    """QualityStats.Average analog: one summary row (MAP, mean P@10,
    mean MRR, mean NDCG, mean recall) over the judged query set."""
    from lucenenet_spark.quality import (
        freq_judgments,
        quality_metrics,
        quality_summary,
    )

    _, s = _searcher(spark, sf_dir)
    terms = {"q_dup": "dup", "q_spark": "spark"}
    judg = freq_judgments(s, terms, cap=3)
    per_q = quality_metrics(
        s, {qid: TermQuery(term=t) for qid, t in terms.items()}, judg, 10
    )
    return quality_summary(per_q)


def _q_span_position_range(spark, sf_dir):
    from lucenenet_spark.search import spans as sp

    _, s = _searcher(spark, sf_dir)
    q = sp.SpanPositionRangeQuery(sp.SpanTermQuery("table"), start=5, end=20)
    return sp.span_query(s, q)


def _q_free_text_suggest(spark, sf_dir):
    from lucenenet_spark.search.suggest import free_text_suggest

    return free_text_suggest(_docs(spark, sf_dir), ["table"], "ha", 5, grams=2)


def _q_free_text_suggest3(spark, sf_dir):
    from lucenenet_spark.search.suggest import free_text_suggest

    return free_text_suggest(
        _docs(spark, sf_dir), ["value", "table"], "", 5, grams=3
    )


def _q_nb_classify(spark, sf_dir):
    from lucenenet_spark.classification import naive_bayes_classify

    docs = _docs(spark, sf_dir)
    return naive_bayes_classify(
        docs, docs.where(F.col("doc_id") < 50), class_col="source"
    )


def _q_knn_classify(spark, sf_dir):
    from lucenenet_spark.classification import knn_classify

    _, s = _searcher(spark, sf_dir)
    return knn_classify(s, _docs(spark, sf_dir), docid=0, k=10, class_col="source")


def _q_dfr_ifb2_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import DFRSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(
        idx,
        similarity=DFRSimilarity(
            s._avgdl, basic_model="if", after_effect="b", normalization="h2"
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_dfr_gl1_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import DFRSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(
        idx,
        similarity=DFRSimilarity(
            s._avgdl, basic_model="g", after_effect="l", normalization="h1"
        ),
    )
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_lm_jm_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import LMJelinekMercerSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx, similarity=LMJelinekMercerSimilarity())
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_ib_ll_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import IBLLSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(idx, similarity=IBLLSimilarity(s._avgdl))
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_ib_spl_term(spark, sf_dir):
    from lucenenet_spark.functions.similarity import IBSPLSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx)
    s = IndexSearcher(idx, similarity=IBSPLSimilarity(s._avgdl))
    return _ranked(s.search_df(TermQuery(term="spark"), 10))


def _q_classic_phrase(spark, sf_dir):
    from lucenenet_spark.functions.similarity import ClassicSimilarity

    idx, _ = _searcher(spark, sf_dir)
    s = IndexSearcher(idx, similarity=ClassicSimilarity())
    return _ranked(s.search_df(PhraseQuery(phrase_terms=("table", "hash")), 10))


def _q_highlight(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="table"), Occur.SHOULD), (TermQuery(term="hash"), Occur.SHOULD)
    )
    return coll.highlight(s, q, window=10, k=10)


def _q_highlight_snippets(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="table"), Occur.SHOULD), (TermQuery(term="hash"), Occur.SHOULD)
    )
    return coll.highlight_snippets(
        s, q, _docs(spark, sf_dir), text_col="text", id_col="doc_id", window=10, k=10
    )


def _q_postings_highlight(spark, sf_dir):
    """PostingsHighlighter analog: top-2 PassageScorer-ranked sentence
    passages per top-10 hit of OR(table, hash)."""
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="table"), Occur.SHOULD), (TermQuery(term="hash"), Occur.SHOULD)
    )
    return coll.postings_highlight(
        s, q, _docs(spark, sf_dir), text_col="text", id_col="doc_id",
        k=10, max_passages=2,
    )


def _q_drill_sideways(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.drill_sideways(
        s, TermQuery(term="spark"), {"lang": "en", "source": "src1"}
    )


def _q_facet_ranges(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.facet_ranges(
        s,
        TermQuery(term="spark"),
        "field_length",
        [("short", 0, 20), ("mid", 20, 40), ("long", 40, 100000)],
    )


def _q_group_distinct(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.group_distinct(s, TermQuery(term="spark"), "lang", "source")


def _q_suggest(spark, sf_dir):
    from lucenenet_spark.search.suggest import suggest_similar

    idx, _ = _searcher(spark, sf_dir)
    return suggest_similar(IndexSearcher(idx), "sparc", max_suggestions=5, max_edits=2)


def _q_prefix_suggest(spark, sf_dir):
    from lucenenet_spark.search.suggest import complete_prefix

    idx, _ = _searcher(spark, sf_dir)
    return complete_prefix(IndexSearcher(idx), "s", max_suggestions=5)


_SUGGESTER_CACHE: dict[tuple[str, str], object] = {}


def _analyzing_suggester(spark, sf_dir):
    from lucenenet_spark.search.suggest import AnalyzingSuggester

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _SUGGESTER_CACHE:
        entries = _docs(spark, sf_dir).select(
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40).alias("surface"),
            F.col("n_chars"),
        )
        _SUGGESTER_CACHE[key] = AnalyzingSuggester(entries, "surface", "n_chars")
    return _SUGGESTER_CACHE[key]


def _q_analyzing_suggest(spark, sf_dir):
    return _analyzing_suggester(spark, sf_dir).lookup("merge", n=5)


def _q_fuzzy_suggest(spark, sf_dir):
    return _analyzing_suggester(spark, sf_dir).fuzzy_lookup("marge", n=5, max_edits=1)


def _q_doc_value_suggest(spark, sf_dir):
    """DocumentValueSourceDictionary role: suggester weight computed
    per document by an expression instead of a stored field."""
    from lucenenet_spark.search.suggest import AnalyzingSuggester

    entries = _docs(spark, sf_dir).select(
        F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40).alias("surface"),
        (F.col("n_chars").cast("long") * 2 + F.col("doc_id").cast("long") % 97
         ).alias("w"),
    )
    return AnalyzingSuggester(entries, "surface", F.col("w")).lookup("merge", n=5)


def _infix_suggester(spark, sf_dir):
    from lucenenet_spark.search.suggest import AnalyzingInfixSuggester

    key = ("infix", spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _SUGGESTER_CACHE:
        entries = (
            _docs(spark, sf_dir)
            .select(
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40).alias(
                    "surface"
                ),
                F.col("n_chars").cast("long").alias("w"),
            )
            .groupBy("surface")
            .agg(F.max("w").alias("weight"))
        )
        _SUGGESTER_CACHE[key] = AnalyzingInfixSuggester(entries, "surface", "weight")
    return _SUGGESTER_CACHE[key]


def _q_infix_suggest(spark, sf_dir):
    # "sort ta": finished token "sort" (MUST) + unfinished prefix "ta"
    return _infix_suggester(spark, sf_dir).lookup("sort ta", n=5)


def _q_infix_suggest_any(spark, sf_dir):
    # trailing space -> both tokens finished; OR semantics
    return _infix_suggester(spark, sf_dir).lookup(
        "merge window ", n=5, all_terms_required=False
    )


def _q_infix_suggest_highlight(spark, sf_dir):
    return _infix_suggester(spark, sf_dir).lookup("sort ta", n=5, do_highlight=True)


def _q_blended_infix_linear(spark, sf_dir):
    return _infix_suggester(spark, sf_dir).lookup_blended(
        "customer", n=5, blender="linear"
    )


def _q_blended_infix_reciprocal(spark, sf_dir):
    return _infix_suggester(spark, sf_dir).lookup_blended(
        "filter str", n=5, blender="reciprocal"
    )


def _q_function_query(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(coll.boost_by_value(s, TermQuery(term="spark"), "field_length", 10))


# ------------------------------------------------------- multi-field

_MF_CACHE: dict[tuple[str, str], object] = {}


def _mf_searcher(spark, sf_dir):
    """Two-field corpus derived from documents (title = first 80 chars,
    body = full text), indexed per field over a shared docid space."""
    from lucenenet_spark.index.multifield import build_multi_field_index
    from lucenenet_spark.search.multifield import MultiFieldSearcher

    key = (spark.sparkContext.applicationId, sf_dir.rstrip("/"))
    if key not in _MF_CACHE:
        docs2 = _docs(spark, sf_dir).select(
            "doc_id",
            F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 80).alias("title"),
            F.coalesce(F.col("text"), F.lit("")).alias("body"),
        )
        mfi = build_multi_field_index(
            spark,
            docs2,
            {"title": "title", "body": "body"},
            _mf_spec(),
            default_field="body",
        ).cache()
        _MF_CACHE[key] = MultiFieldSearcher(mfi)
    return _MF_CACHE[key]


def _mf_spec():
    return CorpusSpec(text_col="body", id_col="doc_id")


def _q_field_term_query(spark, sf_dir):
    mfs = _mf_searcher(spark, sf_dir)
    return _ranked(mfs.search_df(TermQuery(term="merge", field="title"), 10))


def _q_multi_field_dismax(spark, sf_dir):
    mfs = _mf_searcher(spark, sf_dir)
    return _ranked(
        mfs.dismax_all_fields(TermQuery(term="spark"), tie_breaker=0.3, k=10)
    )


def _q_multi_field_boolean(spark, sf_dir):
    mfs = _mf_searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="spark", field="title"), Occur.MUST),
        (TermQuery(term="merge", field="body"), Occur.MUST),
    )
    return _ranked(mfs.search_df(q, 10))


def _q_per_field_sim_dismax(spark, sf_dir):
    from lucenenet_spark.functions.similarity import ClassicSimilarity
    from lucenenet_spark.search.multifield import MultiFieldSearcher

    mfi = _mf_searcher(spark, sf_dir).index
    mfs = MultiFieldSearcher(
        mfi, similarity_by_field={"title": ClassicSimilarity()}
    )
    return _ranked(
        mfs.dismax_all_fields(TermQuery(term="spark"), tie_breaker=0.3, k=10)
    )


def _q_grouped_topk(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.grouped_topk(s, TermQuery(term="hash"), "source", k_groups=10, k_per_group=3)


def _q_stored_fields(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return s.docs_df([0, 1, 2, 3, 4]).select("docid", "lang", "source")


def _q_sort_search_after(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = TermQuery(term="spark")
    # page 1 under (field_length asc, docid asc); cursor = its last row
    first = coll.sort_topk(s, q, [coll.SortField("field_length")], 10).collect()
    last = first[-1]
    return coll.sort_search_after(
        s, q, coll.SortField("field_length"), last["field_length"], last["docid"], 10
    )


def _q_search_after(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = TermQuery(term="spark")
    last = s.search(q, 10)[-1]
    return coll.search_after(s, q, 10, last.score, last.docid).select(
        "docid", F.col("score").cast("double").alias("score")
    )


def _q_rescore(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return _ranked(
        coll.rescore(
            s,
            TermQuery(term="hash"),
            PhraseQuery(phrase_terms=("table", "hash")),
            k_first=50,
            k_final=10,
            weight_first=1.0,
            weight_second=2.0,
        )
    )


def _q_mlt_terms(spark, sf_dir):
    from lucenenet_spark.search.mlt import interesting_terms

    _, s = _searcher(spark, sf_dir)
    sel = interesting_terms(s, docid=0, max_query_terms=25, min_term_freq=2, min_doc_freq=5)
    return spark.createDataFrame(
        [(t, f, d, sc) for t, f, d, sc in sel],
        "term string, tf long, df long, mlt_score double",
    )


def _q_mlt_topk(spark, sf_dir):
    from lucenenet_spark.search.mlt import more_like_this

    _, s = _searcher(spark, sf_dir)
    return _ranked(s.search_df(more_like_this(s, docid=0), 10))


def _q_common_terms_split(spark, sf_dir):
    from lucenenet_spark.search.mlt import common_terms_query

    _, s = _searcher(spark, sf_dir)
    q = common_terms_query(s, ["dup", "hash", "spark", "merge"], max_term_frequency=0.1)
    rows = []
    for c in q.clauses:
        df_ = s._collect_stats(c.query)[c.query.term][0]
        rows.append((c.query.term, df_, 1 if c.occur == Occur.MUST else 0))
    return spark.createDataFrame(rows, "term string, df long, is_low long")


def _q_hit_count(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    q = BooleanQuery.of(
        (TermQuery(term="hash"), Occur.SHOULD), (TermQuery(term="dup"), Occur.SHOULD)
    )
    return spark.createDataFrame([(s.count(q),)], "n_hits long")


# ---------------------------------------------------- training-data ops

def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir.rstrip('/')}/embeddings.parquet")


def _q_dedup_exact(spark, sf_dir):
    return dd.exact_dup_groups(_docs(spark, sf_dir))


def _q_minhash_sigs(spark, sf_dir):
    sigs = dd.minhash_signatures(_docs(spark, sf_dir))
    return sigs.select(
        "id", F.posexplode("sig").alias("i", "mh")
    ).select("id", F.col("i").cast("long").alias("i"), "mh")


def _q_minhash_dedup(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = dd.minhash_candidate_pairs(dd.minhash_signatures(docs))
    return dd.ngram_jaccard(docs, pairs)


def _q_near_dup_groups(spark, sf_dir):
    return dd.near_dup_groups(_docs(spark, sf_dir), threshold=0.8)


def _q_simhash(spark, sf_dir):
    return dd.simhash(_docs(spark, sf_dir))


def _q_simhash_pairs(spark, sf_dir):
    return dd.simhash_dup_pairs(_docs(spark, sf_dir)).select(
        "id_a", "id_b", F.col("hamming").cast("long").alias("hamming")
    )


def _q_token_stats(spark, sf_dir):
    return tx.token_stats(_docs(spark, sf_dir))


def _q_quality(spark, sf_dir):
    return tx.quality_score(_docs(spark, sf_dir))


def _q_language_id(spark, sf_dir):
    return tx.language_id(_docs(spark, sf_dir))


def _q_fingerprint(spark, sf_dir):
    return tx.doc_fingerprint(_docs(spark, sf_dir))


def _q_ann_quantized(spark, sf_dir):
    return sim.cosine_topk_quantized(_emb(spark, sf_dir), query_id=0, k=10)


def _q_ann_batch(spark, sf_dir):
    return sim.cosine_topk_quantized_batch(_emb(spark, sf_dir), [0, 1, 2], k=5)


def _q_ann_float(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    d = emb.select(F.size("embedding").alias("d")).first()["d"]
    return sim.cosine_topk_float(emb, [1.0] * int(d), k=10)


def _q_ann_lsh(spark, sf_dir):
    return sim.cosine_topk_lsh(_emb(spark, sf_dir), query_id=0, k=10)


def _q_ann_ivf(spark, sf_dir):
    return sim.cosine_topk_ivf(_emb(spark, sf_dir), query_id=0, k=10)


def _q_ann_pq(spark, sf_dir):
    return sim.cosine_topk_pq(_emb(spark, sf_dir), query_id=0, k=10)


def _q_embedding_dups(spark, sf_dir):
    return sim.embedding_dup_pairs(_emb(spark, sf_dir), threshold=0.42)


def _q_embedding_dups_lsh(spark, sf_dir):
    return sim.embedding_dup_pairs_lsh(_emb(spark, sf_dir), threshold=0.42)


def _q_semdedup(spark, sf_dir):
    return sim.semdedup(_emb(spark, sf_dir), eps=0.42, n_centroids=8)


def _q_cluster_sample(spark, sf_dir):
    return sim.cluster_quota_sample(_emb(spark, sf_dir), n_per_cluster=10, n_centroids=8)


def _q_gopher_rules(spark, sf_dir):
    from lucenenet_spark.ops import text as ops_text

    return ops_text.gopher_rules(_docs(spark, sf_dir))


def _q_c4_filters(spark, sf_dir):
    from lucenenet_spark.ops import text as ops_text

    return ops_text.c4_filters(_docs(spark, sf_dir))


def _q_top_ngram_stats(spark, sf_dir):
    from lucenenet_spark.ops import text as ops_text

    return ops_text.top_ngram_stats(_docs(spark, sf_dir))


def _q_embedding_contamination(spark, sf_dir):
    emb = _emb(spark, sf_dir)
    return sim.embedding_contamination(
        emb.where(F.col("vec_id") >= 20), emb.where(F.col("vec_id") < 20), threshold=0.42
    )


def _q_chunk_documents(spark, sf_dir):
    from lucenenet_spark.ops import text as ops_text

    return ops_text.chunk_documents(_docs(spark, sf_dir), chunk_chars=128, overlap=32)


def _q_term_freq_value(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.term_freq_topk(s, "spark", k=10)


def _q_norm_value_query(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.norm_value_topk(s, "spark", k=10)


def _q_check_index(spark, sf_dir):
    from lucenenet_spark.index.checkindex import check_index

    idx, _ = _searcher(spark, sf_dir)
    return check_index(idx)


def _q_grouped_facets(spark, sf_dir):
    _, s = _searcher(spark, sf_dir)
    return coll.grouped_facet_counts(s, TermQuery(term="spark"), "source", "lang")


def _q_confusion_matrix(spark, sf_dir):
    from lucenenet_spark.classification import confusion_matrix, naive_bayes_classify

    docs = _docs(spark, sf_dir)
    preds = naive_bayes_classify(docs, docs.where(F.col("doc_id") < 50), class_col="source")
    return confusion_matrix(preds, docs, truth_col="source")


def _q_event_windows(spark, sf_dir):
    from lucenenet_spark.streaming.windows import windowed_event_counts

    events = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    return windowed_event_counts(events, "1 hour")


def _q_event_sessions(spark, sf_dir):
    from lucenenet_spark.streaming.windows import event_sessions

    events = spark.read.parquet(f"{sf_dir.rstrip('/')}/events.parquet")
    return event_sessions(events, "30 minutes")


def _q_media_stats(spark, sf_dir):
    return mm.media_stats(mm.media_from_text(_docs(spark, sf_dir)))


def _q_frame_samples(spark, sf_dir):
    return mm.sample_frames(mm.media_from_text(_docs(spark, sf_dir)))


def _q_media_features(spark, sf_dir):
    return mm.extract_feature_rows(mm.media_from_text(_docs(spark, sf_dir)))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Entry ORDER is part of the driver contract: each round's
    CORRECTNESS run records only the FIRST ~50 dict entries.  Rotated
    for round 5: the 42 entries that have never had a driver row in
    r01-r04 run FIRST (42 < 50, so one window retires the whole
    backlog, with ~8 slots left for round-5 additions placed right
    after them), then entries by staleness (r01-verified, r02, r03,
    r04-freshest last)."""
    return {
        # -- never driver-verified (no row in r01-r04): run FIRST ------------
        "stratified_split": _q_stratified_split,
        "temperature_mix": _q_temperature_mix,
        "ngram_term_query": _q_ngram_term,
        "substring_search": _q_substring_search,
        "xml_boolean_query": _q_xml_boolean,
        "xml_dismax_query": _q_xml_dismax,
        "xml_span_near": _q_xml_span_near,
        "sampled_facets": _q_sampled_facets,
        "fuzzy_like_this_terms": _q_flt_terms,
        "fuzzy_like_this_topk": _q_flt_topk,
        "domain_cap": _q_domain_cap,
        "direct_spell": _q_direct_spell,
        "chained_filter_xor": _q_chained_filter_xor,
        "custom_score_query": _q_custom_score,
        "scale_function_query": _q_scale_function,
        "grouped_topk_expr": _q_grouped_topk_expr,
        "hybrid_rrf": _q_hybrid_rrf,
        "dsir_weights": _q_dsir_weights,
        "exact_substr_spans": _q_exact_substr_spans,
        "dsir_resample": _q_dsir_resample,
        "pk_split_search": _q_pk_split_search,
        "phrase_snippets": _q_phrase_snippets,
        "time_limited_topk": _q_time_limited,
        "semdedup": _q_semdedup,
        "chunk_documents": _q_chunk_documents,
        "term_freq_value": _q_term_freq_value,
        "norm_value_query": _q_norm_value_query,
        "check_index": _q_check_index,
        "grouped_facets": _q_grouped_facets,
        "confusion_matrix": _q_confusion_matrix,
        "cluster_sample": _q_cluster_sample,
        "embedding_contamination": _q_embedding_contamination,
        "gopher_rules": _q_gopher_rules,
        "c4_filters": _q_c4_filters,
        "top_ngram_stats": _q_top_ngram_stats,
        "standard_parse_query": _q_standard_parse,
        "stemmed_term_query_de": _q_stemmed_term_de,
        "stemmed_term_query_da": _q_stemmed_term_da,
        "dfr_pl2_term_query": _q_dfr_pl2_term,
        "dfr_dlz_term_query": _q_dfr_dlz_term,
        "dfr_bel1_term_query": _q_dfr_bel1_term,
        "spatial_polygon": _q_spatial_polygon,
        # -- new in r5 (never driver-verified): inside the window ------------
        "direct_spell_osa": _q_direct_spell_osa,
        "fuzzy_terms_osa": _q_fuzzy_terms_osa,
        "uax29_term_query": _q_uax29_term_query,
        "uax29_mid_terms": _q_uax29_mid_terms,
        "ja_term_query": _q_ja_term_query,
        "zh_term_query": _q_zh_term_query,
        "ja_phrase_query": _q_ja_phrase_query,
        "fuzzy_osa_topk": _q_fuzzy_osa_topk,
        # -- last verified in r01 (stale) ------------
        "facet_counts": _q_facet,
        "filtered_query": _q_filtered,
        "numeric_range_query": _q_numeric_range,
        "grouped_topk": _q_grouped_topk,
        "search_after": _q_search_after,
        "rescore": _q_rescore,
        "hit_count": _q_hit_count,
        "mlt_terms": _q_mlt_terms,
        "common_terms_split": _q_common_terms_split,
        "prefix_docs": _q_prefix_docs,
        "wildcard_terms": _q_wildcard_terms,
        "fuzzy_terms": _q_fuzzy_terms,
        "term_range": _q_term_range,
        # -- last verified in r02 ------------
        "dedup_exact": _q_dedup_exact,
        "minhash_sigs": _q_minhash_sigs,
        "minhash_dedup": _q_minhash_dedup,
        "near_dup_groups": _q_near_dup_groups,
        "simhash": _q_simhash,
        "simhash_pairs": _q_simhash_pairs,
        "token_stats": _q_token_stats,
        "quality_score": _q_quality,
        "language_id": _q_language_id,
        "doc_fingerprint": _q_fingerprint,
        "ann_quantized": _q_ann_quantized,
        "ann_batch": _q_ann_batch,
        "ann_float": _q_ann_float,
        "ann_lsh": _q_ann_lsh,
        "ann_ivf": _q_ann_ivf,
        "embedding_dup_pairs": _q_embedding_dups,
        "embedding_dup_pairs_lsh": _q_embedding_dups_lsh,
        "event_window_counts": _q_event_windows,
        "event_sessions": _q_event_sessions,
        "media_stats": _q_media_stats,
        "frame_samples": _q_frame_samples,
        "media_features": _q_media_features,
        "tokenize": _q_tokenize,
        "positions": _q_positions,
        "term_stats": _q_term_stats,
        "doc_norms": _q_doc_norms,
        "corpus_stats": _q_corpus_stats,
        "sha_verify": _q_sha_verify,
        "term_query": _q_term,
        "term_query_rare": _q_term_rare,
        "boolean_and": _q_bool_and,
        "boolean_or": _q_bool_or,
        "boolean_not": _q_bool_not,
        "min_should_match": _q_min_should_match,
        "dismax": _q_dismax,
        "phrase_query": _q_phrase,
        "expression_topk": _q_expression_topk,
        "facet_taxonomy": _q_facet_taxonomy,
        "block_join_avg": _q_block_join,
        "join_query_max": _q_join_query_max,
        "join_query_total": _q_join_query_total,
        "sort_rescore": _q_sort_rescore,
        "term_vector": _q_term_vector,
        "classic_term_query": _q_classic_term,
        "highlight": _q_highlight,
        "facet_ranges": _q_facet_ranges,
        "drill_sideways": _q_drill_sideways,
        "group_distinct": _q_group_distinct,
        "suggest": _q_suggest,
        "prefix_suggest": _q_prefix_suggest,
        # -- last verified in r03 ------------
        "function_query": _q_function_query,
        "field_term_query": _q_field_term_query,
        "multi_field_dismax": _q_multi_field_dismax,
        "per_field_sim_dismax": _q_per_field_sim_dismax,
        "ann_pq": _q_ann_pq,
        "multi_field_boolean": _q_multi_field_boolean,
        "sort_by_field": _q_sort_by_field,
        "sort_by_meta_desc": _q_sort_by_meta_desc,
        "stored_fields": _q_stored_fields,
        "sort_search_after": _q_sort_search_after,
        "span_near_ordered": _q_span_near_ordered,
        "span_near_unordered": _q_span_near_unordered,
        "sloppy_phrase": _q_sloppy_phrase,
        "multi_phrase": _q_multi_phrase,
        "regexp_terms": _q_regexp_terms,
        "match_all_docs": _q_match_all,
        "field_value_filter": _q_field_value_filter,
        "mlt_topk": _q_mlt_topk,
        "span_near3_ordered": _q_span_near3,
        "span_first": _q_span_first,
        "span_not": _q_span_not,
        "span_or_near": _q_span_or_near,
        "span_near3_unordered": _q_span_near3_unordered,
        "span_near_scored": _q_span_near_scored,
        "block_join_children": _q_block_join_children,
        "classic_phrase_query": _q_classic_phrase,
        "highlight_snippets": _q_highlight_snippets,
        "postings_highlight": _q_postings_highlight,
        "lm_term_query": _q_lm_term,
        "dfr_term_query": _q_dfr_term,
        "nb_classify": _q_nb_classify,
        "knn_classify": _q_knn_classify,
        "spatial_bbox": _q_spatial_bbox,
        "spatial_distance_topk": _q_spatial_distance_topk,
        "spatial_distance_join": _q_spatial_distance_join,
        "dfr_ifb2_term_query": _q_dfr_ifb2_term,
        "dfr_gl1_term_query": _q_dfr_gl1_term,
        "lm_jm_term_query": _q_lm_jm_term,
        "ib_ll_term_query": _q_ib_ll_term,
        "ib_spl_term_query": _q_ib_spl_term,
        "analyzing_suggest": _q_analyzing_suggest,
        "fuzzy_suggest": _q_fuzzy_suggest,
        "doc_value_suggest": _q_doc_value_suggest,
        "infix_suggest": _q_infix_suggest,
        "infix_suggest_any": _q_infix_suggest_any,
        "infix_suggest_highlight": _q_infix_suggest_highlight,
        "blended_infix_linear": _q_blended_infix_linear,
        "blended_infix_reciprocal": _q_blended_infix_reciprocal,
        "percolate": _q_percolate,
        "synonym_index_term": _q_synonym_index_term,
        # -- last verified in r04 (freshest, run last) ------------
        "synonym_expand_or": _q_synonym_expand_or,
        "synonym_expand_phrase": _q_synonym_expand_phrase,
        "shingle_term_query": _q_shingle_term,
        "high_freq_terms": _q_high_freq_terms,
        "duplicate_filter": _q_duplicate_filter,
        "boosting_query": _q_boosting_query,
        "simple_parse_query": _q_simple_parse,
        "complex_phrase": _q_complex_phrase,
        "complex_phrase_group": _q_complex_phrase_group,
        "facet_sum_value": _q_facet_sum_value,
        "repetition_stats": _q_repetition_stats,
        "ngram_contamination": _q_ngram_contamination,
        "edge_ngram_term": _q_edge_ngram_term,
        "all_group_heads": _q_all_group_heads,
        "quality_metrics": _q_quality_metrics,
        "quality_summary": _q_quality_summary,
        "span_position_range": _q_span_position_range,
        "free_text_suggest": _q_free_text_suggest,
        "free_text_suggest3": _q_free_text_suggest3,
        "limit_tokens_term": _q_limit_tokens_term,
        "length_filter_term": _q_length_filter_term,
        "code_term_query": _q_code_term,
        "code_phrase_query": _q_code_phrase,
        "sweetspot_term_query": _q_sweetspot_term,
        "leading_wildcard": _q_leading_wildcard,
        "word_breaks": _q_word_breaks,
        "word_combinations": _q_word_combinations,
        "phonetic_terms": _q_phonetic_terms,
        "phonetic_docs": _q_phonetic_docs,
        "surround_infix_w": _q_surround_infix,
        "surround_prefix_n": _q_surround_prefix_n,
        "surround_or_near": _q_surround_or_near,
        "surround_bool": _q_surround_bool,
        "slow_fuzzy_terms": _q_slow_fuzzy_terms,
        "slow_fuzzy_frac": _q_slow_fuzzy_frac,
        "ascii_fold_term": _q_ascii_fold_term,
        "payload_term_avg": _q_payload_term_avg,
        "payload_term_max": _q_payload_term_max,
        "payload_near": _q_payload_near,
        "span_payload_check": _q_span_payload_check,
        "span_near_payload_check": _q_span_near_payload_check,
        "sorted_early_topk": _q_sorted_early_topk,
        "split_index_stats": _q_split_index_stats,
        "pii_scrub": _q_pii_scrub,
        "line_dedup": _q_line_dedup,
        "block_join_top_children": _q_block_join_top_children,
        "common_grams_term": _q_common_grams_term,
        "common_grams_phrase": _q_common_grams_phrase,
        "lm_doc_quality": _q_lm_doc_quality,
        "pack_sequences": _q_pack_sequences,
        "stemmed_term_query_pl": _q_stemmed_term_pl,
        "opennlp_noun_term_query": _q_opennlp_noun_term,
        "icu_translit_term_query": _q_translit_term_query,
        "collation_sort_fr": _q_collation_sort_fr,
        "collation_range_sv": _q_collation_range_sv,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "dedup_exact": oosql.dedup_exact_sql(),
        "minhash_sigs": oosql.minhash_sigs_sql(),
        "minhash_dedup": oosql.minhash_dedup_sql(),
        "near_dup_groups": oosql.near_dup_groups_sql(0.8),
        "simhash": oosql.simhash_sql(),
        "simhash_pairs": oosql.simhash_pairs_sql(),
        "token_stats": oosql.token_stats_sql(),
        "quality_score": oosql.quality_sql(),
        "language_id": oosql.language_id_sql(),
        "doc_fingerprint": oosql.fingerprint_sql(),
        "ann_quantized": oosql.ann_quantized_sql(),
        "ann_batch": oosql.ann_batch_sql([0, 1, 2], 5),
        "ann_float": oosql.ann_float_sql([1.0] * 64),
        "ann_lsh": oosql.ann_lsh_sql(query_id=0, k=10),
        "ann_ivf": oosql.ann_ivf_sql(query_id=0, k=10),
        "ann_pq": oosql.ann_pq_sql(query_id=0, k=10),
        "embedding_dup_pairs": oosql.embedding_dup_pairs_sql(0.42),
        "embedding_dup_pairs_lsh": oosql.embedding_dup_pairs_lsh_sql(0.42),
        "semdedup": oosql.semdedup_sql(eps=0.42, n_centroids=8),
        "chunk_documents": oosql.chunk_documents_sql(chunk_chars=128, overlap=32),
        "term_freq_value": osql.term_freq_topk_sql("spark"),
        "norm_value_query": osql.norm_value_topk_sql("spark"),
        "check_index": osql.check_index_sql(),
        "grouped_facets": osql.grouped_facet_counts_sql("spark", "source", "lang"),
        "confusion_matrix": osql.confusion_matrix_sql(50, "source"),
        "cluster_sample": oosql.cluster_sample_sql(n_per_cluster=10, n_centroids=8),
        "embedding_contamination": oosql.embedding_contamination_sql(0.42, 20),
        "gopher_rules": oosql.gopher_rules_sql(),
        "c4_filters": oosql.c4_filters_sql(),
        "top_ngram_stats": oosql.top_ngram_stats_sql(),
        "event_window_counts": osql.event_window_counts_sql(),
        "event_sessions": osql.event_sessions_sql(30),
        "media_stats": oosql.media_stats_sql(),
        "frame_samples": oosql.frame_samples_sql(),
        "media_features": oosql.media_features_sql(),
        "tokenize": osql.tokenize_sql(),
        "positions": osql.positions_sql("dup"),
        "term_stats": osql.term_stats_sql(),
        "doc_norms": osql.doc_norms_sql(),
        "corpus_stats": osql.corpus_stats_sql(),
        "sha_verify": "SELECT CAST(count(*) AS BIGINT) AS n_docs,"
        " CAST(0 AS BIGINT) AS n_mismatch FROM documents",
        "term_query": osql.term_query_sql("spark"),
        "term_query_rare": osql.term_query_sql("dup"),
        "boolean_and": osql.boolean_and_sql("merge", "sort"),
        "boolean_or": osql.boolean_or_sql("hash", "dup"),
        "boolean_not": osql.boolean_not_sql("table", "window"),
        "min_should_match": osql.min_should_match_sql("hash", "merge", "scan", 2),
        "dismax": osql.dismax_sql("spark", "stream", 0.5),
        "phrase_query": osql.phrase_sql("table", "hash"),
        "expression_topk": osql.expression_topk_sql(
            "spark", "score * sqrt(field_length) + 0.25 * field_length"
        ),
        "facet_taxonomy": osql.facet_taxonomy_sql("spark", ["lang", "source"]),
        "block_join_avg": osql.block_join_sql("hash", 10, "avg"),
        "block_join_children": osql.block_join_children_sql("hash", 10),
        "join_query_max": osql.join_query_sql("dup", "source", "max"),
        "join_query_total": osql.join_query_sql("dup", "source", "total"),
        "sort_rescore": osql.sort_rescore_sql("spark", 50, 10),
        "term_vector": osql.term_vector_sql(0),
        "classic_term_query": osql.classic_term_query_sql("spark"),
        "classic_phrase_query": osql.classic_phrase_sql("table", "hash"),
        "lm_term_query": osql.lm_term_query_sql("spark"),
        "dfr_term_query": osql.dfr_term_query_sql("spark"),
        "nb_classify": osql.nb_classify_sql(50, "source"),
        "knn_classify": osql.knn_classify_sql(0, 10),
        "spatial_bbox": osql.spatial_bbox_sql(-30.0, 30.0, -60.0, 60.0),
        "spatial_distance_topk": osql.spatial_distance_topk_sql(48.85, 2.35, 10),
        "spatial_distance_join": osql.spatial_distance_join_sql(500.0),
        "dfr_ifb2_term_query": osql.dfr_generic_term_query_sql(
            "spark", basic_model="if", after_effect="b", normalization="h2"
        ),
        "spatial_polygon": osql.spatial_polygon_sql(_POLY_WKT),
        "dfr_pl2_term_query": osql.dfr_generic_term_query_sql(
            "spark", basic_model="p", after_effect="l", normalization="h2"
        ),
        "dfr_dlz_term_query": osql.dfr_generic_term_query_sql(
            "spark", basic_model="d", after_effect="l", normalization="z"
        ),
        "dfr_bel1_term_query": osql.dfr_generic_term_query_sql(
            "spark", basic_model="be", after_effect="l", normalization="h1"
        ),
        "dfr_gl1_term_query": osql.dfr_generic_term_query_sql(
            "spark", basic_model="g", after_effect="l", normalization="h1"
        ),
        "lm_jm_term_query": osql.lm_jm_term_query_sql("spark"),
        "ib_ll_term_query": osql.ib_term_query_sql("spark", dist="ll"),
        "ib_spl_term_query": osql.ib_term_query_sql("spark", dist="spl"),
        "percolate": osql.percolate_sql(),
        "synonym_index_term": osql.synonym_index_term_sql(_SYN_MAP, "join"),
        "synonym_expand_or": osql.boolean_or_sql("merge", "join"),
        "synonym_expand_phrase": osql.multi_phrase_sql(["fast"], ["merge", "join"]),
        "shingle_term_query": osql.shingle_term_query_sql("table hash", 2),
        "high_freq_terms": osql.high_freq_terms_sql(10, "df"),
        "duplicate_filter": osql.duplicate_filter_sql("spark", "source", "first"),
        "boosting_query": osql.boosting_query_sql("spark", "merge", 0.5),
        "simple_parse_query": osql.simple_parse_sql("spark", "merge", "batch"),
        "standard_parse_query": osql.standard_parse_sql("spark", "merge", "batch"),
        "stemmed_term_query_de": osql.stemmed_term_class_sql(
            _snowball_de_class("tabl")
        ),
        "stemmed_term_query_da": osql.stemmed_term_class_sql(
            _snowball_da_class("tabl")
        ),
        "complex_phrase": osql.complex_phrase2_sql("table", "ha", 0),
        "complex_phrase_group": osql.complex_phrase3_sql(
            "fast", ["merge", "join"], "ta", 4
        ),
        "facet_sum_value": osql.facet_sum_value_sql("spark", "lang", "n_chars"),
        "repetition_stats": oosql.repetition_stats_sql(3),
        "ngram_contamination": oosql.ngram_contamination_sql(3, 50),
        "edge_ngram_term": osql.edge_ngram_term_sql("spar", 2, 4),
        "all_group_heads": osql.all_group_heads_sql("spark", "lang"),
        "quality_metrics": osql.quality_metrics_sql(
            {"q_dup": "dup", "q_spark": "spark"}, 10, 3
        ),
        "quality_summary": osql.quality_summary_sql(
            {"q_dup": "dup", "q_spark": "spark"}, 10, 3
        ),
        "span_position_range": osql.span_position_range_sql("table", 5, 20),
        "free_text_suggest": osql.free_text_suggest_sql(["table"], "ha", 5, 2),
        "free_text_suggest3": osql.free_text_suggest_sql(["value", "table"], "", 5, 3),
        "limit_tokens_term": osql.limit_tokens_term_query_sql("table", 64),
        "length_filter_term": osql.length_filter_term_query_sql("table", 4, 8),
        "code_term_query": osql.code_term_query_sql("usr"),
        "code_phrase_query": osql.code_phrase_query_sql("get", "set"),
        "sweetspot_term_query": osql.sweetspot_term_query_sql(
            "spark", ln_min=2, ln_max=8, steepness=0.5, tf_base=1.5, tf_min=2.0
        ),
        "leading_wildcard": osql.leading_wildcard_sql("ark"),
        "word_breaks": osql.word_breaks_sql(
            ("tablescan", "sparkmergesort", "keyvalue", "nosuchword"),
            max_changes=2,
            min_break_length=2,
        ),
        "word_combinations": osql.word_combinations_sql(
            ("win", "dow", "cust", "omer", "big"), max_changes=2
        ),
        "chained_filter_xor": osql.chained_filter_xor_sql("en", "table", "src1"),
        "custom_score_query": osql.custom_score_sql("table", k=10),
        "scale_function_query": osql.scale_function_sql("table", 0.0, 1.0, k=10),
        "grouped_topk_expr": osql.grouped_topk_expr_sql(
            "hash", "CAST(floor(n.fl / 16.0) AS BIGINT)", 10, 3
        ),
        "hybrid_rrf": osql.hybrid_rrf_sql("table", [1.0] * 64),
        "dsir_weights": oosql.dsir_weights_sql("lang = 'en'", 4096),
        "exact_substr_spans": oosql.exact_substr_spans_sql(k=8),
        "dsir_resample": oosql.gumbel_topk_sample_sql(50, "lang = 'en'", 4096),
        "pk_split_search": osql.pk_split_search_sql("table", "d.lang = 'en'", k=10),
        "phrase_snippets": osql.phrase_snippets_sql("table", "hash", k=10),
        "time_limited_topk": osql.time_limited_topk_sql("table", 300, k=10),
        "direct_spell": osql.direct_spell_sql(
            ("tabel", "windoe", "strem", "batk", "table", "xyzq"), num_sug=5
        ),
        "direct_spell_osa": osql.direct_spell_sql(
            ("tabel", "windoe", "strem", "batk", "table", "xyzq"),
            num_sug=5,
            transpositions=True,
        ),
        "fuzzy_terms_osa": osql.fuzzy_terms_sql("scann", 2, transpositions=True),
        "uax29_term_query": osql.uax29_term_query_sql("mrg:srt"),
        "uax29_mid_terms": osql.uax29_mid_terms_sql(),
        "ja_term_query": osql.ja_term_query_sql("検索"),
        "zh_term_query": osql.zh_term_query_sql("检索"),
        "ja_phrase_query": osql.ja_phrase_query_sql("形態素", "解析"),
        "fuzzy_osa_topk": osql.fuzzy_osa_topk_sql("scann"),
        "phonetic_terms": osql.phonetic_terms_sql("merj"),
        "phonetic_docs": osql.phonetic_docs_sql("merj"),
        "surround_infix_w": osql.span_near_sql("table", "hash", 2, in_order=True),
        "surround_prefix_n": osql.span_near_sql("table", "hash", 1, in_order=False),
        "surround_or_near": osql.span_or_near_sql("merge", "sort", "hash", 1),
        "surround_bool": osql.boolean_and_sql("spark", "merge"),
        "slow_fuzzy_terms": osql.slow_fuzzy_terms_sql("scann", 3.0),
        "slow_fuzzy_frac": osql.slow_fuzzy_terms_sql("stream", 0.5),
        "ascii_fold_term": osql.term_query_sql("spark"),
        "payload_term_avg": osql.payload_term_query_sql("spark", fn="avg"),
        "payload_term_max": osql.payload_term_query_sql("table", fn="max"),
        "payload_near": osql.payload_near_query_sql("table", "hash", 3),
        "span_payload_check": osql.span_payload_check_sql("table", 2.5),
        "span_near_payload_check": osql.span_near_payload_check_sql("table", "hash", 3, 2.5, 1.5),
        "sorted_early_topk": osql.sorted_early_topk_sql(10),
        "split_index_stats": osql.split_index_stats_sql(),
        "pii_scrub": oosql.pii_scrub_sql(),
        "line_dedup": oosql.line_dedup_sql(),
        "block_join_top_children": osql.block_join_top_children_sql("hash", 10, "avg", 10, 3),
        "common_grams_term": osql.common_grams_term_sql("the_batch"),
        "common_grams_phrase": osql.common_grams_phrase_sql("hash_the", "the_batch"),
        "lm_doc_quality": oosql.lm_doc_quality_sql(),
        "pack_sequences": oosql.pack_sequences_sql(512),
        "stratified_split": oosql.stratified_split_sql(),
        "temperature_mix": oosql.temperature_mix_sql(),
        "ngram_term_query": osql.ngram_term_sql("ndow", 3, 4),
        "substring_search": osql.substring_docs_sql("ustomer"),
        # XML-parsed queries mirror their programmatic twins' oracles
        "xml_boolean_query": osql.boolean_and_sql("table", "hash"),
        "xml_dismax_query": osql.dismax_sql("merge", "sort", 0.1),
        "xml_span_near": osql.span_near_sql("table", "hash", 2, True),
        "sampled_facets": osql.sampled_facet_sql("table", "lang", 20),
        "fuzzy_like_this_terms": osql.fuzzy_like_this_terms_sql("tabel data1", 0.4, 0, 20),
        "fuzzy_like_this_topk": osql.fuzzy_like_this_topk_sql("tabel data1", 0.4, 0, 20, 10),
        "domain_cap": oosql.domain_cap_sql(10),
        "highlight": osql.highlight_sql("table", "hash", 10, 10),
        "highlight_snippets": osql.highlight_snippets_sql("table", "hash", 10, 10),
        "postings_highlight": osql.postings_highlight_sql("table", "hash", 10, 2),
        "facet_ranges": osql.facet_ranges_sql(
            "spark", [("short", 0, 20), ("mid", 20, 40), ("long", 40, 100000)]
        ),
        "group_distinct": osql.group_distinct_sql("spark", "lang", "source"),
        "drill_sideways": osql.drill_sideways_sql(
            "spark", {"lang": "en", "source": "src1"}
        ),
        "suggest": osql.suggest_sql("sparc", 5, 2, 1),
        "prefix_suggest": osql.prefix_suggest_sql("s", 5),
        "analyzing_suggest": osql.analyzing_suggest_sql("merge", 5),
        "doc_value_suggest": osql.doc_value_suggest_sql("merge", 5),
        "fuzzy_suggest": osql.fuzzy_suggest_sql("marge", 5, 1),
        # infix keys pre-analyzed with suggest_stop_analyze:
        #   "sort ta" -> (["sort"], "ta"); "merge window " -> (["merge",
        #   "window"], None); "customer" -> ([], "customer");
        #   "filter str" -> (["filter"], "str")
        "infix_suggest": osql.infix_suggest_sql(["sort"], "ta", 5),
        "infix_suggest_any": osql.infix_suggest_sql(
            ["merge", "window"], None, 5, all_required=False
        ),
        "infix_suggest_highlight": osql.infix_highlight_sql(["sort"], "ta", 5),
        "blended_infix_linear": osql.blended_infix_sql([], "customer", "linear", 5),
        "blended_infix_reciprocal": osql.blended_infix_sql(
            ["filter"], "str", "reciprocal", 5
        ),
        "function_query": osql.boost_by_value_sql("spark"),
        "facet_counts": osql.facet_sql("spark", "lang"),
        "filtered_query": osql.filtered_query_sql("spark", "lang", "en"),
        "numeric_range_query": osql.numeric_range_query_sql("spark", 20, 30),
        "field_term_query": osql.multifield_term_query_sql("merge", "t_"),
        "multi_field_dismax": osql.multifield_dismax_sql("spark", 0.3),
        "per_field_sim_dismax": osql.per_field_sim_dismax_sql("spark", 0.3),
        "multi_field_boolean": osql.multifield_boolean_sql("spark", "merge"),
        "sort_by_field": osql.sort_by_field_sql("spark"),
        "sort_by_meta_desc": osql.sort_by_meta_desc_sql("spark", "lang"),
        "grouped_topk": osql.grouped_topk_sql("hash", "source", 10, 3),
        "search_after": osql.search_after_sql("spark", page=2, k=10),
        "stored_fields": osql.stored_fields_sql([0, 1, 2, 3, 4]),
        "sort_search_after": osql.sort_search_after_sql("spark", page=2, k=10),
        "rescore": osql.rescore_sql("hash", "table", "hash", 1.0, 2.0, 50, 10),
        "hit_count": osql.hit_count_sql("hash", "dup"),
        "mlt_terms": osql.mlt_terms_sql(0, 25, 2, 5),
        "mlt_topk": osql.mlt_topk_sql(0, 25, 2, 5),
        "common_terms_split": osql.common_terms_split_sql(
            ["dup", "hash", "spark", "merge"], 0.1
        ),
        "span_near_ordered": osql.span_near_sql("table", "hash", 3, True),
        "span_near_unordered": osql.span_near_sql("table", "hash", 3, False),
        "span_near3_ordered": osql.span_near3_sql("table", "hash", "scan", 12),
        "span_first": osql.span_first_sql("table", 15),
        "span_not": osql.span_not_sql("table", "hash", 6, "scan"),
        "span_or_near": osql.span_or_near_sql("table", "merge", "hash", 8),
        "span_near_scored": osql.span_near_scored_sql("table", "hash", 4),
        "span_near3_unordered": osql.span_near3_unordered_sql(
            "table", "hash", "scan", 10
        ),
        "sloppy_phrase": osql.sloppy_phrase_hits_sql("table", "hash", 2),
        "multi_phrase": osql.multi_phrase_sql(["table"], ["hash", "scan"]),
        "regexp_terms": osql.regexp_terms_sql("s.+a.*"),
        "match_all_docs": osql.match_all_sql(),
        "field_value_filter": osql.field_value_filter_sql("spark", "source"),
        "prefix_docs": osql.prefix_docs_sql("s"),
        "wildcard_terms": osql.wildcard_terms_sql("^s.*a.*$"),
        "fuzzy_terms": osql.fuzzy_terms_sql("scann", 2),
        "term_range": osql.term_range_sql("p", "t"),
        "stemmed_term_query_pl": osql.pl_term_query_sql("indeks"),
        "opennlp_noun_term_query": osql.opennlp_term_query_sql("documents"),
        "icu_translit_term_query": osql.translit_term_query_sql("katálogos"),
        "collation_sort_fr": osql.collation_sort_sql("fr"),
        "collation_range_sv": osql.collation_range_sql("sv", "HOT", "HÅT"),
    }
