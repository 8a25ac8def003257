"""Association facets (TaxonomyFacetSumInt32Associations),
repetition_stats (C4/Gopher duplicate n-gram fractions), and
ngram_contamination (GPT-3 13-gram overlap) — brute-force verified."""

from __future__ import annotations

import pytest

from lucenenet_spark.ops import text as tx


def test_repetition_stats_bruteforce(spark):
    rows = [
        (0, "spark spark spark spark"),          # all dup unigrams
        (1, "merge join merge join merge"),      # repeated bigram
        (2, "alpha beta gamma delta"),           # no repetition
        (3, ""),                                  # empty
        (4, "one two"),                           # too short for 3-grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.asDict() for r in tx.repetition_stats(df, max_n=3).collect()}
    assert got[0]["total_1"] == 4 and got[0]["distinct_1"] == 1
    assert got[0]["dup_frac_1"] == pytest.approx(0.75)
    # doc1 bigrams: mj jm mj jm -> 4 total, 2 distinct
    assert got[1]["total_2"] == 4 and got[1]["distinct_2"] == 2
    assert got[1]["dup_frac_2"] == pytest.approx(0.5)
    assert got[2]["dup_frac_1"] == got[2]["dup_frac_2"] == got[2]["dup_frac_3"] == 0.0
    assert got[3]["total_1"] == 0 and got[3]["dup_frac_1"] == 0.0
    assert got[4]["total_3"] == 0 and got[4]["dup_frac_3"] == 0.0


def test_ngram_contamination_bruteforce(spark):
    bench = spark.createDataFrame(
        [(100, "the secret eval answer is here")], "doc_id long, text string"
    )
    rows = [
        (0, "the secret eval answer is leaked twice secret eval answer"),
        (1, "completely clean document text"),
        (2, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r.asDict() for r in tx.ngram_contamination(df, bench, n=3).collect()}
    # doc0 3-gram occurrences: 8 grams; contaminated ones: 'the secret
    # eval' x1, 'secret eval answer' x2, 'eval answer is' x1 -> 4
    assert got[0]["n_grams"] == 8 and got[0]["n_contaminated"] == 4
    assert got[0]["contamination_frac"] == pytest.approx(0.5)
    assert got[1]["n_contaminated"] == 0
    assert got[2]["n_grams"] == 0 and got[2]["contamination_frac"] == 0.0


def test_facet_sum_value(spark):
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search import collectors as coll
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [
        (0, "spark rules", "en", 10),
        (1, "spark tools", "en", 20),
        (2, "spark aussi", "fr", 5),
        (3, "nothing here", "en", 99),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, v long")
    s = IndexSearcher(
        build_index(
            spark,
            df,
            CorpusSpec(text_col="text", id_col="doc_id", meta_cols=("lang", "v")),
        )
    )
    got = [
        (r.lang, r.n_docs, r.sum_value)
        for r in coll.facet_sum_value(s, TermQuery(term="spark"), "lang", "v").collect()
    ]
    assert got == [("en", 2, 30), ("fr", 1, 5)]


def test_pii_scrub(spark):
    from lucenenet_spark.ops.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@foo.io or call +1 (555) 123-4567 now"),
            (2, "server at 192.168.0.1 only"),
            (3, "clean text"),
        ],
        "doc_id long, text string",
    )
    got = {r.id: r for r in pii_scrub(df).collect()}
    assert got[1].n_email == 1 and got[1].n_phone == 1 and got[1].n_ipv4 == 0
    assert "<EMAIL>" in got[1].clean_text and "<PHONE>" in got[1].clean_text
    assert "a.b+c@foo.io" not in got[1].clean_text
    assert got[2].n_ipv4 == 1 and "<IPV4>" in got[2].clean_text
    assert got[3].clean_text == "clean text"


def test_line_dedup(spark):
    from lucenenet_spark.ops.text import line_dedup

    rows = [(i, f"unique {i}\nSHARED FOOTER\nbody {i}") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in line_dedup(df, min_docs=2, min_doc_frac=0.0).collect()}
    for i in range(10):
        assert got[i].n_lines == 3 and got[i].n_kept == 2
        assert got[i].clean_text == f"unique {i}\nbody {i}"


def test_lm_doc_quality(spark):
    """Natural repeated phrasing scores higher than shuffled gibberish
    under the corpus bigram LM; counts are exact."""
    from lucenenet_spark.ops.text import lm_doc_quality

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in range(8)]
    rows.append((8, "dog the jumps quick lazy fox brown over the"))
    rows.append((9, "x"))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: r for r in lm_doc_quality(df).collect()}
    assert got[0].n_scored == 8  # 9 tokens -> 8 bigrams
    assert got[9].n_scored == 0 and got[9].avg_logprob == 0.0
    # the natural doc's transitions are all seen 8-9x; the shuffled
    # doc backs off on most transitions -> strictly lower mean logprob
    assert got[0].avg_logprob > got[8].avg_logprob


def test_pack_sequences(spark):
    """Packing invariants: offsets stay inside the budget, sequence
    ids are non-decreasing in doc order per shard, token totals are
    conserved, and layout is contiguous (cum math)."""
    from lucenenet_spark.ops.sampling import pack_sequences

    rows = [(i, " ".join(f"w{j}" for j in range(5 + (i * 7) % 30)),
             "en" if i % 2 else "fr") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = sorted(
        pack_sequences(df, budget=64).collect(), key=lambda r: (r.shard, r.id)
    )
    total = sum(r.n_tokens for r in got)
    assert total == sum(5 + (i * 7) % 30 for i in range(40))
    for shard in ("en", "fr"):
        cum = 0
        for r in [x for x in got if x.shard == shard]:
            assert r.seq == cum // 64 and r.seq_offset == cum % 64
            assert 0 <= r.seq_offset < 64
            cum += r.n_tokens


def test_stratified_split(spark):
    """Split partitions every doc exactly once, is deterministic, and
    respects the hash thresholds."""
    from lucenenet_spark.ops.sampling import stratified_split

    rows = [(i, "a b c", "en" if i % 3 else "de") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = stratified_split(df).collect()
    assert sum(r.n_docs for r in got) == 300
    assert {r.split for r in got} == {"train", "val", "test"}
    by_split = {}
    for r in got:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
    # 80/10/10 within hash noise at n=300
    assert by_split["train"] > by_split["val"]
    assert by_split["train"] > by_split["test"]
    again = stratified_split(df).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))


def test_temperature_mix(spark):
    """sqrt flattening: the share ratio between strata equals the
    sqrt ratio of token counts (integer-exact), shares sum to <= 1e6
    and within rounding of it."""
    from lucenenet_spark.ops.sampling import temperature_mix

    rows = (
        [(i, " ".join(["tok"] * 100), "big") for i in range(90)]
        + [(1000 + i, " ".join(["tok"] * 100), "small") for i in range(10)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    got = {r.stratum: r for r in temperature_mix(df).collect()}
    assert got["big"].n_tokens == 9000 and got["small"].n_tokens == 1000
    # sqrt(9000)/sqrt(1000) = 3 exactly
    assert abs(got["big"].share_ppm / got["small"].share_ppm - 3.0) < 1e-3
    s = got["big"].share_ppm + got["small"].share_ppm
    assert 999990 <= s <= 1000000


def test_domain_cap(spark):
    """Per-domain cap: keeps exactly min(cap, n) per domain, the kept
    set is hash-deterministic (stable across calls), and hrank is the
    md5-prefix order."""
    import hashlib

    from lucenenet_spark.ops.sampling import domain_cap

    rows = [(i, f"d{i % 3}") for i in range(90)]  # 30 docs per domain
    df = spark.createDataFrame(rows, "doc_id long, source string")
    got = domain_cap(df, cap=7).collect()
    per = {}
    for r in got:
        per.setdefault(r.domain, []).append((r.hrank, r.docid))
    assert {d: len(v) for d, v in per.items()} == {"d0": 7, "d1": 7, "d2": 7}

    def h(d):
        return int(hashlib.md5(str(d).encode()).hexdigest()[:15], 16)

    for d, kept in per.items():
        ids = [i for i in range(90) if f"d{i % 3}" == d]
        want = sorted(ids, key=lambda i: (h(i), i))[:7]
        assert [doc for _, doc in sorted(kept)] == want
    again = domain_cap(df, cap=7).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
    # a domain under the cap keeps everything
    assert domain_cap(df, cap=100).count() == 90


def test_hybrid_rrf_fusion_math(spark):
    """A doc in both lists sums both contributions; single-list docs
    get exactly one; ranks use 0 for 'absent'."""
    from lucenenet_spark.index.builder import CorpusSpec, build_index
    from lucenenet_spark.search.searcher import IndexSearcher
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.ops.hybrid import hybrid_rrf

    docs = spark.createDataFrame(
        [("r", str(i), "c", "alpha beta" if i < 2 else "gamma delta")
         for i in range(4)],
        "repo string, path string, commit string, content string",
    )
    idx = build_index(spark, docs, CorpusSpec(order_cols=("repo", "path", "commit"))).cache()
    s = IndexSearcher(idx)
    emb = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.9, 0.1]), (3, [0.5, 0.5])],
        "vec_id long, embedding array<float>",
    )
    out = {r.id: r for r in hybrid_rrf(
        s, emb, TermQuery(term="alpha"), [1.0, 0.0], n_each=2, k=4, k0=60
    ).collect()}
    # BM25 list = docs {0,1}; ANN top-2 = ids {0,2}
    assert out[0].r_bm25 > 0 and out[0].r_ann > 0
    assert abs(out[0].rrf - (1.0 / (60 + out[0].r_bm25) + 1.0 / (60 + out[0].r_ann))) == 0.0
    assert out[1].r_ann == 0 and abs(out[1].rrf - 1.0 / (60 + out[1].r_bm25)) == 0.0
    assert out[2].r_bm25 == 0 and abs(out[2].rrf - 1.0 / (60 + out[2].r_ann)) == 0.0
    assert 3 not in out


def test_dsir_weights_favor_target_distribution(spark):
    from lucenenet_spark.ops.sampling import dsir_weights
    from pyspark.sql import functions as F

    rows = (
        [(i, "quantum flux capacitor entangle", "tgt") for i in range(10)]
        + [(i + 10, "mundane filler words everywhere", "src") for i in range(10)]
        + [(20, "quantum flux capacitor entangle", "src"),  # target-like text
           (21, "mundane filler words everywhere", "src"),  # source-like text
           (22, None, "src")]                                # null text -> 0
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, grp string")
    out = {r.id: r.weight_fp for r in dsir_weights(
        df, F.col("grp") == "tgt", n_buckets=512).collect()}
    assert len(out) == 23
    # the doc that looks like the target outweighs the one that doesn't
    assert out[20] > out[21]
    assert out[22] == 0


def test_exact_substr_spans_merge_and_threshold(spark):
    from lucenenet_spark.ops.text import exact_substr_spans

    shared = "one two three four"  # 4-token run repeated across docs
    rows = [
        (0, f"{shared} unique0 tailA tailB tailC"),
        (1, f"prefix1 {shared} tailX tailY tailZ"),
        (2, "totally different words here nothing repeats at all ok"),
        # same-doc repetition also counts (count > 1 overall)
        (3, "alpha beta gamma delta pad1 pad2 alpha beta gamma delta"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {}
    for r in exact_substr_spans(df, k=4).collect():
        out.setdefault(r.id, []).append((r.span_start, r.span_end))
    # the shared 4-token window marks exactly its token range
    assert out[0] == [(0, 4)]
    assert out[1] == [(1, 5)]
    assert 2 not in out
    # same-doc repeat: both occurrences flagged
    assert out[3] == [(0, 4), (6, 10)]


def test_gumbel_topk_sample_is_deterministic_and_weight_sensitive(spark):
    from lucenenet_spark.ops.sampling import gumbel_topk_sample

    # two strata of ids with wildly different weights: the heavy
    # stratum should dominate the sample
    rows = [(i, 5_000_000) for i in range(50)] + [
        (i + 50, -5_000_000) for i in range(50)
    ]
    w = spark.createDataFrame(rows, "id long, weight_fp long")
    a = [(r.id, r.key_fp) for r in gumbel_topk_sample(w, 20).collect()]
    b = [(r.id, r.key_fp) for r in gumbel_topk_sample(w, 20).collect()]
    assert a == b  # pure function of (seed, id, weight)
    heavy = sum(1 for i, _ in a if i < 50)
    assert heavy >= 18  # e^10 odds ratio: light stratum ~never wins
    # different seed -> different permutation (keys change)
    c = [(r.id, r.key_fp) for r in gumbel_topk_sample(w, 20, seed="other").collect()]
    assert dict(a) != dict(c)
