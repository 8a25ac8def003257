"""OSA (restricted Damerau-Levenshtein) distance — the reference's
internal edit distance (``Suggest/Spell/LuceneLevenshteinDistance.cs``,
``Util/Automaton/LevenshteinAutomata.cs`` transpositions=true).

Covers:
- the ``_osa`` DP against hand-checked values, including the
  discriminators where OSA != plain Levenshtein and != full DL;
- the OSA-vs-full-DL corpus sweep that licenses DuckDB's
  ``damerau_levenshtein`` (full DL) as the oracle mirror for the
  ``direct_spell_osa`` / ``fuzzy_terms_osa`` entries: full DL == OSA
  on every in-band (fixture word, dictionary term) pair;
- DirectSpellChecker with the reference-default internal distance
  ("teh" -> "the" at one edit, score 1 - 1/3);
- FuzzyQuery transpositions=true: the three predicate paths agree,
  and a transposed term matches at one edit where plain Levenshtein
  needs two.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.search.queries import FuzzyQuery, _levenshtein, _osa


def _full_dl(a: str, b: str) -> int:
    """Unrestricted Damerau-Levenshtein (alphabet-tracking DP) — what
    DuckDB's damerau_levenshtein computes; edits MAY land between a
    transposed pair (dl('ca','abc') = 2 vs osa = 3)."""
    da: dict[str, int] = {}
    la, lb = len(a), len(b)
    maxd = la + lb
    d = [[maxd] * (lb + 2) for _ in range(la + 2)]
    d[1][1] = 0
    for i in range(1, la + 1):
        d[i + 1][1] = i
    for j in range(1, lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            l_ = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,
                d[i + 1][j] + 1,
                d[i][j + 1] + 1,
                d[k][l_] + (i - k - 1) + 1 + (j - l_ - 1),
            )
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


CASES = [
    ("", "", 0),
    ("a", "", 1),
    ("", "abc", 3),
    ("teh", "the", 1),  # adjacent transposition = 1 edit
    ("ab", "ba", 1),
    ("tabel", "table", 1),
    ("scann", "scan", 1),
    ("kitten", "sitting", 3),
    ("ca", "abc", 3),  # OSA forbids editing inside the swapped pair
    ("abcdef", "abcdef", 0),
    ("badc", "abcd", 2),  # two independent transpositions
    ("abc", "cba", 2),  # swap + substitute under OSA
]


@pytest.mark.parametrize("a,b,want", CASES)
def test_osa_known_values(a, b, want):
    assert _osa(a, b) == want
    assert _osa(b, a) == want  # symmetric


def test_osa_vs_levenshtein_bounds():
    words = ["table", "tabel", "scan", "scann", "the", "teh", "merge",
             "mrege", "stream", "windoe", "batk", "xyzq", "a", ""]
    for a in words:
        for b in words:
            osa, lev = _osa(a, b), _levenshtein(a, b)
            assert osa <= lev <= 2 * osa or (osa == lev == 0)
            assert _full_dl(a, b) <= osa


def test_osa_discriminates_from_full_dl():
    # the canonical divergence: transpose then insert between the pair
    assert _osa("ca", "abc") == 3
    assert _full_dl("ca", "abc") == 2


# --------------------------------------------------------------- sweep

FIXTURE_WORDS = ["tabel", "windoe", "strem", "batk", "table", "xyzq", "scann"]


def _band_sweep(terms: list[str], words: list[str]) -> int:
    """Assert the OSA/full-DL agreement the DuckDB oracle relies on:
    the engines only need to agree on the <= max_edits (=2) decision
    band — since DL <= OSA always, any pair with DL > 2 is dropped by
    BOTH engines, and where DL <= 2 the values must be EQUAL (the dist
    feeds scoring and the ed1/ed2 two-pass rule). Divergence needs an
    edit BETWEEN a transposed pair, which pushes both distances past
    2 — absent from these dictionaries' 2-edit neighborhoods."""
    checked = 0
    for w in words:
        for t in terms:
            if abs(len(t) - len(w)) > 2:
                continue
            dl = _full_dl(t, w)
            if dl > 2:
                continue
            assert _osa(t, w) == dl, (w, t)
            checked += 1
    return checked


def test_osa_equals_full_dl_on_corpus_band(spark_index):
    terms = [r["term"] for r in spark_index.term_stats.select("term").collect()]
    assert _band_sweep(terms, FIXTURE_WORDS + ["hsah"]) > 0


def test_osa_equals_full_dl_on_sf0001_band(spark):
    """The license sweep on the real driver corpus (sf0.001 documents
    table — same generator family as the sf0.01 the driver validates
    at): every in-band (fixture word, dictionary term) pair agrees."""
    import os

    path = "/root/testdata/sf0.001/documents.parquet"
    if not os.path.exists(path):
        pytest.skip("testdata not present")
    from lucenenet_spark.index import CorpusSpec, build_index

    docs = spark.read.parquet(path)
    idx = build_index(
        spark,
        docs,
        CorpusSpec(text_col="text", id_col="doc_id", meta_cols=("lang", "source")),
    )
    terms = [r["term"] for r in idx.term_stats.select("term").collect()]
    assert _band_sweep(terms, FIXTURE_WORDS + ["scann"]) >= 8


# ------------------------------------------------- DirectSpellChecker

def test_direct_spell_internal_distance_transposition(spark):
    """Reference-default LuceneLevenshteinDistance: the 'teh'->'the'
    class of typo (adjacent swap) is ONE edit. 'the' itself is a
    stopword (absent from the dictionary), so the fixture uses
    'stroe' -> 'store': OSA 1 (score 1 - 1/5), plain Levenshtein 2
    (score 1 - 2/5)."""
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search import spell
    from lucenenet_spark.search.searcher import IndexSearcher

    rows = [(0, "store front data"), (1, "store shelves stock"),
            (2, "strong coffee aroma")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = build_index(
        spark, docs, CorpusSpec(text_col="text", id_col="doc_id")
    ).cache()
    s = IndexSearcher(idx)
    out = spell.direct_spell_suggest(
        s, ["stroe"], num_sug=3, max_query_frequency=1.0
    ).collect()
    assert out, "expected suggestions for 'stroe'"
    top = out[0]
    assert top["suggestion"] == "store"
    assert top["score"] == pytest.approx(1.0 - 1.0 / 5.0, abs=1e-6)
    # the plain-Levenshtein dialect demotes it to distance 2
    out_lev = spell.direct_spell_suggest(
        s, ["stroe"], num_sug=3, max_query_frequency=1.0,
        distance="levenshtein",
    ).collect()
    by_sug = {r["suggestion"]: r for r in out_lev}
    assert by_sug["store"]["score"] == pytest.approx(1.0 - 2.0 / 5.0, abs=1e-6)


def test_direct_spell_unknown_dialect_raises(spark_index):
    from lucenenet_spark.search import spell
    from lucenenet_spark.search.searcher import IndexSearcher

    with pytest.raises(ValueError):
        spell.direct_spell_suggest(
            IndexSearcher(spark_index), ["tabel"], distance="osa-typo"
        ).collect()


# ------------------------------------------------------- FuzzyQuery

def test_fuzzy_transpositions_paths_agree(spark_index):
    """dict (pandas-UDF-backed Column), python, and vector predicates
    return the same expansion set under transpositions=true."""
    import pandas as pd

    q = FuzzyQuery(term="hsah", max_edits=2, transpositions=True)
    terms = [r["term"] for r in spark_index.term_stats.select("term").collect()]
    via_dict = {
        r["term"]
        for r in spark_index.term_stats.where(q.dict_predicate())
        .select("term")
        .collect()
    }
    via_python = {t for t in terms if q.python_predicate(t)}
    mask = q.vector_predicate(pd.Series(terms))
    via_vector = {t for t, m in zip(terms, mask) if m}
    assert via_dict == via_python == via_vector
    # swap+insert neighbors of 'hsah' present in the code corpus
    assert "hash2" in via_dict and "hash4" in via_dict


def test_fuzzy_transposition_one_edit(spark):
    """'tabel' ~1 with transpositions matches 'table'; without, the
    swap costs 2 edits and misses at max_edits=1 (FuzzyQuery.cs:45
    defaultTranspositions=true)."""
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "table scan"), (1, "marble maker")], "doc_id long, text string"
    )
    s = IndexSearcher(
        build_index(spark, docs, CorpusSpec(text_col="text", id_col="doc_id")).cache()
    )
    hits_osa = s.search(FuzzyQuery(term="tabel", max_edits=1), 10)
    assert [h.docid for h in hits_osa] == [0]
    hits_lev = s.search(
        FuzzyQuery(term="tabel", max_edits=1, transpositions=False), 10
    )
    assert hits_lev == []
