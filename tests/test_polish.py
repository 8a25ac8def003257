"""Stempel-role Polish light stemmer (analysis/polish.py) — pinned
two-step suffix stripper (reference ``src/Lucene.Net.Analysis.Stempel``
wraps Egothor trained tables; the model files are out of scope, the
stemming role is kept). Fixtures pin the ruleset; the index-level test
drives CorpusSpec(stem_lang='pl') end-to-end.
"""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.polish import analyze_pl, stem_pl

# Inflectional families that must conflate to one index term.
CONFLATION_GROUPS = {
    # -acja nominalization + its full case paradigm
    "inform": ["informacja", "informacji", "informacją", "informacjami",
               "informacjach", "informacje"],
    # lemma ends in -em: the higher ("em", 5) guard keeps the bare noun
    "system": ["system", "systemy", "systemów", "systemem", "systemie",
               "systemach", "systemom", "systemowy", "systemowe"],
    # noun + gerund + conjugated -ować verb all meet at the root
    "indeks": ["indeks", "indeksy", "indeksów", "indeksu", "indeksie",
               "indeksowanie", "indeksowania", "indeksowaniu",
               "indeksuje", "indeksują", "indeksować"],
    "dokument": ["dokument", "dokumenty", "dokumentów", "dokumentami",
                 "dokumentach"],
    "przetwarz": ["przetwarza", "przetwarzać", "przetwarzanie",
                  "przetwarzania", "przetwarzane", "przetwarzamy"],
    # adjective agreement + the -o adverb
    "szybk": ["szybki", "szybka", "szybkie", "szybkich", "szybko"],
    "wyszukiw": ["wyszukiwanie", "wyszukiwania", "wyszukiwaniu"],
    "dan": ["dane", "danych", "danymi"],
    # -ń genitive plural of the -nie gerund
    "zapyt": ["zapytanie", "zapytania", "zapytań", "zapytaniem"],
    # -ik is stripped as a diminutive class: consistent within family
    "wyn": ["wynik", "wyniki", "wyników", "wynikach"],
    # lemma ends in -iom/-om: the higher guards keep the bare noun
    "poziom": ["poziom", "poziomy", "poziomie"],
}


@pytest.mark.parametrize("stem,words", sorted(CONFLATION_GROUPS.items()))
def test_conflation_groups(stem, words):
    assert {stem_pl(w) for w in words} == {stem}


def test_pinned_singletons():
    # documented light-stemmer limits, pinned so they never drift:
    # locative palatalization (t->c before -ie) is NOT demutated
    assert stem_pl("dokumencie") == "dokumenc"
    # verb 1pl -amy collides with noun plural -amy; guard 5 keeps the
    # 7-char form unstripped down to the verb stem
    assert stem_pl("używamy") == "używam"
    assert stem_pl("używa") == "używ"
    # non-alphabetic tokens pass through
    assert stem_pl("4.2") == "4.2"
    assert stem_pl("utf8") == "utf8"
    # short words never strip below 3 chars
    assert stem_pl("kot") == "kot"
    assert stem_pl("oko") == "oko"


def test_idempotent_on_fixture_surface():
    for words in CONFLATION_GROUPS.values():
        for w in words:
            s = stem_pl(w)
            assert stem_pl(s) == s


def test_analyze_pipeline():
    toks = analyze_pl("Wyszukiwanie informacji w zbiorach dokumentów 4.2")
    assert toks == [
        ("wyszukiw", 0), ("inform", 1), ("w", 2),
        ("zbior", 3), ("dokument", 4), ("4.2", 5),
    ]
    assert analyze_pl("") == []


def test_pl_index_end_to_end(spark):
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [
            (0, "system indeksowania przetwarza dokumenty"),
            (1, "indeks odwrócony w systemie"),
            (2, "wyszukiwanie informacji"),
        ],
        "doc_id long, text string",
    )
    idx = build_index(
        spark, docs,
        CorpusSpec(text_col="text", id_col="doc_id", stem_lang="pl"),
    ).cache()
    terms = {r["term"] for r in idx.term_stats.collect()}
    assert {"indeks", "system", "dokument", "wyszukiw", "inform"} <= terms
    s = IndexSearcher(idx)
    # 'indeksowania' (doc 0) and 'indeks' (doc 1) share the stem
    assert {h.docid for h in s.search(TermQuery(term="indeks"), 5)} == {0, 1}
    assert {h.docid for h in s.search(TermQuery(term="system"), 5)} == {0, 1}
    assert [h.docid for h in s.search(TermQuery(term="inform"), 5)] == [2]
