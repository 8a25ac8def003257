"""ICU normalization role fixtures — behaviors pinned from the
reference's ICUNormalizer2Filter / ICUFoldingFilter tests
(``Lucene.Net.Tests.Analysis.ICU/Analysis/Icu/TestICUNormalizer2Filter.cs``,
``TestICUFoldingFilter.cs``): the nfkc_cf defaults (case folding,
compatibility forms, final sigma) and diacritic folding."""

from __future__ import annotations

from lucenenet_spark.analysis.icu_norm import (
    icu_fold,
    make_icu_analyzer,
    nfkc_casefold,
)


def test_nfkc_cf_defaults():
    # TestICUNormalizer2Filter.TestDefaults: case folding...
    assert nfkc_casefold("This") == "this"
    # ...final sigma casefolding
    assert nfkc_casefold("ΜΆΪΟΣ") == "μάϊοσ"
    assert nfkc_casefold("Μάϊος") == "μάϊοσ"
    # ...compatibility composed forms
    assert nfkc_casefold("ﴳﴺﰧ") == "طمطمطم"
    # half-width katakana composes to full width
    assert nfkc_casefold("ﴳ") != "ﴳ"


def test_nfkc_cf_compat_singletons_and_ignorables():
    assert nfkc_casefold("ﬁ") == "fi"  # ligature
    assert nfkc_casefold("①") == "1"  # circled digit
    assert nfkc_casefold("Ｆｕｌｌ") == "full"  # fullwidth forms
    assert nfkc_casefold("ẞ") == "ss"  # capital sharp s casefolds
    assert nfkc_casefold("a‍b") == "ab"  # ZWJ dropped


def test_icu_fold_diacritics():
    # TestICUFoldingFilter: accent + case + compat folding combined
    assert icu_fold("Résumé") == "resume"
    assert icu_fold("Đavid") != ""  # no crash on stroked letters
    assert icu_fold("âêîôû") == "aeiou"
    assert icu_fold("ΜΆΪΟΣ") == "μαιοσ"  # tonos + dialytika stripped
    assert icu_fold("ﬁancée") == "fiancee"


def test_idempotent():
    for s in ("This", "ΜΆΪΟΣ", "ﬁ", "Résumé", "ｶﾀｶﾅ"):
        assert nfkc_casefold(nfkc_casefold(s)) == nfkc_casefold(s)
        assert icu_fold(icu_fold(s)) == icu_fold(s)


def test_analyzer_pipeline():
    az = make_icu_analyzer()
    # normalize-before-tokenize: fullwidth digits become ASCII and
    # tokenize as a numeric; stopwords removed with gaps
    assert az("Ｔｈｅ ﬁle ３.１４") == [("file", 1), ("3.14", 2)]
    azf = make_icu_analyzer(fold=True)
    assert azf("Résumé the Déjà") == [("resume", 0), ("deja", 2)]
    # pure-ASCII text matches the base analyzer exactly
    from lucenenet_spark.analysis.analyzer import analyze

    text = "Spark builds 127.0.0.1 don't split"
    assert az(text) == analyze(text)
