"""Greek/Arabic/Persian normalizer fixtures, ported from the
reference tests (file:line cited per block)."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.lang_norm import (
    arabic_normalize,
    greek_lowercase,
    lang_normalizer,
    make_norm_analyzer,
    persian_normalize,
)

# TestArabicNormalizationFilter.cs:34-112 — Check(input, expected)
ARABIC_FIXTURES = [
    ("آجن", "اجن"),      # alef madda
    ("أحمد", "احمد"),    # alef hamza above
    ("إعاذ", "اعاذ"),    # alef hamza below
    ("بنى", "بني"),      # dotless yeh
    ("فاطمة", "فاطمه"),  # teh marbuta
    ("روبرـــــت", "روبرت"),  # tatweel
    ("مَبنا", "مبنا"),   # fatha
    ("علِي", "علي"),     # kasra
    ("بُوات", "بوات"),   # damma
    ("ولداً", "ولدا"),   # fathatan
    ("ولدٍ", "ولد"),     # kasratan
    ("ولدٌ", "ولد"),     # dammatan
    ("نلْسون", "نلسون"),  # sukun
    ("هتميّ", "هتمي"),   # shadda
]

# TestPersianNormalizationFilter.cs:36-66
PERSIAN_FIXTURES = [
    ("های", "هاي"),      # farsi yeh
    ("هاے", "هاي"),      # yeh barree
    ("کشاندن", "كشاندن"),  # keheh
    ("كتابۀ", "كتابه"),  # heh yeh
    ("كتابهٔ", "كتابه"),  # heh + hamza above
    ("زادہ", "زاده"),    # heh goal
]

# GreekAnalyzerTest.cs:62-68 (pre-3.1 analyzer = tokenizer + Greek
# lowercase, no stemmer) — word-level pairs extracted; the reference
# Greek stop set ("και", "της", "ο", "οι") is analyzer configuration
# and not applied here.
GREEK_FIXTURES = [
    ("Μία", "μια"),
    ("γλώσσας", "γλωσσασ"),       # final sigma standardized
    ("Προϊόντα", "προιοντα"),     # dialytika removed
    ("ΠΡΟΫΠΟΘΕΣΕΙΣ", "προυποθεσεισ"),
    ("Άψογος", "αψογοσ"),
    ("πολλαπλές", "πολλαπλεσ"),
    ("ΑΝΑΓΚΕΣ", "αναγκεσ"),
]


@pytest.mark.parametrize("inp,expected", ARABIC_FIXTURES)
def test_arabic_normalizer(inp, expected):
    assert arabic_normalize(inp) == expected


@pytest.mark.parametrize("inp,expected", PERSIAN_FIXTURES)
def test_persian_normalizer(inp, expected):
    assert persian_normalize(arabic_normalize(inp)) == expected


@pytest.mark.parametrize("inp,expected", GREEK_FIXTURES)
def test_greek_lowercase(inp, expected):
    assert greek_lowercase(inp) == expected


def test_norm_analyzer_pipeline():
    an = make_norm_analyzer("el")
    assert an("Προϊόντα (και) [πολλαπλές] - ΑΝΑΓΚΕΣ") == [
        ("προιοντα", 0), ("και", 1), ("πολλαπλεσ", 2), ("αναγκεσ", 3),
    ]
    an_fa = make_norm_analyzer("fa")
    # persian pipeline = arabic rules then persian rules (PersianAnalyzer)
    assert an_fa("کشاندن های") == [("كشاندن", 0), ("هاي", 1)]
    with pytest.raises(KeyError):
        lang_normalizer("xx")


def test_ascii_passthrough():
    for f in (greek_lowercase, arabic_normalize, persian_normalize):
        assert f("Spark42_x") in ("Spark42_x", "spark42_x")
    assert arabic_normalize("table") == "table"
    assert greek_lowercase("TABLE") == "table"


# TestHindiNormalizer.cs:36-61
HINDI_FIXTURES = [
    ("अँगरेज़ी", "अंगरेजि"),
    ("अँगरेजी", "अंगरेजि"),
    ("अँग्रेज़ी", "अंगरेजि"),
    ("अँग्रेजी", "अंगरेजि"),
    ("अंगरेज़ी", "अंगरेजि"),
    ("अंगरेजी", "अंगरेजि"),
    ("अंग्रेज़ी", "अंगरेजि"),
    ("अंग्रेजी", "अंगरेजि"),
    ("क़िताब", "किताब"),
    ("फ़र्ज़", "फरज"),
    ("क़र्ज़", "करज"),
    ("ऱऴख़ग़ड़ढ़य़", "रळखगडढय"),
    ("शार्‍मा", "शारमा"),
    ("शार्‌मा", "शारमा"),
    ("ॅॆॉॊऍऎऑऒॲ", "ेेोोएएओओअ"),
    ("आईऊॠॡऐऔीूॄॣैौ", "अइउऋऌएओिुृॢेो"),
]


@pytest.mark.parametrize("inp,expected", HINDI_FIXTURES)
def test_hindi_normalizer(inp, expected):
    from lucenenet_spark.analysis.lang_norm import hindi_normalize

    assert hindi_normalize(inp) == expected
