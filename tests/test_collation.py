"""Collation-key role — the reference's CollationTestBase
international-sort fixture (TestICUCollationKeyAnalyzer.cs:81-93 /
CollationTestBase.cs:157-215) ported verbatim, plus key-order
properties and the Spark sort/range helpers."""

from __future__ import annotations

import pytest

from lucenenet_spark.analysis.collation import (
    add_collation_key,
    collated_range,
    collated_sort,
    collation_key,
)

X_DOCS = [("A", "pêche"), ("C", "péché"), ("E", "peach"),
          ("G", "sin"), ("I", "sín")]
Y_DOCS = [("B", "HAT"), ("D", "HUT"), ("F", "HÅT"),
          ("H", "HØT"), ("J", "HOT")]


# ---- CollationTestBase.TestCollationKeySort expected orders ----
# (ICU collator orders; the en-us row is the ICU Locale.ROOT ordering
# "BFJHD" noted in TestICUCollationKeyAnalyzer.cs:88-89)

@pytest.mark.parametrize(
    "locale,docs,expected",
    [
        ("en-us", Y_DOCS, "BFJHD"),
        ("fr", X_DOCS, "ECAGI"),
        ("sv", Y_DOCS, "BJDFH"),
        ("da", Y_DOCS, "BJDHF"),
    ],
)
def test_collation_key_sort_fixture(locale, docs, expected):
    got = "".join(
        t for t, _ in sorted(docs, key=lambda p: collation_key(p[1], locale))
    )
    assert got == expected


def test_fr_forward_secondary():
    # CLDR fr-FR is forward-secondary: acute < circumflex decides at
    # the first marked position
    assert collation_key("péché", "fr") < collation_key("pêche", "fr")


def test_root_secondary_marks():
    assert collation_key("hat", "root") < collation_key("håt", "root")
    assert collation_key("håt", "root") < collation_key("hot", "root")


def test_sv_da_letter_order_disagree():
    # sv: å < ø(=ö variant); da: ø < å — the BJDFH vs BJDHF flip
    assert collation_key("håt", "sv") < collation_key("høt", "sv")
    assert collation_key("høt", "da") < collation_key("håt", "da")


def test_casefold_and_unknown_locale():
    assert collation_key("HAT", "sv") == collation_key("hat", "sv")
    with pytest.raises(ValueError):
        collation_key("x", "xx-klingon")


def test_key_total_order_on_mixed_text():
    # non-alphabet characters stay totally ordered (no crash, stable)
    ks = sorted(collation_key(s, "root") for s in ["a b", "a-b", "ab", "a1"])
    assert len(ks) == 4


# ---- Spark helpers ----

@pytest.fixture(scope="module")
def words_df(spark):
    rows = [(i, w) for i, (_, w) in enumerate(Y_DOCS)]
    return spark.createDataFrame(rows, "doc_id long, word string")


def test_collated_sort_spark(words_df):
    for locale, expected in [("sv", "BJDFH"), ("da", "BJDHF")]:
        got = [r["word"] for r in collated_sort(words_df, "word", locale).collect()]
        want = [dict(Y_DOCS)[t] for t in expected]
        assert got == want


def test_collated_range_spark(words_df):
    # sv range [HOT, HÅT] inclusive: HOT, HUT, HÅT (not HAT, not HØT)
    got = {
        r["word"]
        for r in collated_range(words_df, "word", "sv", "HOT", "HÅT").collect()
    }
    assert got == {"HOT", "HUT", "HÅT"}
    # da flips ø before å: the same range now also admits HØT
    got_da = {
        r["word"]
        for r in collated_range(words_df, "word", "da", "HOT", "HÅT").collect()
    }
    assert got_da == {"HOT", "HUT", "HØT", "HÅT"}


def test_add_collation_key_is_plain_string_column(words_df):
    keyed = add_collation_key(words_df, "word", "sv")
    assert dict(keyed.dtypes)["ckey"] == "string"
    # JVM-side comparison on the key equals collator order
    rows = {r["word"]: r["ckey"] for r in keyed.collect()}
    assert rows["HAT"] < rows["HOT"] < rows["HUT"] < rows["HÅT"] < rows["HØT"]


# ---- CollationTestBase Farsi range fixtures ----
# (TestFarsiRangeFilterCollating / TestFarsiRangeQueryCollating /
# TestFarsiTermRangeQuery: the indexed term "ساب" must NOT fall in
# [د U+062F, ژ U+0698] under fa collation — Unicode order would
# include it — and MUST fall in [س U+0633, ط U+0637].)

def test_farsi_key_inverts_codepoint_order():
    assert "ژ" > "س"  # codepoint: ژ after س
    assert collation_key("ژ", "fa") < collation_key("س", "fa")


def test_farsi_range_fixture():
    term = "ساب"  # ساب
    k = collation_key(term, "fa")
    first = (collation_key("د", "fa"), collation_key("ژ", "fa"))
    second = (collation_key("س", "fa"), collation_key("ط", "fa"))
    assert not (first[0] <= k <= first[1]), "must NOT be in [د, ژ] under fa"
    assert second[0] <= k <= second[1], "must be in [س, ط] under fa"


def test_farsi_range_spark(spark):
    df = spark.createDataFrame([(0, "ساب")], "doc_id long, word string")
    assert collated_range(df, "word", "fa", "د", "ژ").count() == 0
    assert collated_range(df, "word", "fa", "س", "ط").count() == 1
