"""Collation-key role — ``CollationKeyAnalyzer`` /
``ICUCollationKeyAnalyzer`` (`src/Lucene.Net.Analysis.Common/Collation/
CollationKeyAnalyzer.cs`, `src/Lucene.Net.Analysis.ICU/Collation/
ICUCollationKeyAnalyzer.cs`): convert text to a locale-aware sort key
AT INDEX TIME so that query-time range filtering and sorting are plain
binary comparisons.

The reference delegates to ICU collators (CLDR tailoring data — out of
scope, same scoping as the other ICU/dictionary roles).  The
ALGORITHMIC core kept here is the UCA two-level sort key over pinned
locale tailorings:

- **key layout**: primary weights (one byte per letter, locale
  alphabet order) + ``0x01`` separator + secondary weights (diacritic
  ranks, forward order) — lexicographic byte order on the key equals
  collator order, exactly the property the reference relies on for
  ``TermRangeQuery``/``SortField`` over keyed terms;
- **pinned locales** (the four from the reference's canonical
  ``CollationTestBase.TestCollationKeySort`` fixture):
  ``root``/``en-us`` (å = a+ring, ø = o+stroke, secondary marks),
  ``fr`` (root alphabet; acute < circumflex secondary — CLDR dropped
  the traditional backwards-secondary for fr-FR), ``sv`` (å ä ö as
  letters AFTER z, ø tailored with ö), ``da`` (æ ø å after z, ø
  BEFORE å).  The fixture's four orderings (BFJHD / ECAGI / BJDFH /
  BJDHF, TestICUCollationKeyAnalyzer.cs:81-93) reproduce exactly —
  see tests/test_collation.py.

Spark integration mirrors the reference architecture: the key is
computed ONCE, index-time, by an Arrow-batched pandas UDF
(``add_collation_key``); sorting and range predicates then run
entirely JVM-side on the key column (``collated_sort``,
``collated_range``) — zero Python at query time, and the key column
participates in parquet min/max pruning like any string column.
"""

from __future__ import annotations

import unicodedata

# secondary (diacritic) ranks: unmarked < acute < circumflex < ring <
# stroke — gives root HAT < HÅT, HOT < HØT and fr péché < pêche
_MARK_RANK = {
    "́": 1,  # acute
    "̀": 2,  # grave
    "̂": 3,  # circumflex
    "̈": 4,  # diaeresis
    "̊": 5,  # ring above
    "_stroke": 6,  # ø's bar (no combining decomposition)
}

_BASE_ALPHABET = "abcdefghijklmnopqrstuvwxyz"

# locale tailorings: where the special letters sort, and whether they
# are letters in their own right (primary difference) or a base letter
# plus a secondary mark
_LOCALES = {
    # root / en-us: å ä ö = a/o + mark (secondary); ø = o + stroke
    "root": {"order": _BASE_ALPHABET, "letters": {}},
    "en-us": {"order": _BASE_ALPHABET, "letters": {}},
    # fr = root alphabet (CLDR fr-FR uses forward secondaries)
    "fr": {"order": _BASE_ALPHABET, "letters": {}},
    # Swedish: ...x y z å ä ö ; ø tailored as a variant of ö
    "sv": {
        "order": _BASE_ALPHABET + "åäö",
        "letters": {"å": "å", "ä": "ä", "ö": "ö", "ø": ("ö", "_stroke")},
    },
    # Danish/Norwegian: ...x y z æ ø å ; ä/ö fold into æ/ø as variants
    "da": {
        "order": _BASE_ALPHABET + "æøå",
        "letters": {"æ": "æ", "ø": "ø", "å": "å",
                    "ä": ("æ", "̈"), "ö": ("ø", "̈")},
    },
}
_LOCALES["no"] = _LOCALES["da"]

# Persian (fa): the Perso-Arabic alphabet order — ژ (zhe) sorts BEFORE
# س (sin), unlike Unicode code-point order (U+0698 > U+0633); this is
# exactly the inversion CollationTestBase's Farsi range fixtures pin.
# Arabic-presentation variants ي/ك fold to ی/ک (secondary).
_LOCALES["fa"] = {
    "order": "اآبپتثجچحخدذرزژسشصضطظعغفقکگلمنوهی",
    "letters": {"ي": ("ی", "̈"), "ك": ("ک", "̈")},
}


def collation_key(text: str, locale: str = "root") -> str:
    """Two-level UCA-style sort key; lexicographic (byte/codepoint)
    order on keys == collator order.  Pure function — embeddable in
    DuckDB oracles as literal values, exactly like the segmenter and
    stemmer roles."""
    spec = _LOCALES.get(locale.lower())
    if spec is None:
        raise ValueError(
            f"unknown collation locale {locale!r} (pinned role set: "
            f"{sorted(_LOCALES)})"
        )
    order, letters = spec["order"], spec["letters"]
    primaries: list[int] = []
    secondaries: list[int] = []
    for ch in text.casefold():
        tailored = letters.get(ch)
        if tailored is not None:
            if isinstance(tailored, tuple):
                base, mark = tailored
                primaries.append(order.index(base))
                secondaries.append(_MARK_RANK[mark])
            else:
                primaries.append(order.index(tailored))
                secondaries.append(0)
            continue
        if ch == "ø":  # root-family: o + stroke (no NFD decomposition)
            primaries.append(order.index("o"))
            secondaries.append(_MARK_RANK["_stroke"])
            continue
        decomposed = unicodedata.normalize("NFD", ch)
        base, marks = decomposed[0], decomposed[1:]
        if base in order:
            primaries.append(order.index(base))
            secondaries.append(
                max((_MARK_RANK.get(m, 0) for m in marks), default=0)
            )
        elif not unicodedata.category(ch).startswith("M"):
            # non-alphabet characters: primary = codepoint past the
            # alphabet range, keeps keys total-ordered over any input
            primaries.append(len(order) + ord(base))
            secondaries.append(0)
    # 0x02-based so no weight collides with the 0x01 separator
    return (
        "".join(chr(2 + p) for p in primaries)
        + "\x01"
        + "".join(chr(2 + s) for s in secondaries)
    )


def add_collation_key(df, col: str, locale: str = "root", out: str = "ckey"):
    """Index-time key materialization (the CollationKeyAnalyzer
    position in the reference): one Arrow-batched pandas UDF pass;
    everything downstream (sort, range, parquet pruning) is JVM-side
    string comparison on the key column."""
    import pandas as pd  # noqa: F401 (annotation resolution)
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    def _key_fn(s):
        return s.map(lambda v: collation_key(v, locale) if v is not None else None)

    _key_fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    _key = pandas_udf(_key_fn, "string")

    return df.withColumn(out, _key(F.col(col)))


def collated_sort(df, col: str, locale: str = "root", ascending: bool = True):
    """SortField-over-collation-keys role: sort rows by the locale
    key of ``col`` (ties broken downstream by the caller's own
    columns).  The sort itself is a plain JVM string sort."""
    from pyspark.sql import functions as F

    keyed = add_collation_key(df, col, locale)
    order = F.col("ckey").asc() if ascending else F.col("ckey").desc()
    return keyed.orderBy(order).drop("ckey")


def collated_range(
    df, col: str, locale: str, lo: str, hi: str,
    include_lo: bool = True, include_hi: bool = True,
):
    """TermRangeQuery-with-collator role (CollationTestBase Farsi
    range tests' shape): keep rows whose ``col`` sorts within
    [lo, hi] under the locale — binary comparisons on materialized
    keys, the exact trick the reference uses (keys are compared as
    BytesRefs, never re-collated per query)."""
    from pyspark.sql import functions as F

    klo, khi = collation_key(lo, locale), collation_key(hi, locale)
    keyed = add_collation_key(df, col, locale)
    lo_cmp = F.col("ckey") >= F.lit(klo) if include_lo else F.col("ckey") > F.lit(klo)
    hi_cmp = F.col("ckey") <= F.lit(khi) if include_hi else F.col("ckey") < F.lit(khi)
    return keyed.where(lo_cmp & hi_cmp).drop("ckey")
