"""ASCIIFoldingFilter — accent folding to the ASCII block (reference
``Lucene.Net.Analysis.Common/Analysis/Miscellaneous/
ASCIIFoldingFilter.cs:36``; the full filter covers every Unicode block
with an ASCII equivalent — this pins the Latin-1 Supplement +
Latin Extended-A subset, by far the common case, and documents the
narrowing).

Applied as a TEXT transform before tokenization (the engine's
StandardAnalyzer pins ASCII ``\\w`` runs, so unfolded accents would
split tokens: 'café' -> 'caf'). Three dialects generated from the SAME
tables so Spark (JVM translate/replace — whole-stage codegen, no UDF),
DuckDB (oracle SQL) and Python (tests) agree byte-for-byte.
"""

from __future__ import annotations

# 1:1 foldings (translate-able)
_SRC = (
    "ÀÁÂÃÄÅàáâãäåÇçÈÉÊËèéêëÌÍÎÏìíîïÐÑñÒÓÔÕÖØòóôõöøÙÚÛÜùúûüÝýÿ"
    "ĀāĂăĄąĆćĈĉĊċČčĎďĐđĒēĔĕĖėĘęĚěĜĝĞğĠġĢģĤĥĦħĨĩĪīĬĭĮįİıĴĵĶķĹĺĻļĽľĿŀŁł"
    "ŃńŅņŇňŌōŎŏŐőŔŕŖŗŘřŚśŜŝŞşŠšŢţŤťŦŧŨũŪūŬŭŮůŰűŲųŴŵŶŷŸŹźŻżŽž"
)
_DST = (
    "AAAAAAaaaaaaCcEEEEeeeeIIIIiiiiDNnOOOOOOooooooUUUUuuuuYyy"
    "AaAaAaCcCcCcCcDdDdEeEeEeEeEeGgGgGgGgHhHhIiIiIiIiIiJjKkLlLlLlLlLl"
    "NnNnNnOoOoOoRrRrRrSsSsSsSsTtTtTtUuUuUuUuUuUuWwYyYZzZzZz"
)
assert len(_SRC) == len(_DST)

# 1:N foldings (replace chain)
_MULTI = (
    ("Æ", "AE"), ("æ", "ae"), ("Œ", "OE"), ("œ", "oe"),
    ("ß", "ss"), ("Þ", "TH"), ("þ", "th"), ("Ĳ", "IJ"), ("ĳ", "ij"),
)


def fold_py(s: str) -> str:
    t = s.translate(str.maketrans(_SRC, _DST))
    for a, b in _MULTI:
        t = t.replace(a, b)
    return t


def fold_col(col):
    """pyspark Column: translate + replace chain, all JVM."""
    from pyspark.sql import functions as F

    out = F.translate(col, _SRC, _DST)
    for a, b in _MULTI:
        out = F.replace(out, F.lit(a), F.lit(b))
    return out


def fold_sql(expr: str) -> str:
    """The same fold as a DuckDB SQL scalar over ``expr``."""
    out = f"translate({expr}, '{_SRC}', '{_DST}')"
    for a, b in _MULTI:
        out = f"replace({out}, '{a}', '{b}')"
    return out
