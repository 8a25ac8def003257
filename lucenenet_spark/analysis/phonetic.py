"""Phonetic matching — Soundex (reference
``Lucene.Net.Analysis.Phonetic/Language/Soundex.cs`` /
``PhoneticFilter.cs``; the algorithm is Russell & Odell's 1918 public
standard, US_ENGLISH_MAPPING_STRING ``01230120022455012623010202``).

Pinned spec (one deliberate, documented divergence from commons-codec:
H and W code as 0 — i.e. they act as separators like vowels — instead
of being transparent between same-group consonants; RE2 has no
backreferences so the transparent-H/W rule cannot be expressed in the
DuckDB oracle's regex dialect, and the separator variant is the
classic "genealogy" soundex):

1. strip non-letters, uppercase; empty -> ''
2. code EVERY letter with the classic map (A0 B1 C2 D3 E0 F1 G2 H0 I0
   J2 K2 L4 M5 N5 O0 P1 Q2 R6 S2 T3 U0 V1 W0 X2 Y0 Z2)
3. collapse runs of equal digits (so a tail digit equal to the first
   letter's code is dropped, per the standard)
4. keep the original first LETTER, then the tail's non-zero digits
5. pad with zeros / truncate to 4 chars ("R163")

The three dialects below are generated from the SAME step list, so
Spark (JVM Column chain — whole-stage codegen, no UDF), DuckDB (oracle
SQL) and Python (test brute force) agree byte-for-byte.
"""

from __future__ import annotations

import re

_MAP = "01230120022455012623010202"
_ALPHA = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def soundex_py(name: str) -> str:
    """Python reference implementation of the pinned spec."""
    u = re.sub(r"[^A-Za-z]", "", name).upper()
    if not u:
        return ""
    coded = "".join(_MAP[ord(c) - 65] for c in u)
    collapsed = re.sub(r"(.)\1+", r"\1", coded)
    digits = collapsed[1:].replace("0", "")
    return (u[0] + digits + "000")[:4]


def soundex_col(col):
    """The same spec as a pyspark Column expression (translate +
    chained regexp_replace — stays inside whole-stage codegen)."""
    from pyspark.sql import functions as F

    u = F.upper(F.regexp_replace(col, "[^A-Za-z]", ""))
    coded = F.translate(u, _ALPHA, _MAP)
    for d in "0123456":
        coded = F.regexp_replace(coded, d + "{2,}", d)
    digits = F.replace(F.substring(coded, 2, 1000), F.lit("0"), F.lit(""))
    out = F.concat(F.substring(u, 1, 1), F.substring(F.concat(digits, F.lit("000")), 1, 3))
    return F.when(u == "", F.lit("")).otherwise(out)


def soundex_sql(expr: str) -> str:
    """The same spec as a DuckDB SQL scalar over ``expr`` (no
    backreferences — RE2-safe)."""
    u = f"upper(regexp_replace({expr}, '[^A-Za-z]', '', 'g'))"
    coded = f"translate({u}, '{_ALPHA}', '{_MAP}')"
    for d in "0123456":
        coded = f"regexp_replace({coded}, '{d}{{2,}}', '{d}', 'g')"
    digits = f"replace(substr({coded}, 2), '0', '')"
    out = f"(substr({u}, 1, 1) || substr({digits} || '000', 1, 3))"
    return f"(CASE WHEN {u} = '' THEN '' ELSE {out} END)"
