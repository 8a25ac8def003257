"""WordDelimiterFilter — code-aware sub-word splitting.

Semantics follow the reference
``src/Lucene.Net.Analysis.Common/Analysis/Miscellaneous/WordDelimiterFilter.cs``
(flags enum :28-97, emission logic) and ``WordDelimiterIterator.cs``
(char classification :321-366, break rules ``IsBreak`` :219-244,
bounds/possessive handling :268-300).  This is the filter that makes
source-code identifiers searchable — ``"PowerShot"`` → ``Power``,
``Shot``; ``"SD500"`` → ``SD``, ``500``; ``"wi-fi"`` → ``wi``, ``fi``
(+``wifi`` with CATENATE_WORDS) — i.e. the north-star "code-aware
splitting".

Two layers:

1. :func:`word_delimiter_tokens` — the full per-token filter with the
   reference flag set (parts / catenations / preserve-original /
   possessive stemming / protected words), pinned by fixtures lifted
   from ``TestWordDelimiterFilter.cs`` (``doSplit`` :135, ``TestSplits``
   :141, ``TestPossessives`` :191, ``TestLotsOfConcatenating`` :287).
   Pure Python, used per-token (query-side analysis chains, pytest).

2. :func:`code_split` / :func:`CODE_SPLIT_SQL` — the ORACLE-MIRRORED
   subset used for index builds: a pinned regexp chain that inserts
   spaces at the WDF break boundaries (lower→upper case change,
   letter↔digit transition, ``_`` as delimiter) on the RAW (pre-
   lowercase) text, after which the standard analyzer pipeline runs
   unchanged.  The exact same chain runs in DuckDB (RE2) and Spark
   (Java regex), so a code-analyzed index is hash-checkable end-to-end.
   Position semantics of this path: every emitted sub-word consumes one
   position (sequential), a pinned divergence from the reference's
   posInc-0 stacking, documented here and in SURVEY §8c.
"""

from __future__ import annotations

import re
import unicodedata
from dataclasses import dataclass

# ---------------------------------------------------------------- char types
# WordDelimiterIterator.GetType (:321-366): Lu -> UPPER; Ll -> LOWER;
# other letters/marks (Lo, Lm, Lt, Mn, Mc, Me, ...) -> ALPHA (= both
# case bits, so they glue to either); Nd -> DIGIT; everything else is
# a sub-word delimiter.
_LOWER = 1
_UPPER = 2
_DIGIT = 4
_ALPHA = _LOWER | _UPPER
_DELIM = 8


def _char_type(ch: str) -> int:
    cat = unicodedata.category(ch)
    if cat == "Lu":
        return _UPPER
    if cat == "Ll":
        return _LOWER
    if cat[0] == "L" or cat[0] == "M":  # Lt/Lm/Lo + combining marks
        return _ALPHA
    if cat == "Nd":
        return _DIGIT
    if cat == "Cs":  # surrogates (kept inside words, ref :351)
        return _ALPHA | _DIGIT
    return _DELIM


@dataclass(frozen=True)
class WordDelimiterFlags:
    """The reference flag enum (WordDelimiterFilter.cs:35-96)."""

    generate_word_parts: bool = True
    generate_number_parts: bool = True
    catenate_words: bool = False
    catenate_numbers: bool = False
    catenate_all: bool = False
    preserve_original: bool = False
    split_on_case_change: bool = True
    split_on_numerics: bool = True
    stem_english_possessive: bool = True


DEFAULT_FLAGS = WordDelimiterFlags()


def _is_break(last: int, cur: int, flags: WordDelimiterFlags) -> bool:
    """WordDelimiterIterator.IsBreak (:219-244)."""
    if cur & last:
        return False
    if not flags.split_on_case_change and (last & _ALPHA) and (cur & _ALPHA):
        return False
    if (last & _UPPER) and (cur & _ALPHA):
        # UPPER->letter never splits (acronym tails: "USBPort" stays,
        # "solR" splits because that break is lower->UPPER)
        return False
    if not flags.split_on_numerics and (
        ((last & _ALPHA) and (cur & _DIGIT)) or ((last & _DIGIT) and (cur & _ALPHA))
    ):
        return False
    return True


def _subwords(token: str, flags: WordDelimiterFlags) -> list[tuple[int, int]]:
    """[(start, end)] sub-word spans after bounds-stripping, break
    scanning, and possessive skipping (WordDelimiterIterator.Next)."""
    types = [_char_type(c) for c in token]
    n = len(token)
    # SetBounds: strip leading/trailing delimiters (ref :268-284)
    lo = 0
    while lo < n and types[lo] == _DELIM:
        lo += 1
    hi = n
    while hi > lo and types[hi - 1] == _DELIM:
        hi -= 1

    def ends_with_possessive(pos: int) -> bool:
        # ref :290-299: ...alpha 's (followed by delimiter or end)
        return (
            flags.stem_english_possessive
            and pos > 2
            and token[pos - 2] == "'"
            and token[pos - 1] in "sS"
            and bool(types[pos - 3] & _ALPHA)
            and (pos == hi or types[pos] == _DELIM)
        )

    spans: list[tuple[int, int]] = []
    cur = lo
    skip_possessive = False
    while cur < hi:
        if skip_possessive:
            # the just-emitted subword was followed by "'s": jump past
            # it so neither the quote nor the "s" starts a subword
            cur += 2
            skip_possessive = False
        while cur < hi and types[cur] == _DELIM:
            cur += 1
        if cur >= hi:
            break
        end = cur + 1
        last = types[cur]
        while end < hi and not _is_break(last, types[end], flags):
            last = types[end]
            end += 1
        spans.append((cur, end))
        if end < hi - 1 and ends_with_possessive(end + 2):
            skip_possessive = True
        cur = end
    return spans


def _span_type(token: str, span: tuple[int, int]) -> int:
    t = _char_type(token[span[0]])
    return _ALPHA if t & _ALPHA else t


def word_delimiter_tokens(
    token: str,
    flags: WordDelimiterFlags = DEFAULT_FLAGS,
    protected: frozenset[str] = frozenset(),
    pos_inc_in: int = 1,
) -> list[tuple[str, int]]:
    """Apply the filter to ONE incoming token -> [(term, posIncrement)].

    Emission order and increments match the reference fixtures
    (TestWordDelimiterFilter.cs:253-341): optional original first
    (carrying the incoming increment), each generated part next
    (first part 0 after an original, else carrying the increment;
    subsequent parts 1), with catenation tokens (posInc 0) emitted
    immediately after the part that starts their run.
    """
    if token in protected:
        return [(token, pos_inc_in)]
    spans = _subwords(token, flags)
    # word of no delimiters at all: pass through unchanged
    # (WordDelimiterFilter.cs IncrementToken: current==0 && end==length)
    if spans == [(0, len(token))]:
        return [(token, pos_inc_in)]
    if not spans:
        # all-delimiter token: vanishes (increment accumulation is the
        # caller's concern; ref "word of simply delimiters" branch) —
        # unless the original is preserved
        return [(token, pos_inc_in)] if flags.preserve_original else []

    out: list[tuple[str, int]] = []
    inc = pos_inc_in
    if flags.preserve_original:
        out.append((token, inc))
        inc = 0

    # catenation runs: maximal runs of same-type spans (ALPHA for
    # CATENATE_WORDS, DIGIT for CATENATE_NUMBERS); CATENATE_ALL is the
    # run of every span. Each catenation is emitted right after the
    # part that starts it, words-cat before all-cat (ref fixture :313).
    cat_at: dict[int, list[str]] = {}
    if flags.catenate_words or flags.catenate_numbers:
        i = 0
        while i < len(spans):
            t = _span_type(token, spans[i])
            j = i
            while j + 1 < len(spans) and _span_type(token, spans[j + 1]) == t:
                j += 1
            wanted = flags.catenate_words if t == _ALPHA else flags.catenate_numbers
            if wanted and j > i:
                cat_at.setdefault(i, []).append(
                    "".join(token[s:e] for s, e in spans[i : j + 1])
                )
            i = j + 1
    if flags.catenate_all and len(spans) > 1:
        full = "".join(token[s:e] for s, e in spans)
        # "only if we haven't output this same combo above": when every
        # span is one type, the words/numbers catenation already IS the
        # full catenation (ref IncrementToken concatAll.subwordCount
        # > lastConcatCount guard)
        if full not in cat_at.get(0, []):
            cat_at.setdefault(0, []).append(full)

    for i, (s, e) in enumerate(spans):
        t = _span_type(token, (s, e))
        gen = flags.generate_word_parts if t == _ALPHA else flags.generate_number_parts
        if gen:
            out.append((token[s:e], inc))
            inc = 1
        for cat in cat_at.get(i, ()):
            out.append((cat, 0))
            inc = 1
    return out


# ------------------------------------------------------- oracle-mirrored path
# The pinned code-split chain (ASCII classes so Python re, Java regex,
# and DuckDB RE2 agree byte-for-byte). Order matters and is part of
# the spec: case split, letter->digit, digit->letter, underscore.
CODE_SPLIT_RULES: tuple[tuple[str, str], ...] = (
    (r"([a-z])([A-Z])", r"\1 \2"),
    (r"([A-Za-z])([0-9])", r"\1 \2"),
    (r"([0-9])([A-Za-z])", r"\1 \2"),
    (r"_", r" "),
)

_COMPILED_RULES = [(re.compile(p), r) for p, r in CODE_SPLIT_RULES]


def code_split(text: str) -> str:
    """Apply the pinned WDF-boundary chain to raw text."""
    for rx, repl in _COMPILED_RULES:
        text = rx.sub(repl, text)
    return text


def analyze_code(text: str) -> list[tuple[str, int]]:
    """Code-analyzer pipeline: WDF boundary chain on the RAW text, then
    the standard pipeline (lowercase -> tokenize -> stop filter).
    ``getUserName_42`` indexes as ``get``/``user``/``name``/``42`` at
    consecutive positions."""
    from lucenenet_spark.analysis.analyzer import analyze

    return analyze(code_split(text or ""))


def code_split_sql(col: str) -> str:
    """The identical chain as a SQL scalar expression (DuckDB RE2 —
    regexp_replace with the 'g' flag)."""
    expr = col
    for pat, repl in CODE_SPLIT_RULES:
        repl_sql = repl.replace("\\1", "\\1").replace("\\2", "\\2")
        expr = f"regexp_replace({expr}, '{pat}', '{repl_sql}', 'g')"
    return expr


def code_split_col(col):
    """The identical chain as a Spark Column (Java regex replaceAll —
    global by default, same left-to-right non-overlapping semantics)."""
    from pyspark.sql import functions as F

    for pat, repl in CODE_SPLIT_RULES:
        repl_j = repl.replace("\\1", "$1").replace("\\2", "$2")
        col = F.regexp_replace(col, pat, repl_j)
    return col
