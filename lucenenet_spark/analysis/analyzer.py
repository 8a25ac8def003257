"""StandardAnalyzer-equivalent tokenization, vectorized for Arrow UDFs.

Pipeline semantics follow the reference StandardAnalyzer 4.8
(``src/Lucene.Net.Analysis.Common/Analysis/Standard/StandardAnalyzer.cs:102-110``):
tokenize -> lowercase -> stop-filter, with

- a pinned UAX#29 *approximation* as a single regex (the reference uses
  a JFlex DFA, ``StandardTokenizerImpl.cs``): ``_`` joins words
  (ExtendNumLet), ``.``/``(``/``)`` split words, dotted numerics like
  ``127.0.0.1`` stay whole (MidNum), mid-word apostrophes stay
  (``don't``). ASCII word classes so the exact same RE2 regex runs in
  DuckDB for the SQL oracle. Golden fixtures in
  ``tests/test_analyzer.py`` pin the rule set. The full Mid*-class
  rules ("4,600" / "A:B" whole, per the reference DFA) are available
  via ``CorpusSpec(uax29=True)`` -> :func:`analyze_uax29` /
  ``UAX29_TOKEN_PATTERN`` (also oracle-mirrored); the default stays
  bit-frozen because every standing oracle embeds its pattern.
- max token length 255 — over-long tokens are dropped *before*
  position assignment (``StandardAnalyzer.cs:52``, tokenizer-level
  discard).
- 33-word English stop set (``Analysis/Core/StopAnalyzer.cs:52-55``)
  removed *after* position assignment, leaving position gaps
  (``Analysis/Util/FilteringTokenFilter.cs:85`` preserves increments;
  ``Index/DocInverterPerField.cs:133-160`` bookkeeping).
- field_length counts only emitted (surviving) tokens — this is the
  value BM25's norm byte encodes (``BM25Similarity.cs:156-160``).
"""

from __future__ import annotations

import re
from typing import Iterable

import numpy as np
import pandas as pd

# \d+(\.\d+)+  : dotted numerics (3.14, 127.0.0.1) — UAX#29 MidNum
# \w+('\w+)*   : letters/digits/underscore runs with mid-word apostrophes
# ASCII classes so Python `re` and DuckDB RE2 tokenize identically.
# TOKEN_PATTERN is the pinned ASCII core: the string every DuckDB
# oracle and every Spark-JVM regexp_extract_all tokenizer embeds.
TOKEN_PATTERN = r"\d+(?:\.\d+)+|\w+(?:'\w+)*"

# --- UAX#29 word classes for the scoped non-Latin scripts ----------
# The reference tokenizer is a JFlex DFA over the UAX#29 property
# classes (``Analysis/Standard/StandardTokenizerImpl.cs``). The
# engine-side tokenizer extends the ASCII core with explicit
# letter/digit/mark ranges (unicodedata categories L* / Nd / M* over
# the script blocks below, so Python `re` needs no \p{...} support):
# a token starts on a letter-or-digit and continues through letters,
# digits, and combining marks (UAX#29 WB4: Extend/Format join; marks
# cannot START a token), covering Greek, Cyrillic, Armenian, Hebrew,
# Arabic(+supplement), Syriac, Devanagari, Bengali, Thai, Lao,
# Tibetan, Ethiopic, Greek-Extended, and accented Latin
# (Latin-1 Supplement through Latin Extended-B + Extended
# Additional). On pure-ASCII text this matches
# TOKEN_PATTERN exactly (property-tested) — which is why extending
# the engine regex leaves every oracle byte-identical on the ASCII
# corpora. Golden fixtures ported from the reference
# ``Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs``
# live in tests/test_uax29_scripts.py; divergences (ASCII MidNum/
# MidLetter like "4,600" / "A:B", out-of-scope scripts) are pinned
# there as documented behavior.
_EXT_LETTERS = (
    "\u00C0-\u00D6\u00D8-\u00F6\u00F8-\u024F\u0370-\u0374\u0376-\u0377\u037A-\u037D"
    "\u037F\u0386\u0388-\u038A\u038C\u038E-\u03A1\u03A3-\u03F5"
    "\u03F7-\u0481\u048A-\u052F\u0531-\u0556\u0559\u0560-\u0588\u05D0-\u05EA"
    "\u05EF-\u05F2\u0620-\u064A\u066E-\u066F\u0671-\u06D3\u06D5\u06E5-\u06E6"
    "\u06EE-\u06EF\u06FA-\u06FC\u06FF\u0710\u0712-\u072F\u074D-\u077F"
    "\u0904-\u0939\u093D\u0950\u0958-\u0961\u0971-\u0980\u0985-\u098C"
    "\u098F-\u0990\u0993-\u09A8\u09AA-\u09B0\u09B2\u09B6-\u09B9\u09BD"
    "\u09CE\u09DC-\u09DD\u09DF-\u09E1\u09F0-\u09F1\u09FC\u0E01-\u0E30"
    "\u0E32-\u0E33\u0E40-\u0E46\u0E81-\u0E82\u0E84\u0E86-\u0E8A\u0E8C-\u0EA3"
    "\u0EA5\u0EA7-\u0EB0\u0EB2-\u0EB3\u0EBD\u0EC0-\u0EC4\u0EC6"
    "\u0EDC-\u0EDF\u0F00\u0F40-\u0F47\u0F49-\u0F6C\u0F88-\u0F8C\u1200-\u1248"
    "\u124A-\u124D\u1250-\u1256\u1258\u125A-\u125D\u1260-\u1288\u128A-\u128D"
    "\u1290-\u12B0\u12B2-\u12B5\u12B8-\u12BE\u12C0\u12C2-\u12C5\u12C8-\u12D6"
    "\u12D8-\u1310\u1312-\u1315\u1318-\u135A\u1E00-\u1F15\u1F18-\u1F1D\u1F20-\u1F45"
    "\u1F48-\u1F4D\u1F50-\u1F57\u1F59\u1F5B\u1F5D\u1F5F-\u1F7D"
    "\u1F80-\u1FB4\u1FB6-\u1FBC\u1FBE\u1FC2-\u1FC4\u1FC6-\u1FCC\u1FD0-\u1FD3"
    "\u1FD6-\u1FDB\u1FE0-\u1FEC\u1FF2-\u1FF4\u1FF6-\u1FFC"
)
_EXT_DIGITS = (
    "\u0660-\u0669\u06F0-\u06F9\u0966-\u096F\u09E6-\u09EF\u0E50-\u0E59\u0ED0-\u0ED9"
    "\u0F20-\u0F29"
)
# marks include U+0300-036F combining diacritics and ZWNJ/ZWJ
# (UAX#29 Format, WB4 joins)
_EXT_MARKS = (
    "\u0300-\u036F\u0483-\u0489\u0591-\u05BD\u05BF\u05C1-\u05C2\u05C4-\u05C5"
    "\u05C7\u0610-\u061A\u064B-\u065F\u0670\u06D6-\u06DC\u06DF-\u06E4"
    "\u06E7-\u06E8\u06EA-\u06ED\u0711\u0730-\u074A\u0900-\u0903\u093A-\u093C"
    "\u093E-\u094F\u0951-\u0957\u0962-\u0963\u0981-\u0983\u09BC\u09BE-\u09C4"
    "\u09C7-\u09C8\u09CB-\u09CD\u09D7\u09E2-\u09E3\u09FE\u0E31"
    "\u0E34-\u0E3A\u0E47-\u0E4E\u0EB1\u0EB4-\u0EBC\u0EC8-\u0ECD\u0F18-\u0F19"
    "\u0F35\u0F37\u0F39\u0F3E-\u0F3F\u0F71-\u0F84\u0F86-\u0F87"
    "\u0F8D-\u0F97\u0F99-\u0FBC\u0FC6\u135D-\u135F\u200C-\u200D"
)
_W1 = rf"[\w{_EXT_LETTERS}{_EXT_DIGITS}]"
_WM = rf"[\w{_EXT_LETTERS}{_EXT_DIGITS}{_EXT_MARKS}]"
UNICODE_TOKEN_PATTERN = (
    rf"\d+(?:\.\d+)+|{_W1}{_WM}*(?:'{_W1}{_WM}*)*"
)
# re.ASCII pins \w/\d to [0-9A-Za-z_]/[0-9]; the literal script
# ranges above are unaffected by the flag.
_TOKEN_RE = re.compile(UNICODE_TOKEN_PATTERN, re.ASCII)

# Fast path: on pure-ASCII text the extended pattern matches the
# pinned ASCII core EXACTLY (property-tested in
# tests/test_uax29_scripts.py), and the smaller character classes
# scan ~7% faster. ``str.isascii()`` is O(1) in CPython (the compact
# representation stores an is-ascii flag), so dispatching per string
# costs nothing and ASCII corpora pay zero for the script extension.
_ASCII_TOKEN_RE = re.compile(TOKEN_PATTERN, re.ASCII)


def _token_re_for(text: str):
    return _ASCII_TOKEN_RE if text.isascii() else _TOKEN_RE


# --- Full UAX#29 ASCII word-break rules (CorpusSpec(uax29=True)) ----
# The pinned default TOKEN_PATTERN diverges from the reference DFA on
# the ASCII Mid* classes ("4,600" / "A:B" split). This pattern closes
# that gap, implementing the reference's word-break joins
# (``StandardTokenizerImpl.cs``; fixtures
# ``TestStandardAnalyzer.cs:254-298`` TestMid) for the ASCII alphabet,
# Unicode 6.3 property values:
#
# - MidLetter  {:}       joins  letter  _:_ letter        (WB6/WB7)
# - MidNumLet  {.}       joins  letter._letter AND digit._digit
# - Single_Q   {'}       joins  both, as MidNumLetQ       (WB6/7,11/12)
# - MidNum     {, ;}     joins  digit  _,_ digit          (WB11/WB12)
# - ExtendNumLet {_}     glues adjacent segments          (WB13a/13b)
# - letter<->digit adjacency joins                        (WB9/WB10)
#
# Every joiner must be SINGLE and flanked by the right class on both
# sides ("A::B" / "1,.2" split). Encoded without lookaround so the
# exact same string runs under DuckDB's RE2 for the SQL oracles: each
# segment alternative consumes (joiner, next-char) pairs, so the char
# before a joiner is always of the segment's class; all alternation
# first-chars are disjoint, making the pattern deterministic (engine-
# independent match choice).
UAX29_TOKEN_PATTERN = (
    r"(?:[A-Za-z](?:[.:'][A-Za-z]|[A-Za-z])*"
    r"|[0-9](?:[.,;'][0-9]|[0-9])*"
    r"|_)+"
)
_UAX29_TOKEN_RE = re.compile(UAX29_TOKEN_PATTERN)

# Script-extended variant (same letter/digit/mark ranges as
# UNICODE_TOKEN_PATTERN; joiner classes stay the ASCII Mid* sets, and
# combining marks continue a letter segment per WB4 but cannot sit
# across a joiner). Used for non-ASCII text only — same isascii O(1)
# dispatch as the default analyzer; like UNICODE_TOKEN_PATTERN it is
# pytest-pinned rather than oracle-mirrored (the SF corpora are
# ASCII).
_UL = rf"[A-Za-z{_EXT_LETTERS}]"
_ULM = rf"[A-Za-z{_EXT_LETTERS}{_EXT_MARKS}]"
_UN = rf"[0-9{_EXT_DIGITS}]"
UAX29_UNICODE_TOKEN_PATTERN = (
    rf"(?:{_UL}(?:[.:']{_UL}|{_ULM})*"
    rf"|{_UN}(?:[.,;']{_UN}|{_UN})*"
    r"|_)+"
)
_UAX29_UNICODE_RE = re.compile(UAX29_UNICODE_TOKEN_PATTERN)


def analyze_uax29(text: str) -> list[tuple[str, int]]:
    """StandardAnalyzer pipeline over the full-UAX#29 tokenizer:
    identical stop/length/position semantics to :func:`analyze`, with
    the Mid* join rules the pinned default deliberately omits
    ("4,600", "A:B", "A.B" stay whole). Selected by
    ``CorpusSpec(uax29=True)``; the DuckDB oracles mirror it by
    passing ``UAX29_TOKEN_PATTERN`` to :func:`duckdb_token_sql`."""
    if not text:
        return []
    lt = text.lower()
    rex = _UAX29_TOKEN_RE if lt.isascii() else _UAX29_UNICODE_RE
    toks = rex.findall(lt)
    toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    return [(t, i) for i, t in enumerate(toks) if t not in ENGLISH_STOP_WORDS]

MAX_TOKEN_LENGTH = 255

# Reference: Analysis/Core/StopAnalyzer.cs:52-55 (ENGLISH_STOP_WORDS_SET)
ENGLISH_STOP_WORDS = frozenset(
    {
        "a", "an", "and", "are", "as", "at", "be", "but", "by", "for",
        "if", "in", "into", "is", "it", "no", "not", "of", "on", "or",
        "such", "that", "the", "their", "then", "there", "these",
        "they", "this", "to", "was", "will", "with",
    }
)


def analyze(text: str) -> list[tuple[str, int]]:
    """Tokenize one string -> [(term, position)], stopwords removed but
    their positions left as gaps."""
    if not text:
        return []
    lt = text.lower()
    toks = _token_re_for(lt).findall(lt)
    toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    return [(t, i) for i, t in enumerate(toks) if t not in ENGLISH_STOP_WORDS]


def analyze_stemmed(text: str) -> list[tuple[str, int]]:
    """EnglishAnalyzer-style pipeline: the standard pipeline with a
    PorterStemFilter appended (``Analysis/En/PorterStemFilter.cs:53`` —
    stemming runs AFTER stop removal, positions unchanged). The index
    builder selects this via ``CorpusSpec(stem=True)``; queries must
    stem their terms with :func:`porter_stem` (the parser does when
    constructed with stem=True)."""
    from lucenenet_spark.analysis.porter import porter_stem

    return [(porter_stem(t), p) for t, p in analyze(text)]


# CJK ranges: Han, Hiragana, Katakana, Hangul
_CJK = r"一-鿿㐀-䶿぀-ゟ゠-ヿ가-힯"
# The non-CJK alternative uses the SAME extended word pattern as the
# base analyzer (round-2 ADVICE contract: "non-CJK runs tokenize
# exactly like analyze()" — the reference CJKAnalyzer wraps the same
# StandardTokenizer DFA, so the two pipelines must stay in lockstep;
# re.ASCII pins \w/\d exactly as in _TOKEN_RE).
_MIXED_RE = re.compile(rf"([{_CJK}]+)|({UNICODE_TOKEN_PATTERN})", re.ASCII)


def analyze_cjk(text: str) -> list[tuple[str, int]]:
    """CJK-aware pipeline (the CJKAnalyzer role,
    ``Analysis/Cjk/CJKBigramFilter.cs``): non-CJK runs tokenize exactly
    like :func:`analyze`; CJK character runs emit overlapping BIGRAMS
    (a single isolated CJK char emits itself), each consuming one
    position — the standard bigram indexing that makes CJK text
    searchable without a segmenter. Stop filter applies to the
    non-CJK tokens as usual (gaps preserved).

    Not oracle-mirrored (the pinned ASCII regex is what the DuckDB
    oracles reproduce); guarded by pytest fixtures instead."""
    if not text:
        return []
    toks: list[str] = []
    for m in _MIXED_RE.finditer(text.lower()):
        if m.group(1):  # CJK run -> bigrams
            run = m.group(1)
            if len(run) == 1:
                toks.append(run)
            else:
                toks.extend(run[i : i + 2] for i in range(len(run) - 1))
        else:
            toks.append(m.group(2))
    toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
    return [(t, i) for i, t in enumerate(toks) if t not in ENGLISH_STOP_WORDS]


def analyze_offsets(text: str) -> list[tuple[str, int, int, int]]:
    """Tokenize one string -> [(term, position, start_char, end_char)]
    over the LOWERCASED text (lowercasing is length-preserving for the
    ASCII chars the tokenizer admits, and using the lowered string on
    both engine and oracle sides makes offsets bit-comparable).
    Position numbering matches :func:`analyze` exactly: the length
    filter applies before position assignment, stopwords keep their
    positions (gaps) and ARE emitted here — the highlighter needs
    every position's char span to map a token window to char offsets
    (the ``OffsetAttribute`` the reference's TokenStream carries,
    ``Analysis/TokenAttributes/OffsetAttribute.cs``)."""
    if not text:
        return []
    lt = text.lower()
    out = []
    pos = 0
    for m in _token_re_for(lt).finditer(lt):
        t = m.group(0)
        if len(t) > MAX_TOKEN_LENGTH:
            continue
        out.append((t, pos, m.start(), m.end()))
        pos += 1
    return out


def analyze_series(texts: Iterable[str]) -> list[list[tuple[str, int]]]:
    """Batch analyze (used inside mapInPandas); plain loop over the
    batch but regex+filters are C-level per string."""
    return [analyze(t) for t in texts]


def doc_term_rows(
    doc_ids: "pd.Series", texts: "pd.Series"
) -> "pd.DataFrame":
    """Per-batch inversion: (docid, text) rows -> aggregated
    (docid, term, freq, positions, field_length) rows.

    This is the Spark-side analog of the in-RAM TermsHashPerField
    inversion (``Index/FreqProxTermsWriterPerField.cs``): aggregation
    by (doc, term) happens *inside the Arrow batch* — a map-side
    combine that never ships raw tokens through a shuffle.
    """
    out_doc: list[int] = []
    out_term: list[str] = []
    out_freq: list[int] = []
    out_pos: list[list[int]] = []
    out_fl: list[int] = []
    for docid, text in zip(doc_ids, texts):
        pairs = analyze(text)
        fl = len(pairs)
        agg: dict[str, list[int]] = {}
        for term, pos in pairs:
            agg.setdefault(term, []).append(pos)
        for term, positions in agg.items():
            out_doc.append(docid)
            out_term.append(term)
            out_freq.append(len(positions))
            out_pos.append(positions)
            out_fl.append(fl)
    return pd.DataFrame(
        {
            "docid": pd.array(out_doc, dtype="int64"),
            "term": out_term,
            "freq": pd.array(out_freq, dtype="int32"),
            "positions": out_pos,
            "field_length": pd.array(out_fl, dtype="int32"),
        }
    )


def field_lengths(texts: Iterable[str]) -> np.ndarray:
    """Number of emitted tokens per text (post stop-filter)."""
    return np.array([len(analyze(t)) for t in texts], dtype=np.int32)


def _sql_quote_regex(pattern: str) -> str:
    return pattern.replace("'", "''")


def duckdb_token_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    with_positions: bool = False,
    pattern: str | None = None,
) -> str:
    """A DuckDB CTE body producing (docid, term[, pos]) identical to
    :func:`analyze` — the SQL oracle's tokenizer. Length filter before
    position assignment, stop filter after (position gaps preserved).
    ``pattern`` overrides the pinned default (e.g.
    ``UAX29_TOKEN_PATTERN`` for a ``CorpusSpec(uax29=True)`` index —
    both patterns are RE2-safe by construction)."""
    re_sql = _sql_quote_regex(pattern if pattern is not None else TOKEN_PATTERN)
    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    if with_positions:
        return f"""
  SELECT {id_col} AS docid, z[1] AS term, CAST(z[2] - 1 AS BIGINT) AS pos
  FROM (
    SELECT {id_col},
           list_filter(regexp_extract_all(lower({text_col}), '{re_sql}'),
                       x -> length(x) <= {MAX_TOKEN_LENGTH}) AS toks
    FROM {table}
  ), UNNEST(list_zip(toks, range(1, len(toks) + 1))) AS u(z)
  WHERE z[1] NOT IN ({stops})
"""
    return f"""
  SELECT {id_col} AS docid, t AS term
  FROM (
    SELECT {id_col},
           unnest(list_filter(regexp_extract_all(lower({text_col}), '{re_sql}'),
                              x -> length(x) <= {MAX_TOKEN_LENGTH})) AS t
    FROM {table}
  )
  WHERE t NOT IN ({stops})
"""


def analyze_delimited(
    text: str, delim: str = "|"
) -> list[tuple[str, int, float]]:
    """Whitespace tokenizer + DelimitedPayloadTokenFilter
    (``Analysis/Payloads/DelimitedPayloadTokenFilter.cs:30``,
    FloatEncoder): each whitespace chunk is ``term|payload``; the chunk
    index is the position (one position per whitespace token).
    Lowercase + length/stop filters apply to the TERM part; filtered
    chunks leave position gaps. A chunk without the delimiter (or with
    an unparsable float) carries payload 1.0 — the scorers' default
    for a missing payload (``PayloadFunction`` callers). Payload is
    truncated to float32 (PayloadHelper.EncodeSingle stores 4 bytes).

    Returns [(term, position, payload_f32)].
    """
    if not text:
        return []
    out: list[tuple[str, int, float]] = []
    for i, chunk in enumerate(text.split()):
        term, payload = chunk, 1.0
        if delim in chunk:
            term, _, ptext = chunk.rpartition(delim)
            try:
                payload = float(ptext)
            except ValueError:
                term, payload = chunk, 1.0
        term = term.lower()
        if not term or len(term) > MAX_TOKEN_LENGTH or term in ENGLISH_STOP_WORDS:
            continue
        out.append((term, i, float(np.float32(payload))))
    return out
