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
  ``tests/test_analyzer.py`` pin the rule set.
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
TOKEN_PATTERN = r"\d+(?:\.\d+)+|\w+(?:'\w+)*"
_TOKEN_RE = re.compile(TOKEN_PATTERN, re.ASCII)

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
    toks = _TOKEN_RE.findall(text.lower())
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
# The non-CJK alternative must keep the BASE analyzer's ASCII word
# semantics even though this regex needs Unicode mode for the CJK
# ranges — spelled-out [0-9A-Za-z_] classes, because \w/\d under
# re.UNICODE would admit accented Latin/Cyrillic/etc. as tokens and
# break the "non-CJK runs tokenize exactly like analyze()" contract
# (round-2 ADVICE: 'café' tokenized as 'café' instead of 'caf').
_ASCII_TOKEN_PATTERN = (
    r"[0-9]+(?:\.[0-9]+)+|[0-9A-Za-z_]+(?:'[0-9A-Za-z_]+)*"
)
_MIXED_RE = re.compile(rf"([{_CJK}]+)|({_ASCII_TOKEN_PATTERN})")


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
    for m in _TOKEN_RE.finditer(lt):
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
) -> str:
    """A DuckDB CTE body producing (docid, term[, pos]) identical to
    :func:`analyze` — the SQL oracle's tokenizer. Length filter before
    position assignment, stop filter after (position gaps preserved).
    """
    re_sql = _sql_quote_regex(TOKEN_PATTERN)
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
