"""OpenNLP role — sentence detection, POS tagging, and POS-gated
indexing with pinned rule-based models.

Reference: ``src/Lucene.Net.Analysis.OpenNLP/``:

- ``OpenNLPTokenizer.cs`` runs a maxent sentence detector + tokenizer
  and flags each sentence-final token with ``EOS_FLAG_BIT`` so
  downstream filters can work one sentence at a time;
- ``OpenNLPPOSFilter.cs`` tags every term's ``TypeAttribute`` with its
  POS, sentence at a time;
- ``OpenNLPChunkerFilter.cs`` / ``OpenNLPLemmatizerFilter.cs`` are
  likewise trained-model lookups;
- ``OpenNLPSentenceBreakIterator.cs`` feeds sentence passages to the
  postings highlighter (this engine's ``collectors.postings_highlight``
  already segments sentences with a pinned rule).

The trained maxent/perceptron MODELS are out of scope — exactly the
scoping applied to the Kuromoji/SmartCn dictionaries and Stempel
tables. This module keeps the ALGORITHMIC role with pinned rules:

- **sentence break**: after a ``.``/``!``/``?`` run followed by
  whitespace (deterministic; abbreviation handling is a model concern);
- **POS tagging**: a closed-class function-word table, then
  digit-initial -> CD, then capitalized-and-not-sentence-initial ->
  NNP, then pinned suffix rules (with one optional plural ``s``
  stripped first), default NN — the classic rule-baseline shape
  (Brill's lexical-rule starting point);
- **consumer**: ``make_opennlp_analyzer(keep)`` indexes only tokens
  whose tag is in ``keep`` (the TypeTokenFilter role fed by the POS
  filter). Removed tokens leave POSITION GAPS and do not count toward
  field_length/norms (enablePositionIncrements=true semantics, same
  contract as CorpusSpec(token_length=...)).

The ruleset is PINNED — fixtures in ``tests/test_opennlp_role.py`` and
every standing oracle embed its exact behavior.
"""

from __future__ import annotations

import re

# sentence boundary: a .!? run, then whitespace. Pinned.
_SENT_RE = re.compile(r"(?<=[.!?])\s+")

# within-sentence tokens keep original case for the NNP rule; the
# pattern is the engine's pinned ASCII word shape (analyzer.py)
_WORD_RE = re.compile(r"\d+(?:\.\d+)+|\w+(?:'\w+)*", re.ASCII)

_CLOSED: dict[str, str] = {}
for _tag, _words in (
    ("DT", "the a an this that these those each every some any no"),
    ("PRP", "i you he she it we they me him her us them his hers its "
            "their our your my mine yours theirs ours"),
    ("IN", "of in on at by for with from to into onto over under "
           "between through during after before above below against "
           "within without about as"),
    ("CC", "and or but nor so yet"),
    ("MD", "is are was were be been being am has have had do does did "
           "will would can could may might shall should must"),
    ("RB", "not never also very too only just"),
):
    for _w in _words.split():
        _CLOSED[_w] = _tag

_SUFFIX_RULES: tuple[tuple[str, str], ...] = (
    ("tion", "NN"), ("sion", "NN"), ("ment", "NN"), ("ness", "NN"),
    ("ity", "NN"), ("ism", "NN"), ("ist", "NN"), ("ance", "NN"),
    ("ence", "NN"), ("ship", "NN"),
    ("ous", "JJ"), ("ive", "JJ"), ("able", "JJ"), ("ible", "JJ"),
    ("ful", "JJ"), ("less", "JJ"), ("ary", "JJ"), ("ical", "JJ"),
    ("ing", "VB"), ("ize", "VB"), ("ise", "VB"), ("ify", "VB"),
    ("ed", "VB"), ("ly", "RB"),
)


def split_sentences(text: str) -> list[str]:
    """Pinned rule-based sentence detector (OpenNLPTokenizer.cs
    sentence-model role): break after a .!? run + whitespace."""
    if not text:
        return []
    return [s for s in _SENT_RE.split(text) if s.strip()]


def _tag(raw: str, first_in_sentence: bool) -> str:
    low = raw.lower()
    t = _CLOSED.get(low)
    if t is not None:
        return t
    if raw[0].isdigit():
        return "CD"
    if raw[0].isupper() and not first_in_sentence:
        return "NNP"
    base = low[:-1] if low.endswith("s") and len(low) > 3 else low
    for suf, tag in _SUFFIX_RULES:
        if base.endswith(suf) and len(base) > len(suf) + 1:
            return tag
    return "NN"


def opennlp_tokens(text: str) -> list[tuple[str, str, bool]]:
    """(lowercased term, POS tag, is_sentence_final) per token — the
    OpenNLPTokenizer + OpenNLPPOSFilter stream shape (TypeAttribute =
    tag, EOS_FLAG_BIT = last token of each sentence)."""
    out: list[tuple[str, str, bool]] = []
    for sent in split_sentences(text):
        words = _WORD_RE.findall(sent)
        if not words:
            continue
        for i, w in enumerate(words):
            out.append((w.lower(), _tag(w, i == 0), False))
        term, tag, _ = out[-1]
        out[-1] = (term, tag, True)
    return out


def make_opennlp_analyzer(keep: tuple[str, ...]):
    """analyze(text) -> [(term, position)] keeping only tokens whose
    POS tag is in ``keep`` (TypeTokenFilter role). Positions are the
    ORIGINAL token indexes — removed tokens leave gaps
    (enablePositionIncrements=true); norms count kept tokens."""
    keep_set = frozenset(keep)

    def analyze_opennlp(text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        return [
            (term, pos)
            for pos, (term, tag, _eos) in enumerate(opennlp_tokens(text))
            if tag in keep_set and len(term) <= 255
        ]

    return analyze_opennlp
