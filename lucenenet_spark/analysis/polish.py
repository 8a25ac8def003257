"""Polish stemming (Stempel role) — a pinned rule-based light stemmer.

Reference: ``src/Lucene.Net.Analysis.Stempel/`` wraps the Egothor
project's TRAINED stemming tables for Polish (a multi-megabyte model
file learned from an inflection lexicon, loaded by
``StempelStemmer.cs``); ``Lucene.Net.Analysis.Morfologik`` is likewise
a dictionary lemmatizer. Shipping or re-training those models is out
of scope for this engine — exactly the scoping applied to the
Kuromoji/SmartCn dictionaries (analysis/japanese.py /
analysis/chinese.py). This module keeps the ALGORITHMIC role — map
Polish inflectional variants of a lemma to one shared index term so a
query matches every surface form — with a clean-room light stemmer
designed for this engine:

- **step 1** strips ONE inflectional ending (noun case / adjective
  agreement / verb person endings — the fusional morphology that
  Stempel's patch commands overwhelmingly encode), longest match
  first, only when >= 3 chars of stem remain;
- **step 2** strips ONE derivational or verbal-theme suffix from the
  step-1 result (``-acj-``, ``-owani-``, ``-ość-``, ``-owa-``/
  infinitive themes, diminutives), same longest-first + min-stem
  guard.

The two-step shape mirrors how the inflected family collapses:
``informacja / informacji / informacjami`` all reach ``informacj``
after step 1 and ``inform`` after step 2. The ruleset is PINNED — the
fixtures in ``tests/test_polish.py`` and every standing oracle embed
its exact behavior, so it must never change silently (the same
contract as the pinned ASCII tokenizer pattern).

``analyze_pl`` composes the engine's unicode word tokenizer (Polish
diacritics are ``\\w``) with the stemmer; no stop filter, positions
sequential — identical pipeline shape to ``make_snowball_analyzer``
so ``CorpusSpec(stem_lang="pl")`` routes through the same builder
path as the 19 Snowball-family languages.
"""

from __future__ import annotations

import re

# Step 1 — inflectional endings (noun case, adjective agreement, verb
# person/number) as (suffix, min_remaining_stem). One strip, longest
# match first. ``em``/``om`` carry a higher guard because they are
# also lemma-final in common nouns (system, poziom) — a light stemmer
# cannot tell instrumental/dative case from a lemma without a
# dictionary, so short words keep them.
_PL_STEP1 = (
    # adjective / participle agreement
    ("owego", 3), ("owemu", 3), ("owych", 3), ("owymi", 3),
    ("iego", 3), ("iemu", 3), ("acie", 3), ("ecie", 3),
    ("ego", 3), ("emu", 3), ("ych", 3), ("ich", 3),
    ("ymi", 3), ("imi", 3),
    ("owa", 3), ("owe", 3), ("owy", 3),
    # verb person endings share letters with noun plurals (system-y
    # vs -emy, poziom vs -iom) — higher guards keep the noun forms
    ("ają", 4), ("amy", 5), ("emy", 5), ("asz", 5), ("esz", 5),
    # noun case endings (sing + plural)
    ("iach", 3), ("iami", 3), ("ach", 3), ("ami", 3),
    ("iom", 5), ("owi", 3),
    ("ów", 3), ("om", 5), ("em", 5), ("ej", 3), ("ie", 3),
    ("iu", 3), ("ym", 3), ("im", 3),
    # single-char vocalic endings
    ("ą", 3), ("ę", 3), ("i", 3), ("y", 3),
    ("u", 3), ("a", 3), ("o", 3), ("e", 3),
)

# Step 2 — derivational / verbal-theme suffixes on the step-1 result.
# Gerund themes appear both vowel-final (-ani- from -ania/-aniu) and
# bare (-an- after step 1 stripped "ie" of -anie) — both spellings are
# listed so every case form of a gerund reaches the same stem.
_PL_STEP2 = (
    ("izacj", 3), ("yzacj", 3), ("acj", 3),     # -acja nominalizations
    ("owani", 3), ("owań", 3), ("owan", 3),     # -owanie gerunds
    ("ani", 3), ("eni", 3), ("an", 3), ("en", 3),
    ("ań", 3), ("eń", 3),                       # -anie/-enie gerunds
    ("owości", 3), ("owość", 3), ("ości", 3), ("ość", 3),  # -ość nouns
    ("owali", 3), ("ował", 3), ("ując", 3), ("uje", 3), ("uj", 3),
    ("ować", 3), ("ywa", 3), ("iwa", 3),        # -ować conjugation
    ("ać", 3), ("eć", 3), ("yć", 3), ("ić", 3),  # infinitive themes
    ("eczk", 3), ("uszk", 3), ("aszk", 3), ("iczk", 3),  # diminutives
    ("ctw", 3), ("stw", 3),                     # -ctwo/-stwo collectives
    ("ik", 3), ("yk", 3), ("ek", 3),            # diminutive nouns
)

# longest-first, stable within a length class (tuple order)
_STEP1 = sorted(_PL_STEP1, key=lambda e: len(e[0]), reverse=True)
_STEP2 = sorted(_PL_STEP2, key=lambda e: len(e[0]), reverse=True)


def _strip_one(word: str, table: list[tuple[str, int]]) -> str:
    for s, min_stem in table:
        if word.endswith(s) and len(word) - len(s) >= min_stem:
            return word[: -len(s)]
    return word


def stem_pl(word: str) -> str:
    """Pinned Polish light stem of one lowercased token. Non-alphabetic
    tokens (numbers, identifiers with digits) pass through unchanged —
    Stempel likewise only patches dictionary-shaped words."""
    if not word.isalpha():
        return word
    return _strip_one(_strip_one(word, _STEP1), _STEP2)


# same unicode word pattern as the Snowball analyzers
# (analysis/snowball.py::_UNI_TOKEN_RE) — Polish diacritics are \w
_PL_TOKEN_RE = re.compile(r"\d+(?:\.\d+)+|\w+(?:'\w+)*")
_MAX_TOKEN_LENGTH = 255


def analyze_pl(text: str) -> list[tuple[str, int]]:
    """Stempel-role pipeline: unicode word tokenize -> lowercase ->
    pinned Polish light stem; NO stop filter, positions sequential
    (gap-free) — the same contract as ``make_snowball_analyzer``."""
    if not text:
        return []
    toks = _PL_TOKEN_RE.findall(text.lower())
    return [
        (stem_pl(t), i) for i, t in enumerate(toks)
        if len(t) <= _MAX_TOKEN_LENGTH
    ]
