"""Snowball-dialect Porter stemmer — the snowball rendering of Porter
(1980) (snowballstem.org "porter" page; public domain), which differs
from both the original PorterStemFilter algorithm (``analysis/
porter.py``) and Porter2 (``analysis/snowball_english.py``): it adds
Y-marking and R1/R2 regions but keeps the 1980 rule set.  Fills the
reference's SnowballFilter(name="Porter") role
(``Tartarus/Snowball/Ext/PorterStemmer.cs``); validated against the
full published test vocabulary during development.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")


def _shortv(word: str) -> bool:
    """Backward test at the end: non-vowel (not w/x/Y), vowel,
    non-vowel."""
    if len(word) < 3:
        return False
    return (
        word[-1] not in _VOWELS
        and word[-1] not in "wxY"
        and word[-2] in _VOWELS
        and word[-3] not in _VOWELS
    )


def _has_vowel(stem: str) -> bool:
    return any(c in _VOWELS for c in stem)


def porter_snowball_stem(word: str) -> str:
    if not word:
        return word

    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break

    # ---- step 1a ---------------------------------------------------------
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith("ies"):
        word = word[:-2]
    elif word.endswith("ss"):
        pass
    elif word.endswith("s"):
        # unconditional in this dialect (Porter2 added the vowel gate)
        word = word[:-1]

    # ---- step 1b ---------------------------------------------------------
    if word.endswith("eed"):
        if len(word) - 3 >= r1:
            word = word[:-1]
    else:
        for suf in ("ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if _has_vowel(stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif r1 >= len(word) and _shortv(word):
                        word += "e"
                break

    # ---- step 1c ---------------------------------------------------------
    if word.endswith(("y", "Y")) and _has_vowel(word[:-1]):
        word = word[:-1] + "i"

    # ---- step 2 (in R1) ----------------------------------------------------
    _STEP2 = (
        ("ization", "ize"), ("ational", "ate"), ("iveness", "ive"),
        ("fulness", "ful"), ("ousness", "ous"), ("tional", "tion"),
        ("biliti", "ble"), ("ousli", "ous"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("iviti", "ive"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"),
        ("ator", "ate"), ("eli", "e"),
    )
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break

    # ---- step 3 (in R1) ----------------------------------------------------
    _STEP3 = (
        ("alize", "al"), ("icate", "ic"), ("iciti", "ic"),
        ("ative", ""), ("ical", "ic"), ("ness", ""), ("ful", ""),
    )
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break

    # ---- step 4 (in R2) ----------------------------------------------------
    _STEP4 = (
        "ement", "ance", "ence", "able", "ible", "ment", "ant",
        "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
        "al", "er", "ic", "ou",
    )
    for suf in _STEP4:
        if word.endswith(suf):
            pos = len(word) - len(suf)
            if pos >= r2:
                if suf == "ion":
                    if pos >= 1 and word[pos - 1] in "st":
                        word = word[:pos]
                else:
                    word = word[:pos]
            break

    # ---- step 5a -------------------------------------------------------------
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _shortv(word[:-1]):
            word = word[:-1]

    # ---- step 5b -------------------------------------------------------------
    if word.endswith("ll") and len(word) - 1 >= r2:
        word = word[:-1]

    return word.replace("Y", "y")
