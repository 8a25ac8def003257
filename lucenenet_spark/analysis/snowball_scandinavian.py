"""Snowball Danish / Norwegian / Swedish stemmers — implemented from
the published algorithms (snowballstem.org/algorithms/{danish,
norwegian,swedish}/stemmer.html; public domain).  Fill the reference's
SnowballFilter(name=...) roles (``Tartarus/Snowball/Ext/
{Danish,Norwegian,Swedish}Stemmer.cs``); each validated against the
full published test vocabulary during development.

All three share one shape: every step's `among` runs under an R1
`setlimit`, so suffix selection is longest-match *within R1* (a suffix
extending left of R1 simply does not participate).
"""

from __future__ import annotations

_DA_VOWELS = set("aeiouyæåø")
_NO_VOWELS = set("aeiouyæåø")
_SV_VOWELS = set("aeiouyäåö")


def _r1(word: str, vowels: set[str]) -> int:
    """Standard R1, adjusted to begin no earlier than position 3."""
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in vowels and word[i + 1] not in vowels:
            r1 = i + 2
            break
    return max(r1, 3) if r1 < n else r1


def _longest_in_r1(word: str, r1: int, suffixes) -> str | None:
    best = None
    for suf in suffixes:
        if (
            word.endswith(suf)
            and len(word) - len(suf) >= r1
            and (best is None or len(suf) > len(best))
        ):
            best = suf
    return best


# ---------------------------------------------------------------- Danish

_DA_STEP1 = [
    "erendes", "erende", "hedens", "ethed", "erede", "heden", "heder",
    "endes", "ernes", "erens", "erets", "ered", "ende", "erne", "eren",
    "erer", "heds", "enes", "eres", "eret", "hed", "ene", "ere", "ens",
    "ers", "ets", "en", "er", "es", "et", "e",
]
_DA_S_ENDING = set("abcdfghjklmnoprtvyzå")
_DA_STEP3 = ["elig", "lig", "els", "ig"]


def danish_stem(word: str) -> str:
    if not word:
        return word
    word = word.lower()
    r1 = _r1(word, _DA_VOWELS)

    # step 1
    suf = _longest_in_r1(word, r1, _DA_STEP1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _DA_S_ENDING
    ):
        word = word[:-1]

    # step 2: consonant-pair undouble of gd/dt/gt/kt
    if word.endswith(("gd", "dt", "gt", "kt")) and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3
    if word.endswith("igst"):
        word = word[:-2]
    suf = _longest_in_r1(word, r1, _DA_STEP3)
    if suf is not None:
        word = word[: -len(suf)]
        # repeat step 2
        if word.endswith(("gd", "dt", "gt", "kt")) and len(word) - 2 >= r1:
            word = word[:-1]
    elif word.endswith("løst") and len(word) - 4 >= r1:
        word = word[:-1]

    # step 4: undouble a final double consonant in R1
    if (
        len(word) >= 2
        and word[-1] == word[-2]
        and word[-1] not in _DA_VOWELS
        and len(word) - 1 >= r1
    ):
        word = word[:-1]
    return word


# -------------------------------------------------------------- Norwegian

_NO_STEP1 = [
    "hetenes", "hetene", "hetens", "heten", "heter", "endes", "enes",
    "edes", "ende", "ande", "ene", "ane", "ede", "ens", "ers", "ets",
    "het", "ast", "en", "ar", "er", "as", "es", "et", "a", "e",
]
_NO_S_ENDING = set("bcdfghjlmnoprtvyz")
_NO_STEP3 = [
    "hetslov", "eleg", "elig", "elov", "slov", "leg", "eig", "lig",
    "els", "lov", "ig",
]


def norwegian_stem(word: str) -> str:
    if not word:
        return word
    word = word.lower()
    r1 = _r1(word, _NO_VOWELS)

    # step 1 — longest among of the delete set, erte/ert -> er, and s
    suf = _longest_in_r1(word, r1, _NO_STEP1 + ["erte", "ert", "s"])
    if suf in ("erte", "ert"):
        word = word[: -len(suf)] + "er"
    elif suf == "s":
        # valid s-ending: one of the consonant set, or k not preceded
        # by a vowel
        if len(word) >= 2 and (
            word[-2] in _NO_S_ENDING
            or (word[-2] == "k" and (len(word) < 3 or word[-3] not in _NO_VOWELS))
        ):
            word = word[:-1]
    elif suf is not None:
        word = word[: -len(suf)]

    # step 2
    if word.endswith(("dt", "vt")) and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3
    suf = _longest_in_r1(word, r1, _NO_STEP3)
    if suf is not None:
        word = word[: -len(suf)]
    return word


# ---------------------------------------------------------------- Swedish

_SV_STEP1 = [
    "heterna", "hetens", "arna", "erna", "orna", "ande", "arne",
    "aste", "anden", "heten", "heter", "arnas", "ernas", "ornas",
    "ades", "andes", "arens", "andet", "are", "ade", "aren",
    "erns", "ern", "ens", "het", "ast", "ad", "en", "ar", "er", "or",
    "as", "es", "at", "a", "e",
]
_SV_S_ENDING = set("bcdfghjklmnoprtvy")
_SV_STEP3_DELETE = ["lig", "els", "ig"]


def swedish_stem(word: str) -> str:
    if not word:
        return word
    word = word.lower()
    r1 = _r1(word, _SV_VOWELS)

    # step 1
    suf = _longest_in_r1(word, r1, _SV_STEP1)
    if suf is not None:
        word = word[: -len(suf)]
    elif (
        word.endswith("s")
        and len(word) - 1 >= r1
        and len(word) >= 2
        and word[-2] in _SV_S_ENDING
    ):
        word = word[:-1]

    # step 2
    if word.endswith(("dd", "gd", "nn", "dt", "gt", "kt", "tt")) and len(word) - 2 >= r1:
        word = word[:-1]

    # step 3
    suf = _longest_in_r1(word, r1, _SV_STEP3_DELETE + ["löst", "fullt"])
    if suf == "löst":
        word = word[:-1]
    elif suf == "fullt":
        word = word[:-1]
    elif suf is not None:
        word = word[: -len(suf)]
    return word
