"""Snowball English ("Porter2") stemmer — implemented from the
published algorithm (snowballstem.org/algorithms/english/stemmer.html;
public domain), at the revision Lucene 4.8 ships
(``Analysis/Snowball/SnowballFilter.cs:30`` over the generated
``Tartarus/Snowball/Ext/EnglishStemmer.cs``).  Validated against the
full published test vocabulary (29 417 words) during development; a
deterministic sample is pinned in ``tests/test_snowball.py``.

This is distinct from the original Porter (1980) stemmer in
``analysis/porter.py`` (the reference's PorterStemFilter): Porter2
adds R1-prefix exceptions, apostrophe handling, a revised step set,
and different e-deletion logic.
"""

from __future__ import annotations

_VOWELS = set("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = set("cdeghkmnrt")

# words that are stemmed to a fixed form before the algorithm runs
_EXCEPTION1 = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    # invariant forms
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias",
    "andes": "andes",
}

# after step 1a these forms stop the algorithm
_EXCEPTION2 = {
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed",
}


def _is_short_syllable(word: str, i: int) -> bool:
    """True if the syllable ending at index i (inclusive of the
    consonant) matches the 'short syllable' definition: a vowel
    followed by a non-vowel other than w/x/Y and preceded by a
    non-vowel, OR a vowel at the beginning of the word followed by a
    non-vowel."""
    if i == 1:
        return word[0] in _VOWELS and word[1] not in _VOWELS
    if i >= 2:
        return (
            word[i - 1] in _VOWELS
            and word[i] not in _VOWELS
            and word[i] not in "wxY"
            and word[i - 2] not in _VOWELS
        )
    return False


def _is_short_word(word: str, r1: int) -> bool:
    return r1 >= len(word) and _is_short_syllable(word, len(word) - 1)


def english_stem(word: str) -> str:
    exc = _EXCEPTION1.get(word)
    if exc is not None:
        return exc
    # length gate applies to the ORIGINAL word (snowball `not hop 3`),
    # before the prelude strips a leading apostrophe
    if len(word) <= 2:
        return word
    if word[0] == "'":
        word = word[1:]

    # mark consonant y as Y: initial y, or y after a vowel
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
    word = "".join(chars)

    # R1 / R2 (with the gener-/commun-/arsen- prefix exception for R1)
    n = len(word)
    r1 = n
    if word.startswith(("gener", "commun", "arsen")):
        r1 = 6 if word.startswith("commun") else 5
    else:
        for i in range(n - 1):
            if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
                r1 = i + 2
                break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _VOWELS and word[i + 1] not in _VOWELS:
            r2 = i + 2
            break

    # ---- step 0: strip trailing apostrophe forms --------------------
    for suf in ("'s'", "'s", "'"):
        if word.endswith(suf):
            word = word[: -len(suf)]
            break

    # ---- step 1a -----------------------------------------------------
    if word.endswith("sses"):
        word = word[:-2]
    elif word.endswith(("ied", "ies")):
        word = word[:-2] if len(word) > 4 else word[:-1]
    elif word.endswith(("us", "ss")):
        pass
    elif word.endswith("s"):
        # delete if the preceding word part contains a vowel not
        # immediately before the s
        if any(c in _VOWELS for c in word[:-2]):
            word = word[:-1]

    if word in _EXCEPTION2:
        return word

    # ---- step 1b -----------------------------------------------------
    if word.endswith(("eedly", "eed")):
        suf_len = 5 if word.endswith("eedly") else 3
        if len(word) - suf_len >= r1:
            word = word[:-suf_len] + "ee"
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if word.endswith(suf):
                stem = word[: -len(suf)]
                if any(c in _VOWELS for c in stem):
                    word = stem
                    if word.endswith(("at", "bl", "iz")):
                        word += "e"
                    elif word.endswith(_DOUBLES):
                        word = word[:-1]
                    elif _is_short_word(word, r1):
                        word += "e"
                break

    # ---- step 1c: y -> i ----------------------------------------------
    if (
        len(word) > 2
        and word[-1] in "yY"
        and word[-2] not in _VOWELS
    ):
        word = word[:-1] + "i"

    # ---- step 2 (in R1) -----------------------------------------------
    _STEP2 = (
        ("ization", "ize"), ("ational", "ate"), ("ousness", "ous"),
        ("iveness", "ive"), ("fulness", "ful"), ("biliti", "ble"),
        ("tional", "tion"), ("lessli", "less"), ("ousli", "ous"),
        ("fulli", "ful"), ("entli", "ent"), ("ation", "ate"),
        ("aliti", "al"), ("iviti", "ive"), ("alism", "al"),
        ("abli", "able"), ("anci", "ance"), ("alli", "al"),
        ("izer", "ize"), ("enci", "ence"), ("ator", "ate"),
        ("bli", "ble"),
    )
    done2 = False
    for suf, rep in _STEP2:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            done2 = True
            break
    if not done2:
        if word.endswith("ogi"):
            if len(word) - 3 >= r1 and len(word) >= 4 and word[-4] == "l":
                word = word[:-1]
        elif word.endswith("li"):
            if len(word) - 2 >= r1 and len(word) >= 3 and word[-3] in _LI_ENDING:
                word = word[:-2]

    # ---- step 3 (in R1) -----------------------------------------------
    _STEP3 = (
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ical", "ic"),
        ("ness", ""), ("ful", ""),
    )
    for suf, rep in _STEP3:
        if word.endswith(suf):
            if len(word) - len(suf) >= r1:
                word = word[: -len(suf)] + rep
            break
    else:
        if word.endswith("ative") and len(word) - 5 >= r2:
            word = word[:-5]

    # ---- step 4 (in R2) -----------------------------------------------
    _STEP4 = (
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "al", "er", "ic",
    )
    for suf in _STEP4:
        if word.endswith(suf):
            if len(word) - len(suf) >= r2:
                word = word[: -len(suf)]
            break
    else:
        if word.endswith("ion"):
            if len(word) - 3 >= r2 and len(word) >= 4 and word[-4] in "st":
                word = word[:-3]

    # ---- step 5 --------------------------------------------------------
    if word.endswith("e"):
        if len(word) - 1 >= r2:
            word = word[:-1]
        elif len(word) - 1 >= r1 and not _is_short_syllable(word, len(word) - 2):
            word = word[:-1]
    elif word.endswith("l"):
        if len(word) - 1 >= r2 and len(word) >= 2 and word[-2] == "l":
            word = word[:-1]

    return word.replace("Y", "y")
