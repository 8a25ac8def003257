"""Snowball Dutch stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/dutch/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Dutch") role
(``Tartarus/Snowball/Ext/DutchStemmer.cs``); validated against the
full published test vocabulary (45 669 words) during development.
"""

from __future__ import annotations

_VOWELS = set("aeiouyè")

# prelude: strip umlauts and acutes
_ACCENTS = str.maketrans("äëïöüáéíóú", "aeiouaeiou")


def _undouble(word: str) -> str:
    if word.endswith(("kk", "dd", "tt")):
        return word[:-1]
    return word


def dutch_stem(word: str) -> str:
    if not word:
        return word
    word = word.translate(_ACCENTS)

    # mark consonant-role y/i: initial y, y after a vowel, i between
    # vowels go upper-case for the duration
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _VOWELS:
            chars[i] = "Y"
        elif (
            chars[i] == "i"
            and chars[i - 1] in _VOWELS
            and i + 1 < len(chars)
            and chars[i + 1] in _VOWELS
        ):
            chars[i] = "I"
    word = "".join(chars)

    # R1 / R2 (R1 begins no earlier than position 3, as in German)
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
    if r1 < 3:
        r1 = 3

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    def en_ending_ok(stem: str) -> bool:
        # valid en-ending: a non-vowel, and not the string gem
        return (
            len(stem) >= 1
            and stem[-1] not in _VOWELS
            and not stem.endswith("gem")
        )

    # ---- step 1 (longest of heden / ene / en / se / s) ---------------
    if word.endswith("heden"):
        if in_r1(len(word) - 5):
            word = word[:-5] + "heid"
    elif word.endswith(("ene", "en")):
        suf_len = 3 if word.endswith("ene") else 2
        stem = word[:-suf_len]
        if in_r1(len(word) - suf_len) and en_ending_ok(stem):
            word = _undouble(stem)
    elif word.endswith(("se", "s")):
        suf_len = 2 if word.endswith("se") else 1
        stem = word[:-suf_len]
        # valid s-ending: a non-vowel other than j
        if (
            in_r1(len(word) - suf_len)
            and len(stem) >= 1
            and stem[-1] not in _VOWELS
            and stem[-1] != "j"
        ):
            word = stem

    # ---- step 2: delete e if in R1 and preceded by a non-vowel --------
    e_found = False
    if (
        word.endswith("e")
        and in_r1(len(word) - 1)
        and len(word) >= 2
        and word[-2] not in _VOWELS
    ):
        word = _undouble(word[:-1])
        e_found = True

    # ---- step 3a: heid ------------------------------------------------
    if (
        word.endswith("heid")
        and in_r2(len(word) - 4)
        and (len(word) < 5 or word[-5] != "c")
    ):
        word = word[:-4]
        if word.endswith("en"):
            stem = word[:-2]
            if in_r1(len(word) - 2) and en_ending_ok(stem):
                word = _undouble(stem)

    # ---- step 3b: d-suffixes (longest of end/ing/ig/lijk/baar/bar) ----
    if word.endswith(("end", "ing")):
        if in_r2(len(word) - 3):
            word = word[:-3]
            if (
                word.endswith("ig")
                and in_r2(len(word) - 2)
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
            else:
                word = _undouble(word)
    elif word.endswith("lijk"):
        if in_r2(len(word) - 4):
            word = word[:-4]
            # repeat step 2
            if (
                word.endswith("e")
                and in_r1(len(word) - 1)
                and len(word) >= 2
                and word[-2] not in _VOWELS
            ):
                word = _undouble(word[:-1])
    elif word.endswith("baar"):
        if in_r2(len(word) - 4):
            word = word[:-4]
    elif word.endswith("bar"):
        if in_r2(len(word) - 3) and e_found:
            word = word[:-3]
    elif word.endswith("ig"):
        if in_r2(len(word) - 2) and (len(word) < 3 or word[-3] != "e"):
            word = word[:-2]

    # ---- step 4: undouble vowel (CVVC, last consonant not I) -----------
    if len(word) >= 4:
        c1, v1, v2, c2 = word[-4], word[-3], word[-2], word[-1]
        if (
            c1 not in _VOWELS
            and c2 not in _VOWELS
            and c2 != "I"
            and v1 == v2
            and v1 in "aeou"
        ):
            word = word[:-2] + word[-1]

    return word.replace("I", "i").replace("Y", "y")
