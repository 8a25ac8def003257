"""Snowball German stemmer — implemented from the published algorithm
(Porter, snowballstem.org/algorithms/german/stemmer.html; public
domain).  Fills the reference's SnowballFilter(name="German") role
(``Analysis/Snowball/SnowballFilter.cs:30`` over the generated
``Tartarus/Snowball/Ext/GermanStemmer.cs``) — same algorithm, clean
Python implementation, validated against the full published test
vocabulary (35 033 words) during development; a deterministic sample
is pinned in ``tests/test_snowball.py``.
"""

from __future__ import annotations

_VOWELS = set("aeiouyäöü")
_S_ENDING = set("bdfghklmnrt")
_ST_ENDING = set("bdfghklmnt")


def _mark_regions(word: str) -> tuple[int, int]:
    """R1/R2 start offsets (standard Snowball definitions), with the
    German adjustment that R1 begins no earlier than position 3."""
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
    return r1, r2


def _mark_uy(word: str) -> str:
    """u/y between vowels are consonants for the duration — mark upper."""
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i] == "u" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "U"
        elif chars[i] == "y" and chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            chars[i] = "Y"
    return "".join(chars)


def german_stem(word: str) -> str:
    if not word:
        return word
    word = word.replace("ß", "ss")
    word = _mark_uy(word)
    return _german_core(word)


def _german_core(word: str) -> str:
    """Steps 1-3 + finalize over an already-marked word (shared with
    the german2 variant, which differs only in the prelude)."""
    # regions computed on the MARKED word — U/Y are consonants here
    r1, r2 = _mark_regions(word)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    # ---- step 1 ----------------------------------------------------
    done = False
    for suf in ("ern", "em", "er"):
        if word.endswith(suf):
            if in_r1(len(word) - len(suf)):
                word = word[: -len(suf)]
            done = True
            break
    if not done:
        # NOTE: no post-deletion "niss" → "nis" rule — that is a later
        # snowball revision; the 4.8-era algorithm (and its published
        # test vocabulary) keeps the double s
        for suf in ("en", "es", "e"):
            if word.endswith(suf):
                if in_r1(len(word) - len(suf)):
                    word = word[: -len(suf)]
                done = True
                break
    if not done and word.endswith("s"):
        if in_r1(len(word) - 1) and len(word) >= 2 and word[-2] in _S_ENDING:
            word = word[:-1]

    # ---- step 2 ----------------------------------------------------
    done = False
    for suf in ("est", "en", "er"):
        if word.endswith(suf):
            if in_r1(len(word) - len(suf)):
                word = word[: -len(suf)]
            done = True
            break
    if not done and word.endswith("st"):
        if (
            in_r1(len(word) - 2)
            and len(word) >= 6
            and word[-3] in _ST_ENDING
        ):
            word = word[:-2]

    # ---- step 3 (d-suffixes) ---------------------------------------
    if word.endswith(("end", "ung")):
        if in_r2(len(word) - 3):
            word = word[:-3]
            if (
                word.endswith("ig")
                and in_r2(len(word) - 2)
                and (len(word) < 3 or word[-3] != "e")
            ):
                word = word[:-2]
    elif word.endswith(("isch", "ik", "ig")):
        suf = "isch" if word.endswith("isch") else word[-2:]
        pos = len(word) - len(suf)
        if in_r2(pos) and (pos == 0 or word[pos - 1] != "e"):
            word = word[:pos]
    elif word.endswith(("lich", "heit")):
        if in_r2(len(word) - 4):
            word = word[:-4]
            if word.endswith(("er", "en")) and in_r1(len(word) - 2):
                word = word[:-2]
    elif word.endswith("keit"):
        if in_r2(len(word) - 4):
            word = word[:-4]
            if word.endswith("lich") and in_r2(len(word) - 4):
                word = word[:-4]
            elif word.endswith("ig") and in_r2(len(word) - 2):
                word = word[:-2]

    # ---- finalize --------------------------------------------------
    return (
        word.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )
