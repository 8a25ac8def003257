"""Snowball Finnish stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/finnish/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Finnish") role
(``Tartarus/Snowball/Ext/FinnishStemmer.cs``); validated against the
full published test vocabulary (50 000 words) during development.

Semantics worth noting (they differ between steps):

- Every step's suffix among runs under an R1 (or R2) ``setlimit``, so
  the suffix must lie entirely inside the region and selection is
  longest-match within it.
- Rows guarded by a *method* constraint (the Vi / long-vowel checks on
  den/tten/siin/seen) FALL BACK to the next shorter match when the
  constraint fails; rows guarded by a *switch-code* condition (e.g.
  ``han`` needing a preceding ``a``) fail the whole step instead.
- The preceding-context conditions themselves are NOT region-limited
  (the backward limit is restored before they run) — except in the
  tidy step, where parts a-d stay R1-limited.
"""

from __future__ import annotations

_V1 = set("aeiouyäö")          # vowels
_V2 = set("aeiouäö")           # restricted vowels (no y)
_AEI = set("aeiä")
_LONG = ("aa", "ee", "ii", "oo", "uu", "ää", "öö")
_PARTICLE_END = _V1 | {"n", "t"}

_POSS_AN = ("lla", "na", "ssa", "ta", "lta", "sta")
_POSS_AEN = ("llä", "nä", "ssä", "tä", "ltä", "stä")
_POSS_EN = ("lle", "ine")

# case endings: suffix -> condition tag
_CASE = {
    "han": "a", "hen": "e", "hin": "i", "hon": "o", "hän": "ä",
    "hön": "ö",
    "den": "VI", "tten": "VI", "siin": "VI", "seen": "LONG",
    "a": "cv", "ä": "cv",
    "tta": "e", "ttä": "e",
    "lla": None, "na": None, "ssa": None, "ta": None, "lta": None,
    "sta": None, "llä": None, "nä": None, "ssä": None, "tä": None,
    "ltä": None, "stä": None, "lle": None, "ine": None, "ksi": None,
    "n": "n",
}

_OTHER_COND = ("mpi", "mpa", "mpä", "mmi", "mma", "mmä")
_OTHER_UNCOND = ("impi", "impa", "impä", "immi", "imma", "immä",
                 "eja", "ejä")


def _regions(word: str) -> tuple[int, int]:
    n = len(word)
    r1 = n
    for i in range(n - 1):
        if word[i] in _V1 and word[i + 1] not in _V1:
            r1 = i + 2
            break
    r2 = n
    for i in range(r1, n - 1):
        if word[i] in _V1 and word[i + 1] not in _V1:
            r2 = i + 2
            break
    return r1, r2


def finnish_stem(word: str) -> str:
    if not word:
        return word
    r1, r2 = _regions(word)
    ending_removed = False

    def candidates(w: str, sufs, region: int):
        """Matching suffixes fully inside the region, longest first."""
        out = [s for s in sufs if w.endswith(s) and len(w) - len(s) >= region]
        return sorted(out, key=len, reverse=True)

    # ---- step 1: particles etc. ---------------------------------------
    for suf in candidates(word, ("kaan", "kään", "kin", "han", "hän",
                                 "sti", "ko", "kö", "pa", "pä"), r1):
        pos = len(word) - len(suf)
        if suf == "sti":
            if pos >= r2:
                word = word[:pos]
        else:
            if pos > 0 and word[pos - 1] in _PARTICLE_END:
                word = word[:pos]
        break  # longest match only; a failed condition fails the step

    # ---- step 2: possessives -------------------------------------------
    for suf in candidates(word, ("nsa", "nsä", "mme", "nne", "si", "ni",
                                 "an", "än", "en"), r1):
        pos = len(word) - len(suf)
        if suf == "si":
            if not (pos > 0 and word[pos - 1] == "k"):
                word = word[:pos]
        elif suf == "ni":
            word = word[:pos]
            if word.endswith("kse"):
                word = word[:-3] + "ksi"
        elif suf in ("nsa", "nsä", "mme", "nne"):
            word = word[:pos]
        elif suf == "an":
            if word[:pos].endswith(_POSS_AN):
                word = word[:pos]
        elif suf == "än":
            if word[:pos].endswith(_POSS_AEN):
                word = word[:pos]
        elif suf == "en":
            if word[:pos].endswith(_POSS_EN):
                word = word[:pos]
        break

    # ---- step 3: case endings -------------------------------------------
    for suf in candidates(word, _CASE, r1):
        pos = len(word) - len(suf)
        cond = _CASE[suf]
        if cond in ("VI", "LONG"):
            # method constraints: fall back to shorter matches on failure
            stem = word[:pos]
            if cond == "VI":
                ok = len(stem) >= 2 and stem[-1] == "i" and stem[-2] in _V2
            else:
                ok = stem.endswith(_LONG)
            if not ok:
                continue
            word = stem
            ending_removed = True
        elif cond == "n":
            stem = word[:pos]
            if stem.endswith(_LONG) or stem.endswith("ie"):
                stem = stem[:-1]
            word = stem
            ending_removed = True
        elif cond == "cv":
            if pos >= 2 and word[pos - 1] in _V1 and word[pos - 2] not in _V1:
                word = word[:pos]
                ending_removed = True
        elif cond is None:
            word = word[:pos]
            ending_removed = True
        else:  # single preceding-letter condition
            if pos > 0 and word[pos - 1] == cond:
                word = word[:pos]
                ending_removed = True
        break

    # ---- step 4: other endings (in R2) ------------------------------------
    for suf in candidates(word, _OTHER_COND + _OTHER_UNCOND, r2):
        pos = len(word) - len(suf)
        if suf in _OTHER_COND:
            if not word[:pos].endswith("po"):
                word = word[:pos]
        else:
            word = word[:pos]
        break

    # ---- step 5: plurals ------------------------------------------------
    if ending_removed:
        if word.endswith(("i", "j")) and len(word) - 1 >= r1:
            word = word[:-1]
    else:
        if (
            word.endswith("t")
            and len(word) - 1 >= r1
            and len(word) >= 2
            and word[-2] in _V1
        ):
            word = word[:-1]
            for suf in candidates(word, ("imma", "mma"), r2):
                pos = len(word) - len(suf)
                if suf == "mma":
                    if not word[:pos].endswith("po"):
                        word = word[:pos]
                else:
                    word = word[:pos]
                break

    # ---- step 6: tidy -----------------------------------------------------
    # a) final long vowel inside R1 -> remove last letter
    if word.endswith(_LONG) and len(word) - 2 >= r1:
        word = word[:-1]
    # b) final a/e/i/ä preceded by a consonant, both inside R1
    if (
        len(word) >= 2
        and word[-1] in _AEI
        and word[-2] not in _V1
        and len(word) - 2 >= r1
    ):
        word = word[:-1]
    # c) final oj / uj inside R1 -> drop the j
    if word.endswith(("oj", "uj")) and len(word) - 2 >= r1:
        word = word[:-1]
    # d) final jo inside R1 -> drop the o
    if word.endswith("jo") and len(word) - 2 >= r1:
        word = word[:-1]
    # e) not region-limited: if the last consonant of the word is
    # doubled (followed by zero or more vowels), remove one of them
    i = len(word) - 1
    while i >= 0 and word[i] in _V1:
        i -= 1
    if i >= 1 and word[i] not in _V1 and word[i - 1] == word[i]:
        word = word[:i] + word[i + 1 :]
    return word
