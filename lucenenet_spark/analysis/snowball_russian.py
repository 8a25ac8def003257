"""Snowball Russian stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/russian/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Russian") role
(``Tartarus/Snowball/Ext/RussianStemmer.cs``); validated against the
full published test vocabulary (49 673 words) during development.
"""

from __future__ import annotations

_VOWELS = set("аеиоуыэюя")

# group-1 endings require a preceding а/я (which stays); group-2 do not
_PERF_GERUND_1 = ["вшись", "вши", "в"]
_PERF_GERUND_2 = ["ившись", "ывшись", "ивши", "ывши", "ив", "ыв"]

_ADJECTIVE = [
    "ими", "ыми", "его", "ого", "ему", "ому", "ее", "ие", "ые", "ое",
    "ей", "ий", "ый", "ой", "ем", "им", "ым", "ом", "их", "ых",
    "ую", "юю", "ая", "яя", "ою", "ею",
]
_PARTICIPLE_1 = ["ем", "нн", "вш", "ющ", "щ"]
_PARTICIPLE_2 = ["ивш", "ывш", "ующ"]

_REFLEXIVE = ["ся", "сь"]

_VERB_1 = [
    "ешь", "нно", "ете", "йте", "ла", "на", "ли", "ем", "ло", "но",
    "ет", "ют", "ны", "ть", "й", "л", "н",
]
_VERB_2 = [
    "ейте", "уйте", "ила", "ыла", "ена", "ите", "или", "ыли", "ило",
    "ыло", "ено", "ует", "уют", "ены", "ить", "ыть", "ишь", "ей",
    "уй", "ил", "ыл", "им", "ым", "ен", "ят", "ит", "ыт", "ую", "ю",
]

_NOUN = [
    "иями", "ями", "ами", "ией", "иям", "ием", "иях", "ев", "ов",
    "ие", "ье", "еи", "ии", "ей", "ой", "ий", "ям", "ем", "ам",
    "ом", "ах", "ях", "ию", "ью", "ия", "ья", "а", "е", "и", "й",
    "о", "у", "ы", "ь", "ю", "я",
]

_SUPERLATIVE = ["ейше", "ейш"]


def russian_stem(word: str) -> str:
    if not word:
        return word
    word = word.replace("ё", "е")
    n = len(word)
    rv = n
    for i in range(n):
        if word[i] in _VOWELS:
            rv = i + 1
            break
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

    def longest_in_rv(w: str, suffixes) -> str | None:
        best = None
        for suf in suffixes:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best))
            ):
                best = suf
        return best

    def try_group12(w: str, group1, group2) -> str | None:
        """Longest match across both groups (group-1 items need a
        preceding а/я in RV); returns the shortened word or None."""
        best, need_ay = None, False
        for suf in group1:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best))
            ):
                best, need_ay = suf, True
        for suf in group2:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best))
            ):
                best, need_ay = suf, False
        if best is None:
            return None
        pos = len(w) - len(best)
        if need_ay:
            if pos == 0 or w[pos - 1] not in "ая" or pos - 1 < rv:
                return None
        return w[:pos]

    # ---- step 1 ------------------------------------------------------
    got = try_group12(word, _PERF_GERUND_1, _PERF_GERUND_2)
    if got is not None:
        word = got
    else:
        suf = longest_in_rv(word, _REFLEXIVE)
        if suf is not None:
            word = word[: -len(suf)]
        # (1) adjectival = adjective, optionally preceded by participle
        suf = longest_in_rv(word, _ADJECTIVE)
        if suf is not None:
            word = word[: -len(suf)]
            got = try_group12(word, _PARTICIPLE_1, _PARTICIPLE_2)
            if got is not None:
                word = got
        else:
            # (2) verb
            got = try_group12(word, _VERB_1, _VERB_2)
            if got is not None:
                word = got
            else:
                # (3) noun
                suf = longest_in_rv(word, _NOUN)
                if suf is not None:
                    word = word[: -len(suf)]

    # ---- step 2: final и ----------------------------------------------
    if word.endswith("и") and len(word) - 1 >= rv:
        word = word[:-1]

    # ---- step 3: derivational (entirely in R2) -------------------------
    for suf in ("ость", "ост"):
        if word.endswith(suf) and len(word) - len(suf) >= r2:
            word = word[: -len(suf)]
            break

    # ---- step 4 ---------------------------------------------------------
    if word.endswith("нн") and len(word) - 1 >= rv:
        word = word[:-1]
    else:
        suf = longest_in_rv(word, _SUPERLATIVE)
        if suf is not None:
            word = word[: -len(suf)]
            if word.endswith("нн") and len(word) - 1 >= rv:
                word = word[:-1]
        elif word.endswith("ь") and len(word) - 1 >= rv:
            word = word[:-1]

    return word
