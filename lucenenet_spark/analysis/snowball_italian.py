"""Snowball Italian stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/italian/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Italian") role
(``Tartarus/Snowball/Ext/ItalianStemmer.cs``); validated against the
full published test vocabulary (35 494 words) during development.
"""

from __future__ import annotations

_VOWELS = set("aeiouàèìòù")

_ACUTE_TO_GRAVE = str.maketrans("áéíóú", "àèìòù")

_PRONOUNS = [
    "gliela", "gliele", "glieli", "glielo", "gliene", "sene",
    "mela", "mele", "meli", "melo", "mene", "tela", "tele", "teli",
    "telo", "tene", "cela", "cele", "celi", "celo", "cene", "vela",
    "vele", "veli", "velo", "vene", "gli", "ci", "la", "le", "li",
    "lo", "mi", "ne", "si", "ti", "vi",
]

_STEP1 = [
    "atrice", "atrici", "azione", "azioni", "uzione", "uzioni",
    "usione", "usioni", "amento", "amenti", "imento", "imenti",
    "amente", "abile", "abili", "ibile", "ibili", "mente", "atore",
    "atori", "logia", "logie", "anza", "anze", "iche", "ichi",
    "ismo", "ismi", "ista", "iste", "isti", "istà", "istè", "istì",
    "ante", "anti", "enza", "enze", "ico", "ici", "ica", "ice",
    "oso", "osi", "osa", "ose", "ità", "ivo", "ivi", "iva", "ive",
]

_STEP2 = [
    "erebbero", "irebbero", "assero", "assimo", "eranno", "erebbe",
    "eremmo", "ereste", "eresti", "essero", "iranno", "irebbe",
    "iremmo", "ireste", "iresti", "iscano", "iscono", "issero",
    "arono", "avamo", "avano", "avate", "eremo", "erete", "erono",
    "evamo", "evano", "evate", "iremo", "irete", "irono", "ivamo",
    "ivano", "ivate", "ammo", "ando", "asse", "assi", "emmo",
    "enda", "ende", "endi", "endo", "erai", "erei", "Yamo", "iamo",
    "immo", "irai", "irei", "isca", "isce", "isci", "isco", "ano",
    "are", "ata", "ate", "ati", "ato", "ava", "avi", "avo", "erà",
    "ere", "erò", "ete", "eva", "evi", "evo", "irà", "ire", "irò",
    "ita", "ite", "iti", "ito", "iva", "ivi", "ivo", "ono", "uta",
    "ute", "uti", "uto", "ar", "ir",
]


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    rv = n
    if n >= 2:
        if word[1] not in _VOWELS:
            for i in range(2, n):
                if word[i] in _VOWELS:
                    rv = i + 1
                    break
        elif word[0] in _VOWELS and word[1] in _VOWELS:
            for i in range(2, n):
                if word[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            if n >= 3:
                rv = 3
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
    return rv, r1, r2


def italian_stem(word: str) -> str:
    if not word:
        return word
    word = word.translate(_ACUTE_TO_GRAVE)
    # mark u after q, and u/i between vowels, as consonants
    chars = list(word)
    n = len(chars)
    for i in range(n):
        if chars[i] == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
        elif (
            chars[i] in "ui"
            and 0 < i < n - 1
            and chars[i - 1] in _VOWELS
            and chars[i + 1] in _VOWELS
        ):
            chars[i] = chars[i].upper()
    word = "".join(chars)

    rv, r1, r2 = _regions(word)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

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

    # ---- step 0: attached pronoun -----------------------------------
    pron = longest_in_rv(word, _PRONOUNS)
    if pron is not None:
        base = word[: -len(pron)]
        if (base.endswith(("ando", "endo"))) and in_rv(len(base) - 4):
            word = base
        elif base.endswith(("ar", "er", "ir")) and in_rv(len(base) - 2):
            word = base + "e"

    # ---- step 1 ------------------------------------------------------
    before1 = word
    suf = None
    for s in sorted(_STEP1, key=len, reverse=True):
        if word.endswith(s):
            suf = s
            break
    if suf is not None:
        pos = len(word) - len(suf)
        if suf == "amente":
            if in_r1(pos):
                word = word[:pos]
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                elif word.endswith(("os", "ic")) and in_r2(len(word) - 2):
                    word = word[:-2]
                elif word.endswith("abil") and in_r2(len(word) - 4):
                    word = word[:-4]
        elif suf in ("amento", "amenti", "imento", "imenti"):
            if in_rv(pos):
                word = word[:pos]
        elif suf in ("azione", "azioni", "atore", "atori"):
            if in_r2(pos):
                word = word[:pos]
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf in ("logia", "logie"):
            if in_r2(pos):
                word = word[:pos] + "log"
        elif suf in ("uzione", "uzioni", "usione", "usioni"):
            if in_r2(pos):
                word = word[:pos] + "u"
        elif suf in ("enza", "enze"):
            if in_r2(pos):
                word = word[:pos] + "ente"
        elif suf == "ità":
            if in_r2(pos):
                word = word[:pos]
                for p2 in ("abil", "ic", "iv"):
                    if word.endswith(p2) and in_r2(len(word) - len(p2)):
                        word = word[: -len(p2)]
                        break
        elif suf in ("ivo", "ivi", "iva", "ive"):
            if in_r2(pos):
                word = word[:pos]
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("ic") and in_r2(len(word) - 2):
                        word = word[:-2]
        else:
            if in_r2(pos):
                word = word[:pos]

    # ---- step 2 (if step 1 removed nothing) --------------------------
    if word == before1:
        suf = longest_in_rv(word, _STEP2)
        if suf is not None:
            word = word[: -len(suf)]

    # ---- step 3a ------------------------------------------------------
    if word and word[-1] in "aeioàèìò" and in_rv(len(word) - 1):
        word = word[:-1]
        if word and word[-1] == "i" and in_rv(len(word) - 1):
            word = word[:-1]

    # ---- step 3b ------------------------------------------------------
    if word.endswith(("ch", "gh")) and in_rv(len(word) - 2):
        word = word[:-1]

    return word.replace("I", "i").replace("U", "u")
