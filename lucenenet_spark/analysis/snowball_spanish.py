"""Snowball Spanish stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/spanish/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Spanish") role
(``Tartarus/Snowball/Ext/SpanishStemmer.cs``); validated against the
full published test vocabulary (28 390 words) during development.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúü")

_ACCENT = str.maketrans("áéíóú", "aeiou")

_PRONOUNS = [
    "selas", "selos", "sela", "selo", "las", "les", "los", "nos",
    "me", "se", "la", "le", "lo",
]
_PRON_PRE_A = ["iéndo", "ándo", "ár", "ér", "ír"]  # remove accent after
_PRON_PRE_B = ["iendo", "ando", "ar", "er", "ir"]

_STEP1 = [
    "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
    "adoras", "adores", "ancias", "logías", "encias", "amente",
    "idades", "anzas", "ismos", "ables", "ibles", "istas", "adora",
    "ación", "antes", "ancia", "logía", "ución", "encia", "mente",
    "anza", "icos", "icas", "ismo", "able", "ible", "ista", "osos",
    "osas", "ador", "ante", "idad", "ivas", "ivos", "ico", "ica",
    "oso", "osa", "iva", "ivo",
]

_STEP2A = [
    "yeron", "yendo", "yamos", "yais", "yan", "yen", "yas", "yes",
    "ya", "ye", "yo", "yó",
]

_STEP2B_GU = ["emos", "éis", "en", "es"]
_STEP2B = [
    "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
    "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
    "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
    "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
    "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
    "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
    "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
    "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
    "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
    "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
    "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
    "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
    "ís",
]

_STEP3 = ["os", "a", "o", "á", "í", "ó", "e", "é"]


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    rv = n
    if n >= 2:
        if word[1] not in _VOWELS:
            # after the next following vowel
            for i in range(2, n):
                if word[i] in _VOWELS:
                    rv = i + 1
                    break
        elif word[0] in _VOWELS and word[1] in _VOWELS:
            # after the next following consonant
            for i in range(2, n):
                if word[i] not in _VOWELS:
                    rv = i + 1
                    break
        else:
            # consonant-vowel: after the third letter
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


def spanish_stem(word: str) -> str:
    if not word:
        return word
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
        for pre in _PRON_PRE_A:
            if base.endswith(pre) and len(base) - len(pre) >= rv - 0 and in_rv(len(base) - len(pre)):
                word = base.translate(_ACCENT)
                break
        else:
            for pre in _PRON_PRE_B:
                if base.endswith(pre) and in_rv(len(base) - len(pre)):
                    word = base
                    break
            else:
                if base.endswith("yendo") and base[: -5].endswith("u"):
                    # the preceding u need not be in RV
                    if in_rv(len(base) - 5):
                        word = base

    # ---- step 1 ------------------------------------------------------
    before1 = word
    suf = None
    for s in sorted(_STEP1, key=len, reverse=True):
        if word.endswith(s):
            suf = s
            break
    if suf is not None:
        pos = len(word) - len(suf)
        if suf in ("amente",):
            if in_r1(pos):
                word = word[:pos]
                if word.endswith("iv") and in_r2(len(word) - 2):
                    word = word[:-2]
                    if word.endswith("at") and in_r2(len(word) - 2):
                        word = word[:-2]
                elif word.endswith(("os", "ic", "ad")) and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf == "mente":
            if in_r2(pos):
                word = word[:pos]
                for p2 in ("ante", "able", "ible"):
                    if word.endswith(p2) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif suf in ("logía", "logías"):
            if in_r2(pos):
                word = word[:pos] + "log"
        elif suf in ("ución", "uciones"):
            if in_r2(pos):
                word = word[:pos] + "u"
        elif suf in ("encia", "encias"):
            if in_r2(pos):
                word = word[:pos] + "ente"
        elif suf in ("adora", "ador", "ación", "adoras", "adores",
                     "aciones", "ante", "antes", "ancia", "ancias"):
            if in_r2(pos):
                word = word[:pos]
                if word.endswith("ic") and in_r2(len(word) - 2):
                    word = word[:-2]
        elif suf in ("idad", "idades"):
            if in_r2(pos):
                word = word[:pos]
                for p2 in ("abil", "ic", "iv"):
                    if word.endswith(p2) and in_r2(len(word) - len(p2)):
                        word = word[: -len(p2)]
                        break
        elif suf in ("iva", "ivo", "ivas", "ivos"):
            if in_r2(pos):
                word = word[:pos]
                if word.endswith("at") and in_r2(len(word) - 2):
                    word = word[:-2]
        else:
            if in_r2(pos):
                word = word[:pos]

    step1_removed = word != before1

    # ---- step 2a -------------------------------------------------------
    step2a_removed = False
    if not step1_removed:
        suf = longest_in_rv(word, _STEP2A)
        if suf is not None:
            pos = len(word) - len(suf)
            if pos > 0 and word[pos - 1] == "u":
                word = word[:pos]
                step2a_removed = True

    # ---- step 2b -------------------------------------------------------
    if not step1_removed and not step2a_removed:
        suf = longest_in_rv(word, _STEP2B_GU + _STEP2B)
        if suf is not None:
            pos = len(word) - len(suf)
            word = word[:pos]
            if suf in _STEP2B_GU and word.endswith("gu"):
                # the u need not be in RV
                word = word[:-1]

    # ---- step 3 --------------------------------------------------------
    suf = longest_in_rv(word, _STEP3)
    if suf is not None:
        pos = len(word) - len(suf)
        word = word[:pos]
        if suf in ("e", "é") and word.endswith("gu") and in_rv(len(word) - 1):
            word = word[:-1]

    return word.translate(_ACCENT)
