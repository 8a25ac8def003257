"""Snowball Hungarian stemmer — implemented from the published
algorithm (snowballstem.org/algorithms/hungarian/stemmer.html; public
domain).  Fills the reference's SnowballFilter(name="Hungarian") role
(``Tartarus/Snowball/Ext/HungarianStemmer.cs``); validated against the
full published test vocabulary (30 000 words) during development.

Dialect note: the 4.8-era stemmer spells the long-umlaut vowels with
the circumflex/tilde forms (õ U+00F5 for ő, û U+00FB for ű), matching
its published test vocabulary.

Shape: every step's suffix among is longest-match at the end of the
word with the R1 condition checked afterwards — a failed condition
does NOT backtrack.  Step order: instrumental case → general case →
special case → 'stul' family → factive → owned → singular owner →
plural owner → plural; each step runs unconditionally (`do`).
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóõöúûü")

_DIGRAPHS = ("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")

_DOUBLES = (
    "ccs", "ggy", "lly", "nny", "ssz", "tty", "zzs",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn",
    "pp", "rr", "ss", "tt", "vv", "zz",
)

# suffix tables: suffix -> replacement ('' = delete)
_CASE = {s: "" for s in (
    "ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel", "ul",
    "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl", "ül",
    "n", "an", "ban", "en", "ben", "képpen", "on", "ön", "képp",
    "kor", "t", "at", "et", "ként", "anként", "enként", "onként",
    "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé",
)}
_CASE_SPECIAL = {"én": "e", "án": "a", "ánként": "a"}
_CASE_OTHER = {"astul": "", "stul": "", "ástul": "a",
               "stül": "", "estül": "", "éstül": "e"}
_PLURAL = {"ák": "a", "ék": "e", "ök": "", "ak": "", "ok": "",
           "ek": "", "k": ""}
_OWNED = {"éi": "", "áéi": "a", "ééi": "e", "é": "", "ké": "",
          "aké": "", "eké": "", "oké": "", "áké": "a", "éké": "e",
          "öké": "", "éé": "e"}
_SING_OWNER = {
    "unk": "", "ünk": "", "ánk": "a", "énk": "e", "nk": "",
    "ájuk": "a", "éjük": "e", "juk": "", "jük": "", "uk": "", "ük": "",
    "am": "", "em": "", "om": "", "ám": "a", "ém": "e", "m": "",
    "ad": "", "ed": "", "od": "", "öd": "", "ád": "a", "éd": "e",
    "d": "",
    "ja": "", "je": "", "a": "", "e": "", "o": "",
    "á": "a", "é": "e",
}
_PLUR_OWNER = {
    "jaim": "", "jeim": "", "áim": "a", "éim": "e", "aim": "",
    "eim": "", "im": "",
    "jaid": "", "jeid": "", "áid": "a", "éid": "e", "aid": "",
    "eid": "", "id": "",
    "jai": "", "jei": "", "ái": "a", "éi": "e", "ai": "", "ei": "",
    "i": "",
    "jaink": "", "jeink": "", "áink": "a", "éink": "e", "aink": "",
    "eink": "", "ink": "",
    "jaitok": "", "jeitek": "", "áitok": "a", "éitek": "e",
    "aitok": "", "eitek": "", "itek": "",
    "jaik": "", "jeik": "", "áik": "a", "éik": "e", "aik": "",
    "eik": "", "ik": "",
}


def _mark_r1(word: str) -> int:
    n = len(word)
    if not word:
        return n
    if word[0] in _VOWELS:
        # after the first non-vowel (a digraph counts whole)
        for i in range(1, n):
            if word[i] not in _VOWELS:
                for d in _DIGRAPHS:
                    if word.startswith(d, i):
                        return i + len(d)
                return i + 1
        return n
    # starts with a consonant: after the first vowel
    for i in range(n):
        if word[i] in _VOWELS:
            return i + 1
    return n


def _longest(word: str, table) -> str | None:
    best = None
    for suf in table:
        if word.endswith(suf) and (best is None or len(suf) > len(best)):
            best = suf
    return best


def hungarian_stem(word: str) -> str:
    if not word:
        return word
    r1 = _mark_r1(word)

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def undouble(w: str) -> str:
        # remove the second-to-last character (ccs -> cs, bb -> b)
        return w[:-2] + w[-1] if len(w) >= 2 else w

    def apply(w: str, table, *, double_undouble: bool = False,
              v_ending: bool = False) -> str:
        suf = _longest(w, table)
        if suf is None:
            return w
        pos = len(w) - len(suf)
        if not in_r1(pos):
            return w
        if double_undouble:
            if not w[:pos].endswith(_DOUBLES):
                return w
            return undouble(w[:pos])
        w = w[:pos] + table[suf]
        if v_ending:
            # final á -> a, é -> e if in R1
            if w.endswith("á") and in_r1(len(w) - 1):
                w = w[:-1] + "a"
            elif w.endswith("é") and in_r1(len(w) - 1):
                w = w[:-1] + "e"
        return w

    # instrumental: al/el after a double consonant, then undouble
    for suf in ("al", "el"):
        if word.endswith(suf) and in_r1(len(word) - 2) \
                and word[:-2].endswith(_DOUBLES):
            word = undouble(word[:-2])
            break

    word = apply(word, _CASE, v_ending=True)
    word = apply(word, _CASE_SPECIAL)
    word = apply(word, _CASE_OTHER)

    # factive: á/é after a double consonant, then undouble
    for suf in ("á", "é"):
        if word.endswith(suf) and in_r1(len(word) - 1) \
                and word[:-1].endswith(_DOUBLES):
            word = undouble(word[:-1])
            break

    word = apply(word, _OWNED)
    word = apply(word, _SING_OWNER)
    word = apply(word, _PLUR_OWNER)
    word = apply(word, _PLURAL)
    return word
