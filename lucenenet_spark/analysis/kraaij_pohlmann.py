"""Kraaij-Pohlmann Dutch stemmer — implemented from the published
algorithm (W. Kraaij & R. Pohlmann, "Porter's stemming algorithm for
Dutch", 1994; the snowballstem.org kraaij_pohlmann page carries the
same rules; public domain).  Fills the reference's
SnowballFilter(name="Kp") role
(``Tartarus/Snowball/Ext/KpStemmer.cs``); validated against the full
published test vocabulary during development.

Shape: y-marking prelude (initial y and y-after-vowel act as
consonants), a measure pass where ``ij`` counts as one vowel unit,
four end-suffix steps, ge- prefix/infix loss with re-measure and a
d/t cleanup, a devoicing step, and an undouble step gated on whether
anything stemmed."""

from __future__ import annotations

_V = set("aeiouy")
_V_WX = set("aeiouywx")
_AOU = set("aou")
_AIOU = set("aiou")


def _measure(word: str) -> tuple[int, int]:
    """p1/p2 with 'ij' counting as a single vowel unit; marked 'Y' is
    a consonant (uppercase, outside the sets)."""
    n = len(word)
    p1 = p2 = n
    i = 0
    for round_ in (1, 2):
        while i < n and word[i] not in _V:
            i += 1
        cnt = 0
        while i < n:
            if word.startswith("ij", i):
                i += 2
            elif word[i] in _V:
                i += 1
            else:
                break
            cnt += 1
        if cnt < 1 or i >= n or word[i] in _V:
            return p1, p2
        i += 1
        if round_ == 1:
            p1 = i
        else:
            p2 = i
    return p1, p2


def _V_at(word: str, p: int) -> bool:
    return (p >= 1 and word[p - 1] in _V) or (p >= 2 and word[p - 2 : p] == "ij")


def _VX_at(word: str, p: int) -> bool:
    return p >= 1 and _V_at(word, p - 1)


def _C_at(word: str, p: int) -> bool:
    if p >= 2 and word[p - 2 : p] == "ij":
        return False
    return p >= 1 and word[p - 1] not in _V


def _lengthen(word: str) -> str:
    """lengthen_V at the end of the word: double a final-syllable
    a/o/u or e in a C V C pattern (last consonant not w/x/y)."""
    n = len(word)
    if n < 1 or word[n - 1] in _V_WX:
        return word
    if n >= 2 and word[n - 2] in _AOU:
        # the char before the vowel must be a consonant, or the vowel
        # starts the word
        if n == 2 or word[n - 3] not in _V:
            return word[: n - 2] + word[n - 2] + word[n - 2 :]
        return word
    if n >= 2 and word[n - 2] == "e":
        if not (n == 2 or word[n - 3] not in _V):
            return word
        if n >= 4 and word[n - 4] in _AIOU:
            return word
        if (
            n - 3 > 0
            and n >= 5
            and word[n - 5] in _AIOU
            and n - 5 > 0
            and word[n - 6] not in _V
        ):
            return word
        return word[: n - 2] + "e" + word[n - 2 :]
    return word


def kp_stem(word: str) -> str:
    if not word:
        return word

    # ---- prelude: mark consonant-role y --------------------------------
    y_found = False
    chars = list(word)
    if chars[0] == "y":
        chars[0] = "Y"
        y_found = True
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in _V:
            chars[i] = "Y"
            y_found = True
    word = "".join(chars)

    p1, p2 = _measure(word)
    stemmed = False

    def R1(pos: int) -> bool:
        return pos >= p1

    def R2(pos: int) -> bool:
        return pos >= p2

    def longest(w: str, sufs):
        best = None
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        return best

    # ---- Step 1 ----------------------------------------------------------
    def step1(w: str) -> "str | None":
        suf = longest(w, ("nde", "ies", "aus", "'s", "en", "es", "s"))
        if suf is None:
            return None
        pos = len(w) - len(suf)
        if suf == "'s":
            return w[:pos]
        if suf == "s":
            if not R1(pos) or not _C_at(w, pos):
                return None
            if pos >= 1 and w[pos - 1] == "t" and R1(pos - 1):
                return None
            return w[:pos]
        if suf == "ies":
            return w[:pos] + "ie" if R1(pos) else None
        if suf == "es":
            if w.endswith("ares", len(w) - len(suf) - 2 and 0 or 0):
                pass
            if w[:pos].endswith("ar") and R1(pos - 2) and _C_at(w, pos - 2):
                return _lengthen(w[: pos - 2])
            if w[:pos].endswith("er") and R1(pos - 2) and _C_at(w, pos - 2):
                return w[: pos - 2]
            if R1(pos) and _C_at(w, pos):
                return w[:pos] + "e"
            return None
        if suf == "aus":
            return w[:pos] + "au" if R1(pos) and _V_at(w, pos) else None
        if suf == "en":
            if w[:pos].endswith("hed") and R1(pos - 3):
                return w[: pos - 3] + "heid"
            if w[:pos].endswith("nd"):
                return w[:pos]
            if w[:pos].endswith("d") and R1(pos - 1) and _C_at(w, pos - 1):
                return w[: pos - 1]
            if (w[:pos].endswith("i") or w[:pos].endswith("j")) and _V_at(w, pos - 1):
                return w[:pos]
            if R1(pos) and _C_at(w, pos):
                return _lengthen(w[:pos])
            return None
        if suf == "nde":
            return w[:pos] + "nd"
        return None

    # ---- Step 2 ----------------------------------------------------------
    def step2(w: str) -> "str | None":
        suf = longest(w, ("ische", "lijke", "ieve", "ene", "de", "ge",
                          "je", "le", "re", "se", "te"))
        if suf is None:
            return None
        pos = len(w) - len(suf)
        if suf == "je":
            # or-chain: a failed condition falls through to the next
            # sub-rule (unlike a failed among row)
            s = w[:pos]
            if s.endswith("'t"):
                return w[: pos - 2]
            if s.endswith("et") and R1(pos - 2) and _C_at(w, pos - 2):
                return w[: pos - 2]
            if s.endswith("rnt"):
                return w[: pos - 3] + "rn"
            if s.endswith("t") and R1(pos - 1) and _VX_at(w, pos - 1):
                return w[: pos - 1]
            if s.endswith("ink"):
                return w[: pos - 3] + "ing"
            if s.endswith("mp"):
                return w[: pos - 2] + "m"
            if s.endswith("'") and R1(pos - 1):
                return w[: pos - 1]
            if R1(pos) and _C_at(w, pos):
                return w[:pos]
            return None
        if suf == "ge":
            return w[:pos] + "g" if R1(pos) else None
        if suf == "lijke":
            return w[:pos] + "lijk" if R1(pos) else None
        if suf == "ische":
            return w[:pos] + "isch" if R1(pos) else None
        if suf == "de":
            return w[:pos] if R1(pos) and _C_at(w, pos) else None
        if suf == "te":
            return w[:pos] + "t" if R1(pos) else None
        if suf == "se":
            return w[:pos] + "s" if R1(pos) else None
        if suf == "re":
            return w[:pos] + "r" if R1(pos) else None
        if suf == "le":
            return _lengthen(w[:pos] + "l") if R1(pos) else None
        if suf == "ene":
            if R1(pos) and _C_at(w, pos):
                return _lengthen(w[:pos] + "en")
            return None
        if suf == "ieve":
            return w[:pos] + "ief" if R1(pos) and _C_at(w, pos) else None
        return None

    # ---- Step 3 ----------------------------------------------------------
    def step3(w: str) -> "str | None":
        suf = longest(w, ("heid", "fie", "gie", "atie", "isme", "ing",
                          "arij", "erij", "sel", "rder", "ster", "iteit",
                          "dst", "tst"))
        if suf is None:
            return None
        pos = len(w) - len(suf)
        if suf == "atie":
            return w[:pos] + "eer" if R1(pos) else None
        if suf == "iteit":
            return _lengthen(w[:pos]) if R1(pos) else None
        if suf in ("heid", "sel", "ster"):
            return w[:pos] if R1(pos) else None
        if suf == "rder":
            return w[:pos] + "r"
        if suf in ("ing", "isme", "erij"):
            return _lengthen(w[:pos]) if R1(pos) else None
        if suf == "arij":
            return w[:pos] + "aar" if R1(pos) and _C_at(w, pos) else None
        if suf == "fie":
            return _lengthen(w[:pos] + "f") if R2(pos) else None
        if suf == "gie":
            return _lengthen(w[:pos] + "g") if R2(pos) else None
        if suf == "tst":
            return w[:pos] + "t" if R1(pos) and _C_at(w, pos) else None
        if suf == "dst":
            return w[:pos] + "d" if R1(pos) and _C_at(w, pos) else None
        return None

    # ---- Step 4 ----------------------------------------------------------
    def step4(w: str) -> "str | None":
        suf = longest(w, ("ioneel", "atief", "baar", "naar", "laar",
                          "raar", "tant", "lijker", "lijkst", "achtiger",
                          "achtigst", "achtig", "eriger", "erigst",
                          "erig", "end"))
        out = None
        if suf is not None:
            pos = len(w) - len(suf)
            if suf == "ioneel":
                out = w[:pos] + "ie" if R1(pos) else None
            elif suf == "atief":
                out = w[:pos] + "eer" if R1(pos) else None
            elif suf == "baar":
                out = w[:pos] if R1(pos) else None
            elif suf == "naar":
                out = w[:pos] + "n" if R1(pos) and _V_at(w, pos) else None
            elif suf == "laar":
                out = w[:pos] + "l" if R1(pos) and _V_at(w, pos) else None
            elif suf == "raar":
                out = w[:pos] + "r" if R1(pos) and _V_at(w, pos) else None
            elif suf == "tant":
                out = w[:pos] + "teer" if R1(pos) else None
            elif suf in ("lijker", "lijkst"):
                out = w[:pos] + "lijk" if R1(pos) else None
            elif suf in ("achtig", "achtiger", "achtigst"):
                out = w[:pos] if R1(pos) else None
            elif suf in ("end", "erig", "eriger", "erigst"):
                out = (
                    _lengthen(w[:pos])
                    if R1(pos) and _C_at(w, pos)
                    else None
                )
        if out is not None:
            return out
        # second among: ig/iger/igst
        suf = longest(w, ("iger", "igst", "ig"))
        if suf is None:
            return None
        pos = len(w) - len(suf)
        if R1(pos) and _C_at(w, pos):
            return _lengthen(w[:pos])
        return None

    # ---- Step 7 / Step 6 / Step 1c ---------------------------------------
    def step7(w: str) -> "str | None":
        for suf, rep in (("kt", "k"), ("ft", "f"), ("pt", "p")):
            if w.endswith(suf):
                return w[: -2] + rep
        return None

    _DOUBLES = ("bb", "cc", "dd", "ff", "gg", "hh", "jj", "kk", "ll",
                "mm", "nn", "pp", "qq", "rr", "ss", "tt", "vv", "ww",
                "xx", "zz")

    def step6(w: str) -> "str | None":
        if w.endswith(_DOUBLES):
            return w[:-1]
        if w.endswith("v"):
            return w[:-1] + "f"
        if w.endswith("z"):
            return w[:-1] + "s"
        return None

    def step1c(w: str) -> "str | None":
        if w.endswith("d"):
            pos = len(w) - 1
            if R1(pos) and _C_at(w, pos):
                if pos >= 1 and w[pos - 1] == "n" and R1(pos - 1):
                    return None
                return w[:pos]
            return None
        if w.endswith("t"):
            pos = len(w) - 1
            if R1(pos) and _C_at(w, pos):
                if pos >= 1 and w[pos - 1] == "h" and R1(pos - 1):
                    return None
                return w[:pos]
            return None
        return None

    # ---- backward suffix steps --------------------------------------------
    for step in (step1, step2, step3, step4):
        r = step(word)
        if r is not None:
            word = r
            stemmed = True

    # ---- ge- prefix loss ----------------------------------------------------
    def _rest_has_vc(w: str, start: int) -> bool:
        i = start
        n = len(w)
        while i < n and w[i] not in _V:
            i += 1
        if i >= n:
            return False
        while i < n and w[i] in _V:
            i += 1
        return i < n

    ge_removed = False
    if word.startswith("ge") and len(word) >= 5 and _rest_has_vc(word, 2):
        word = word[2:]
        ge_removed = True
        p1, p2 = _measure(word)
    if ge_removed:
        r = step1c(word)
        if r is not None:
            word = r

    # ---- ge- infix loss -------------------------------------------------------
    ge_removed = False
    ig = word.find("ge", 1)
    if ig >= 1 and len(word) - (ig + 2) >= 3 and _rest_has_vc(word, ig + 2):
        word = word[:ig] + word[ig + 2 :]
        ge_removed = True
        p1, p2 = _measure(word)
    if ge_removed:
        r = step1c(word)
        if r is not None:
            word = r

    # ---- Step 7 then gated Step 6 ----------------------------------------------
    r = step7(word)
    if r is not None:
        word = r
        stemmed = True
    if stemmed or ge_removed:
        r = step6(word)
        if r is not None:
            word = r

    if y_found:
        word = word.replace("Y", "y")
    return word
