"""Snowball French stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/french/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="French") role
(``Tartarus/Snowball/Ext/FrenchStemmer.cs``); validated against the
full published test vocabulary (20 403 words) during development.
"""

from __future__ import annotations

_VOWELS = set("aeiouyâàëéêèïîôûù")


def _prelude(word: str) -> str:
    """Mark u/i between vowels, y next to a vowel, and u after q as
    consonants (upper case)."""
    chars = list(word)
    n = len(chars)
    for i in range(n):
        c = chars[i]
        if c in "ui" and 0 < i < n - 1:
            if chars[i - 1].lower() in _VOWELS and chars[i - 1] not in "UIY":
                if chars[i + 1] in _VOWELS:
                    chars[i] = c.upper()
        if c == "y":
            prev_v = i > 0 and chars[i - 1] in _VOWELS
            next_v = i < n - 1 and chars[i + 1] in _VOWELS
            if prev_v or next_v:
                chars[i] = "Y"
        if c == "u" and i > 0 and chars[i - 1] == "q":
            chars[i] = "U"
    return "".join(chars)


def _regions(word: str) -> tuple[int, int, int]:
    n = len(word)
    # RV
    rv = n
    if n >= 3 and word[0] in _VOWELS and word[1] in _VOWELS:
        rv = 3
    elif word[:3] in ("par", "col", "tap"):
        rv = 3
    else:
        for i in range(1, n):
            if word[i] in _VOWELS:
                rv = i + 1
                break
    # R1 / R2 (standard)
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


_STEP1 = [
    # (suffix, handler-key) — longest-first scan
    "issements", "issement", "atrices", "atrice", "ateurs", "ations",
    "logies", "usions", "utions", "ements", "amment", "emment",
    "ances", "iqUes", "ismes", "ables", "istes", "ateur", "ation",
    "logie", "usion", "ution", "ences", "ement", "euses", "ments",
    "ance", "iqUe", "isme", "able", "iste", "ence", "ités", "ives",
    "eaux", "euse", "ment", "eux", "ité", "ive", "ifs", "aux", "if",
]

_STEP2A = [
    "issaIent", "issantes", "iraIent", "issante", "issants", "issions",
    "irions", "issais", "issait", "issant", "issent", "issiez", "issons",
    "irais", "irait", "irent", "iriez", "irons", "iront", "isses",
    "issez", "îmes", "îtes", "irai", "iras", "irez", "isse",
    "ies", "ira", "ît", "ie", "ir", "is", "it", "i",
]

_STEP2B_ER = [
    "eraIent", "erions", "èrent", "erais", "erait", "eriez", "erons",
    "eront", "erai", "eras", "erez", "ées", "era", "iez", "ée", "és",
    "er", "ez", "é",
]
_STEP2B_A = [
    "assions", "assent", "assiez", "antes", "aIent", "asses", "âmes",
    "âtes", "ante", "ants", "asse", "ais", "ait", "ant", "ât", "ai",
    "as", "a",
]


def french_stem(word: str) -> str:
    if not word:
        return word
    word = _prelude(word)
    rv, r1, r2 = _regions(word)

    def in_rv(pos: int) -> bool:
        return pos >= rv

    def in_r1(pos: int) -> bool:
        return pos >= r1

    def in_r2(pos: int) -> bool:
        return pos >= r2

    original = word
    altered = False  # by step 1 / 2a / 2b
    do_step2 = True  # step 1 may forbid step 2

    # ---- step 1 ----------------------------------------------------
    w = word
    matched = None
    for suf in sorted(_STEP1, key=len, reverse=True):
        if w.endswith(suf):
            matched = suf
            break
    if matched:
        pos = len(w) - len(matched)
        base = matched.rstrip("s") if matched.endswith("s") else matched
        if matched in ("ances", "ance", "iqUes", "iqUe", "ismes", "isme",
                       "ables", "able", "istes", "iste", "eux"):
            if in_r2(pos):
                w = w[:pos]
        elif matched in ("atrices", "atrice", "ateurs", "ateur",
                         "ations", "ation"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
        elif matched in ("logies", "logie"):
            if in_r2(pos):
                w = w[:pos] + "log"
        elif matched in ("usions", "usion", "utions", "ution"):
            if in_r2(pos):
                w = w[:pos] + "u"
        elif matched in ("ences", "ence"):
            if in_r2(pos):
                w = w[:pos] + "ent"
        elif matched in ("ements", "ement"):
            if in_rv(pos):
                w = w[:pos]
                if w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("at") and in_r2(len(w) - 2):
                        w = w[:-2]
                elif w.endswith("eus"):
                    if in_r2(len(w) - 3):
                        w = w[:-3]
                    elif in_r1(len(w) - 3):
                        w = w[:-3] + "eux"
                elif w.endswith("abl") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("iqU") and in_r2(len(w) - 3):
                    w = w[:-3]
                elif w.endswith("ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
                elif w.endswith("Ièr") and in_rv(len(w) - 3):
                    w = w[:-3] + "i"
        elif matched in ("ités", "ité"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("abil"):
                    if in_r2(len(w) - 4):
                        w = w[:-4]
                    else:
                        w = w[:-4] + "abl"
                elif w.endswith("ic"):
                    if in_r2(len(w) - 2):
                        w = w[:-2]
                    else:
                        w = w[:-2] + "iqU"
                elif w.endswith("iv") and in_r2(len(w) - 2):
                    w = w[:-2]
        elif matched in ("ives", "ive", "ifs", "if"):
            if in_r2(pos):
                w = w[:pos]
                if w.endswith("at") and in_r2(len(w) - 2):
                    w = w[:-2]
                    if w.endswith("ic"):
                        if in_r2(len(w) - 2):
                            w = w[:-2]
                        else:
                            w = w[:-2] + "iqU"
        elif matched == "eaux":
            w = w[:pos] + "eau"
        elif matched == "aux":
            if in_r1(pos):
                w = w[:pos] + "al"
        elif matched in ("euses", "euse"):
            if in_r2(pos):
                w = w[:pos]
            elif in_r1(pos):
                w = w[:pos] + "eux"
        elif matched in ("issements", "issement"):
            if in_r1(pos) and pos > 0 and w[pos - 1] not in _VOWELS:
                w = w[:pos]
        elif matched == "amment":
            if in_rv(pos):
                w = w[:pos] + "ant"
        elif matched == "emment":
            if in_rv(pos):
                w = w[:pos] + "ent"
        elif matched in ("ments", "ment"):
            if pos > 0 and w[pos - 1] in _VOWELS and in_rv(pos - 1):
                w = w[:pos]

    step1_changed = w != word
    word = w
    if step1_changed and matched not in (
        "amment", "emment", "ments", "ment"
    ):
        do_step2 = False
        altered = True

    # ---- step 2a / 2b ----------------------------------------------
    # steps 2a/2b/4 run inside `setlimit tomark pV` in the published
    # snowball source: the among() matches the longest suffix lying
    # ENTIRELY WITHIN RV (a longer suffix sticking out of RV does not
    # shadow a shorter one inside it)
    def _longest_in_rv(w: str, suffixes) -> str | None:
        best = None
        for suf in suffixes:
            if (
                w.endswith(suf)
                and len(w) - len(suf) >= rv
                and (best is None or len(suf) > len(best))
            ):
                best = suf
        return best

    if do_step2:
        w = word
        removed_2a = False
        suf = _longest_in_rv(w, _STEP2A)
        if suf is not None:
            pos = len(w) - len(suf)
            if pos > 0 and w[pos - 1] not in _VOWELS and in_rv(pos - 1):
                w = w[:pos]
                removed_2a = True
        if removed_2a:
            altered = True
            word = w
        else:
            # step 2b — longest within RV among the whole set
            w = word
            best = _longest_in_rv(w, ["ions"] + _STEP2B_ER + _STEP2B_A)
            if best is not None:
                pos = len(w) - len(best)
                if best == "ions":
                    if in_r2(pos):
                        w = w[:pos]
                elif best in _STEP2B_ER:
                    w = w[:pos]
                else:  # a-group
                    w = w[:pos]
                    if w.endswith("e") and in_rv(len(w) - 1):
                        w = w[:-1]
                if w != word:
                    altered = True
                    word = w

    if step1_changed:
        altered = True

    # ---- step 3 / step 4 -------------------------------------------
    if altered:
        if word.endswith("Y"):
            word = word[:-1] + "i"
        elif word.endswith("ç"):
            word = word[:-1] + "c"
    else:
        # step 4
        if word.endswith("s") and len(word) >= 2 and word[-2] not in "aiouès":
            word = word[:-1]
        best = _longest_in_rv(word, ("Ière", "ière", "Ier", "ier", "ion", "e", "ë"))
        if best == "ion":
            pos = len(word) - 3
            if (
                in_r2(pos)
                and in_rv(pos)
                and pos > 0
                and word[pos - 1] in "st"
                and in_rv(pos - 1)
            ):
                word = word[:pos]
        elif best in ("Ière", "ière", "Ier", "ier"):
            pos = len(word) - len(best)
            if in_rv(pos):
                word = word[:pos] + "i"
        elif best == "e":
            if in_rv(len(word) - 1):
                word = word[:-1]
        elif best == "ë":
            if in_rv(len(word) - 1) and word.endswith("guë"):
                word = word[:-1]

    # ---- step 5 (un-double) ----------------------------------------
    if word.endswith(("enn", "onn", "ett", "ell", "eill")):
        word = word[:-1]

    # ---- step 6 (un-accent) ----------------------------------------
    n = len(word)
    i = n - 1
    cnt = 0
    while i >= 0 and word[i] not in _VOWELS:
        cnt += 1
        i -= 1
    if cnt >= 1 and i >= 0 and word[i] in "éè":
        word = word[:i] + "e" + word[i + 1 :]

    return word.replace("I", "i").replace("U", "u").replace("Y", "y")
