"""Per-language character normalizers (Greek / Arabic / Persian).

Fills the roles of the reference's
``Analysis/El/GreekLowerCaseFilter.cs:37`` (lowercase + tonos/
dialytika removal + final-sigma standardization),
``Analysis/Ar/ArabicNormalizer.cs:38`` (hamza-seated alef -> bare
alef, teh marbuta -> heh, dotless yeh -> yeh, harakat/tatweel
removal) and ``Analysis/Fa/PersianNormalizer.cs:38`` (farsi yeh /
yeh barree -> arabic yeh, keheh -> kaf, heh+hamza / heh goal -> heh,
hamza-above removal). Each is a pure ``str -> str`` translate-table
rewrite (C-level ``str.translate``), composable with the UAX#29
tokenizer via :func:`make_norm_analyzer` — the same pipeline shape
as the reference's Tokenizer -> NormalizerFilter chains. The
reference analyzers additionally apply per-language stop sets and
stemmers (configuration / separate filters); the normalizers here
are the algorithmic cores those tests pin.
"""

from __future__ import annotations

# GreekLowerCaseFilter.cs:77-135 — special cases run before the
# default per-char lowercase; final sigma standardizes to sigma.
_GREEK_SPECIAL = {
    0x03C2: "σ",  # final sigma -> sigma
    0x0386: "α", 0x03AC: "α",  # alpha+tonos
    0x0388: "ε", 0x03AD: "ε",  # epsilon+tonos
    0x0389: "η", 0x03AE: "η",  # eta+tonos
    0x038A: "ι", 0x03AA: "ι", 0x03AF: "ι",
    0x03CA: "ι", 0x0390: "ι",  # iota+tonos/dialytika
    0x038E: "υ", 0x03AB: "υ", 0x03CD: "υ",
    0x03CB: "υ", 0x03B0: "υ",  # upsilon+tonos/dialytika
    0x038C: "ο", 0x03CC: "ο",  # omicron+tonos
    0x038F: "ω", 0x03CE: "ω",  # omega+tonos
    0x03A2: "ς",  # reserved (backwards compat)
}


def greek_lowercase(term: str) -> str:
    """Per-char lowercase with the Greek special cases applied first
    (the reference lowercases per CODEPOINT, so the context-sensitive
    final-sigma rule of ``str.lower`` never fires: uppercase sigma is
    always small sigma, and literal final sigmas are standardized by
    the 03C2 row)."""
    out = []
    for ch in term:
        cp = ord(ch)
        special = _GREEK_SPECIAL.get(cp)
        out.append(special if special is not None else chr(cp).lower())
    return "".join(out)


# ArabicNormalizer.cs:69-101
_ARABIC_TABLE = {
    0x0622: "ا", 0x0623: "ا", 0x0625: "ا",  # alef forms
    0x0649: "ي",  # dotless yeh -> yeh
    0x0629: "ه",  # teh marbuta -> heh
    0x0640: None,  # tatweel
    0x064B: None, 0x064C: None, 0x064D: None, 0x064E: None,  # harakat
    0x064F: None, 0x0650: None, 0x0651: None, 0x0652: None,
}


def arabic_normalize(term: str) -> str:
    return term.translate(_ARABIC_TABLE)


# PersianNormalizer.cs:63-86 — runs on top of the Arabic rules in the
# reference PersianAnalyzer (ArabicNormalizationFilter then
# PersianNormalizationFilter)
_PERSIAN_TABLE = {
    0x06CC: "ي", 0x06D2: "ي",  # farsi yeh / yeh barree
    0x06A9: "ك",  # keheh -> kaf
    0x06C0: "ه", 0x06C1: "ه",  # heh yeh / heh goal
    0x0654: None,  # hamza above
}


def persian_normalize(term: str) -> str:
    return term.translate(_PERSIAN_TABLE)


_NORMALIZERS = {
    "el": greek_lowercase,
    "greek": greek_lowercase,
    "ar": arabic_normalize,
    "arabic": arabic_normalize,
    "fa": lambda t: persian_normalize(arabic_normalize(t)),
    "persian": lambda t: persian_normalize(arabic_normalize(t)),
}


def lang_normalizer(lang: str):
    try:
        return _NORMALIZERS[lang.lower()]
    except KeyError:
        raise KeyError(
            f"no normalizer for {lang!r}; have {sorted(set(_NORMALIZERS))}"
        ) from None


def make_norm_analyzer(lang: str):
    """UAX#29 tokenize -> lowercase -> normalize; no stop filter
    (reference stop sets are analyzer configuration). Same
    ``text -> [(term, position)]`` contract as the other pipelines;
    for Greek the language lowercase REPLACES the generic one (the
    reference GreekAnalyzer has no separate LowerCaseFilter)."""
    from lucenenet_spark.analysis.analyzer import (
        MAX_TOKEN_LENGTH,
        _TOKEN_RE,
    )

    norm = lang_normalizer(lang)
    greek = norm is greek_lowercase

    def analyze_norm(text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        toks = _TOKEN_RE.findall(text if greek else text.lower())
        # length filter BEFORE position assignment, like analyze()
        toks = [t for t in toks if len(t) <= MAX_TOKEN_LENGTH]
        return [(norm(t), i) for i, t in enumerate(toks)]

    return analyze_norm
