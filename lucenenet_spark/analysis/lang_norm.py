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


# HindiNormalizer.cs:53-182 (Pingali & Varma word normalization +
# Larkey et al. additions). One position-dependent rule — dead
# NA+virama -> anusvara — runs first; everything else is a
# translate table (nukta forms folded, virama/nukta/ZWJ/ZWNJ
# deleted, chandra and long vowels shortened).
_HINDI_TABLE = {
    0x0901: "ं",            # candrabindu -> bindu
    0x093C: None,                # nukta
    0x0929: "न", 0x0931: "र", 0x0934: "ळ",
    0x0958: "क", 0x0959: "ख", 0x095A: "ग",
    0x095B: "ज", 0x095C: "ड", 0x095D: "ढ",
    0x095E: "फ", 0x095F: "य",  # nukta consonants
    0x200C: None, 0x200D: None,  # ZWNJ/ZWJ
    0x094D: None,                # virama
    0x0945: "े", 0x0946: "े",  # chandra/short e -> e
    0x0949: "ो", 0x094A: "ो",  # chandra/short o -> o
    0x090D: "ए", 0x090E: "ए",
    0x0911: "ओ", 0x0912: "ओ",
    0x0972: "अ",
    0x0906: "अ", 0x0908: "इ", 0x090A: "उ",  # long->short
    0x0960: "ऋ", 0x0961: "ऌ",
    0x0910: "ए", 0x0914: "ओ",
    0x0940: "ि", 0x0942: "ु", 0x0944: "ृ",
    0x0963: "ॢ", 0x0948: "े", 0x094C: "ो",
}


def hindi_normalize(term: str) -> str:
    # dead n (NA followed by virama) -> anusvara, BEFORE the table
    # deletes the virama (HindiNormalizer.cs:58-64)
    if "न्" in term:
        term = term.replace("न्", "ं")
    return term.translate(_HINDI_TABLE)


_NORMALIZERS = {
    "el": greek_lowercase,
    "greek": greek_lowercase,
    "ar": arabic_normalize,
    "arabic": arabic_normalize,
    "fa": lambda t: persian_normalize(arabic_normalize(t)),
    "persian": lambda t: persian_normalize(arabic_normalize(t)),
    "hi": hindi_normalize,
    "hindi": hindi_normalize,
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
