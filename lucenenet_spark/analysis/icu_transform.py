"""ICU Transliteration role — the algorithmic core of the reference's
``Lucene.Net.Analysis.ICU`` ``ICUTransformFilter``
(`src/Lucene.Net.Analysis.ICU/Analysis/Icu/ICUTransformFilter.cs`):
a per-token text transform chosen by a transliterator ID or built from
ICU-style replacement rules.

The reference delegates to ICU4N's ``Transliterator`` (megabytes of
CLDR transform data).  Shipping that data is out of scope, same
scoping as the Kuromoji/SmartCn dictionaries; this module keeps the
ALGORITHMIC core over pinned public tables:

- **rule-based transliterator** (``Transliterator.CreateFromRules``):
  ``a > b; b > c;`` rule sets with optional left/right context
  (``pre { key } post > out``), applied with ICU cursor semantics —
  the cursor moves past replacement text, so one rule's output is
  never re-matched by the same pass (reference fixture:
  ``abacadaba`` -> ``bcbcbdbcb``, TestICUTransformFilter.cs:50-51),
  and left context is checked against the POST-replacement buffer
  (``c { a > b; a > d;`` on ``caa`` -> ``cbd``, :56-57);
- **pinned built-in IDs** for the four search transforms the
  reference documents (ICUTransformFilter.cs:36-42): Traditional ->
  Simplified Chinese, Katakana <-> Hiragana, Fullwidth -> Halfwidth,
  and script -> Latin (Greek + Serbian-Cyrillic tables; ``Any-Latin``
  / ``el-Latin`` / ``sr-Latin``), plus ``Han-Latin`` (pinyin) over a
  pinned vocabulary, and the normalizer/filter IDs (``NFD``/``NFC``/
  ``NFKD``/``NFKC``, ``CaseFold``, ``Lower``, ``Upper``,
  ``[:Nonspacing Mark:] Remove``) that ICU treats as transforms;
- **compound IDs**: ``A; B`` composes left-to-right
  (``Traditional-Simplified; CaseFold``, ``NFD; [:Nonspacing Mark:]
  Remove`` — both reference fixtures).

``make_transform_analyzer`` applies the transform per token after the
standard tokenizer, mirroring the TokenFilter position in the
reference chain; composable with the index builder via
``CorpusSpec(translit=<id>)``.
"""

from __future__ import annotations

import re
import unicodedata
from typing import Callable

from lucenenet_spark.analysis.analyzer import MAX_TOKEN_LENGTH, _token_re_for

Transform = Callable[[str], str]

# ---------------------------------------------------------------- rules


class _Rule:
    __slots__ = ("pre", "key", "post", "out")

    def __init__(self, pre: str, key: str, post: str, out: str):
        self.pre, self.key, self.post, self.out = pre, key, post, out


_ESCAPE_RE = re.compile(r"\\u([0-9a-fA-F]{4})|\\U([0-9a-fA-F]{8})|\\(.)")


def _unescape(s: str) -> str:
    def sub(m: re.Match) -> str:
        if m.group(1):
            return chr(int(m.group(1), 16))
        if m.group(2):
            return chr(int(m.group(2), 16))
        return m.group(3)

    return _ESCAPE_RE.sub(sub, s)


def _parse_rules(rules: str) -> list[_Rule]:
    parsed: list[_Rule] = []
    for raw in rules.split(";"):
        stmt = raw.strip()
        if not stmt or stmt.startswith("#"):
            continue
        if ">" not in stmt:
            raise ValueError(f"unsupported transform rule: {stmt!r}")
        lhs, out = stmt.split(">", 1)
        pre = post = ""
        if "{" in lhs:
            pre, lhs = lhs.split("{", 1)
        if "}" in lhs:
            lhs, post = lhs.split("}", 1)
        parsed.append(
            _Rule(
                _unescape(pre.strip()),
                _unescape(lhs.strip()),
                _unescape(post.strip()),
                _unescape(out.strip()),
            )
        )
    return parsed


def transform_from_rules(rules: str) -> Transform:
    """``Transliterator.CreateFromRules`` role: one left-to-right pass;
    at each position the first matching rule replaces its key and the
    cursor jumps past the replacement (output never re-matched)."""
    parsed = _parse_rules(rules)

    def apply(text: str) -> str:
        out: list[str] = []
        i, n = 0, len(text)
        while i < n:
            for r in parsed:
                if not r.key or not text.startswith(r.key, i):
                    continue
                # left context against the post-replacement buffer,
                # right context against the unprocessed input
                if r.pre and not "".join(out).endswith(r.pre):
                    continue
                if r.post and not text.startswith(r.post, i + len(r.key)):
                    continue
                out.append(r.out)
                i += len(r.key)
                break
            else:
                out.append(text[i])
                i += 1
        return "".join(out)

    return apply


# ------------------------------------------------- pinned built-in tables

# Fullwidth ASCII block -> ASCII is algorithmic (cp - 0xFEE0);
# katakana -> halfwidth forms is the standard 63-form table, with
# voiced/semi-voiced letters decomposing to base + FF9E/FF9F.
_KATA_TO_HALF: dict[str, str] = {}
for _full, _half in zip(
    "アイウエオカキクケコサシスセソタチツテトナニヌネノ"
    "ハヒフヘホマミムメモヤユヨラリルレロワヲンァィゥェォ"
    "ッャュョー。、「」・",
    "ｱｲｳｴｵｶｷｸｹｺｻｼｽｾｿﾀﾁﾂﾃﾄﾅﾆﾇﾈﾉ"
    "ﾊﾋﾌﾍﾎﾏﾐﾑﾒﾓﾔﾕﾖﾗﾘﾙﾚﾛﾜｦﾝｧｨｩｪｫ"
    "ｯｬｭｮｰ｡､｢｣･",
):
    _KATA_TO_HALF[_full] = _half
for _voiced, _base in zip(
    "ガギグゲゴザジズゼゾダヂヅデドバビブベボヴ",
    "カキクケコサシスセソタチツテトハヒフヘホウ",
):
    _KATA_TO_HALF[_voiced] = _KATA_TO_HALF[_base] + "ﾞ"
for _semi, _base in zip("パピプペポ", "ハヒフヘホ"):
    _KATA_TO_HALF[_semi] = _KATA_TO_HALF[_base] + "ﾟ"


def _fullwidth_halfwidth(text: str) -> str:
    out = []
    for ch in text:
        o = ord(ch)
        if 0xFF01 <= o <= 0xFF5E:
            out.append(chr(o - 0xFEE0))
        elif ch == "　":
            out.append(" ")
        else:
            out.append(_KATA_TO_HALF.get(ch, ch))
    return "".join(out)


def _katakana_hiragana(text: str) -> str:
    # U+30A1-30F6 shift down 0x60 to the hiragana block (ー unchanged)
    return "".join(
        chr(ord(c) - 0x60) if 0x30A1 <= ord(c) <= 0x30F6 else c for c in text
    )


def _hiragana_katakana(text: str) -> str:
    return "".join(
        chr(ord(c) + 0x60) if 0x3041 <= ord(c) <= 0x3096 else c for c in text
    )


# Pinned Traditional -> Simplified pairs (public CLDR/Unihan variants
# for common characters; the full table is data, same scoping note as
# the module docstring).
_TRAD_SIMP = dict(
    zip(
        "簡體國學數據檢語課書馬龍愛門電腦網頁漢車貓魚鳥紅綠藍東樂"
        "為從眾雲誰讀寫聽說話許認識讓運動場風時間問題會議員長",
        "简体国学数据检语课书马龙爱门电脑网页汉车猫鱼鸟红绿蓝东乐"
        "为从众云谁读写听说话许认识让运动场风时间问题会议员长",
    )
)


def _traditional_simplified(text: str) -> str:
    return "".join(_TRAD_SIMP.get(c, c) for c in text)


# Greek -> Latin (UNGEGN-style, the scheme behind the reference's
# Any-Latin fixture "Αλφαβητικός Κατάλογος" -> "Alphabētikós
# Katálogos"): map NFD base letters, keep combining marks, recompose.
_GREEK_LATIN = {
    "α": "a", "β": "b", "γ": "g", "δ": "d", "ε": "e", "ζ": "z",
    "η": "ē", "θ": "th", "ι": "i", "κ": "k", "λ": "l",
    "μ": "m", "ν": "n", "ξ": "x", "ο": "o", "π": "p", "ρ": "r",
    "σ": "s", "ς": "s", "τ": "t", "υ": "y", "φ": "ph", "χ": "kh",
    "ψ": "ps", "ω": "ō",
}

# Serbian Cyrillic -> Latin (Gaj digraph orthography, the reference's
# "Serbian Cyrillic to Latin" example).
_CYRILLIC_LATIN = {
    "а": "a", "б": "b", "в": "v", "г": "g", "д": "d", "ђ": "đ",
    "е": "e", "ж": "ž", "з": "z", "и": "i", "ј": "j", "к": "k",
    "л": "l", "љ": "lj", "м": "m", "н": "n", "њ": "nj", "о": "o",
    "п": "p", "р": "r", "с": "s", "т": "t", "ћ": "ć", "у": "u",
    "ф": "f", "х": "h", "ц": "c", "ч": "č", "џ": "dž", "ш": "š",
}

_TO_LATIN = {**_GREEK_LATIN, **_CYRILLIC_LATIN}


def _any_latin(text: str) -> str:
    out = []
    for ch in unicodedata.normalize("NFD", text):
        low = ch.lower()
        rep = _TO_LATIN.get(low)
        if rep is None:
            out.append(ch)
        elif ch != low:  # preserve case; multi-char outputs title-case
            out.append(rep[0].upper() + rep[1:])
        else:
            out.append(rep)
    return unicodedata.normalize("NFC", "".join(out))


# Han -> Latin (pinyin) over a pinned vocabulary of common characters
# (reference fixture: 中国 -> "zhōng guó"; syllables space-separated).
_HAN_PINYIN = {
    "中": "zhōng", "国": "guó", "文": "wén", "分": "fēn", "词": "cí",
    "数": "shù", "据": "jù", "检": "jiǎn", "索": "suǒ", "引": "yǐn",
    "大": "dà", "学": "xué", "北": "běi", "京": "jīng", "信": "xìn",
    "息": "xī", "系": "xì", "统": "tǒng", "语": "yǔ", "言": "yán",
    "处": "chǔ", "理": "lǐ", "机": "jī", "器": "qì", "人": "rén",
    "日": "rì", "本": "běn", "上": "shàng", "海": "hǎi", "东": "dōng",
}


def _han_latin(text: str) -> str:
    out: list[str] = []
    for ch in text:
        py = _HAN_PINYIN.get(ch)
        if py is None:
            out.append(ch)
        else:
            if out and out[-1] and not out[-1].endswith(" "):
                out.append(" ")
            out.append(py + " ")
    return "".join(out).strip()


def _remove_nonspacing_marks(text: str) -> str:
    return "".join(
        ch for ch in text if unicodedata.category(ch) != "Mn"
    )


_BUILTIN: dict[str, Transform] = {
    "traditional-simplified": _traditional_simplified,
    "katakana-hiragana": _katakana_hiragana,
    "hiragana-katakana": _hiragana_katakana,
    "fullwidth-halfwidth": _fullwidth_halfwidth,
    "any-latin": _any_latin,
    "el-latin": _any_latin,
    "sr-latin": _any_latin,
    "greek-latin": _any_latin,
    "cyrillic-latin": _any_latin,
    "han-latin": _han_latin,
    "nfd": lambda s: unicodedata.normalize("NFD", s),
    "nfc": lambda s: unicodedata.normalize("NFC", s),
    "nfkd": lambda s: unicodedata.normalize("NFKD", s),
    "nfkc": lambda s: unicodedata.normalize("NFKC", s),
    "casefold": str.casefold,
    "lower": str.lower,
    "upper": str.upper,
    "[:nonspacing mark:] remove": _remove_nonspacing_marks,
}


def get_transform(transform_id: str) -> Transform:
    """``Transliterator.GetInstance`` role: resolve a (possibly
    compound ``A; B``) transform ID to a composed text function."""
    steps: list[Transform] = []
    for part in transform_id.split(";"):
        key = part.strip().lower()
        if not key:
            continue
        fn = _BUILTIN.get(key)
        if fn is None:
            raise ValueError(
                f"unknown transform id {part.strip()!r} (pinned role set: "
                f"{sorted(_BUILTIN)})"
            )
        steps.append(fn)
    if not steps:
        raise ValueError("empty transform id")
    if len(steps) == 1:
        return steps[0]

    def composed(text: str) -> str:
        for fn in steps:
            text = fn(text)
        return text

    return composed


def make_transform_analyzer(transform_id: str):
    """Standard tokenizer -> per-token transform (the reference's
    TokenFilter position), NO stop filter (the transform may rewrite a
    token into or out of a stop word; the reference chain in
    TestICUTransformFilter applies no stop filter either), positions
    sequential and gap-free.  Tokens whose transform contains spaces
    stay single tokens, exactly like the reference filter (it rewrites
    the term attribute in place)."""
    transform = get_transform(transform_id)

    def analyze_translit(text: str) -> list[tuple[str, int]]:
        if not text:
            return []
        lt = text.lower()
        toks = _token_re_for(lt).findall(lt)
        out = []
        for t in toks:
            tt = transform(t)
            if 0 < len(tt) <= MAX_TOKEN_LENGTH:
                out.append(tt)
        return [(t, i) for i, t in enumerate(out)]

    return analyze_translit
