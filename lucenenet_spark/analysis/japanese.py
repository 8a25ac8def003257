"""JapaneseTokenizer (Kuromoji) role — minimum-cost lattice (Viterbi)
segmentation over a compact pinned vocabulary.

Reference: ``src/Lucene.Net.Analysis.Kuromoji/JapaneseTokenizer.cs``
builds a Viterbi lattice over the IPADIC FST (known-word edges) plus
character-class unknown-word edges, then takes the cheapest path.
Shipping the MeCab/IPADIC dictionaries (tens of MB, model-driven) is
out of scope for this engine; this module keeps the ALGORITHMIC core —
min-cost lattice path, dictionary edges competing with character-class
unknown runs — over a small public vocabulary of common Japanese
words, so multi-character dictionary words segment correctly instead
of degrading to CJK bigrams. SURVEY §8l records the measured
bigram-vs-segmentation recall tradeoff.

Pinned cost model (NOT IPADIC parity — a clean-room spec):

- every known-word edge costs ``KNOWN_COST`` (constant per word, so
  the path prefers FEWER, hence longer, dictionary words);
- an unknown edge spans either one char or the maximal run of the
  same character class (Kuromoji's unknown grouping idea), costing
  ``UNK_BASE + UNK_PER_CHAR * len`` — always worse than any
  dictionary segmentation covering the same span;
- ties break to the known edge, then the longer edge, then the
  earlier-scanned one (fully deterministic).

``analyze_ja`` is the mixed-text pipeline: CJK runs segment through
the lattice, non-CJK runs tokenize with the standard ASCII rules; NO
stop filter (the reference JapaneseAnalyzer carries its own Japanese
stop set, not the English one), all positions sequential and gap-free.
"""

from __future__ import annotations

import re

KNOWN_COST = 2500
UNK_BASE = 6000
UNK_PER_CHAR = 1700

# Compact pinned vocabulary: common particles, verb forms, nouns, and
# katakana loanwords. Public common-usage words only.
JA_VOCAB: frozenset[str] = frozenset(
    {
        # particles / copula
        "の", "は", "が", "を", "に", "で", "と", "も", "へ", "や",
        "から", "まで", "より", "です", "である", "だ", "な",
        # verbs / verb forms
        "する", "した", "します", "しました", "ある", "いる", "なる",
        "使う", "作る", "読む", "書く", "行う",
        # suru-nouns / technical nouns
        "実行", "検索", "索引", "解析", "処理", "分析", "構築",
        "追加", "削除", "更新", "保存", "研究", "開発", "設計",
        "計算", "学習", "技術", "情報", "文書", "文章", "単語",
        "辞書", "言語", "形態素", "機械", "自然", "分散", "高速",
        "大規模", "問題", "方法", "結果", "時間", "世界",
        # pronouns / demonstratives
        "これ", "それ", "あれ", "どれ", "ここ", "そこ", "私",
        # names / common nouns
        "日本", "日本語", "東京", "大学", "学生", "先生", "会社",
        "仕事", "今日", "明日", "テスト",
        # katakana loanwords
        "データ", "テーブル", "ハッシュ", "システム", "コンピュータ",
        "インデックス", "ファイル", "メモリ", "サーバ", "クエリ",
        "スパーク",
    }
)
_MAX_WORD_LEN = max(len(w) for w in JA_VOCAB)


def _char_class(ch: str) -> str:
    o = ord(ch)
    if 0x3040 <= o <= 0x309F:
        return "hira"
    if 0x30A0 <= o <= 0x30FF:
        return "kata"
    if 0x4E00 <= o <= 0x9FFF or o == 0x3005:
        return "kanji"
    if 0xAC00 <= o <= 0xD7AF:
        return "hangul"
    return "other"


def lattice_segment(text: str, vocab: frozenset[str], max_word_len: int) -> list[str]:
    """Min-cost lattice segmentation of one CJK run under the pinned
    cost model. O(n * max_word_len). Shared by the Japanese (Kuromoji
    role) and Chinese (SmartCn role, analysis/chinese.py) analyzers —
    both references are min-cost path searches over dictionary +
    unknown edges (JapaneseTokenizer.cs Viterbi; SmartCn's
    HHMMSegmenter.cs shortest-path over the word DAG)."""
    n = len(text)
    if n == 0:
        return []
    INF = float("inf")
    # best[i] = (cost, back_pos, known, edge_len) for prefix text[:i]
    best: list[tuple[float, int, bool, int]] = [(INF, -1, False, 0)] * (n + 1)
    best[0] = (0.0, -1, True, 0)
    # precompute maximal same-class run length at each position
    run_len = [1] * n
    for i in range(n - 2, -1, -1):
        if _char_class(text[i]) == _char_class(text[i + 1]):
            run_len[i] = run_len[i + 1] + 1
    for i in range(n):
        base = best[i][0]
        if base == INF:
            continue

        def relax(j: int, cost: float, known: bool, i=i, base=base) -> None:
            cand = (base + cost, i, known, j - i)
            cur = best[j]
            # lower cost wins; tie -> known beats unknown, then longer
            if cand[0] < cur[0] or (
                cand[0] == cur[0]
                and (cand[2], cand[3]) > (cur[2], cur[3])
            ):
                best[j] = cand

        # known-word edges
        for L in range(1, min(max_word_len, n - i) + 1):
            if text[i : i + L] in vocab:
                relax(i + L, KNOWN_COST, True)
        # unknown edges: single char + the maximal same-class run
        relax(i + 1, UNK_BASE + UNK_PER_CHAR, False)
        r = run_len[i]
        if r > 1:
            relax(i + r, UNK_BASE + UNK_PER_CHAR * r, False)
    # reconstruct
    out: list[str] = []
    j = n
    while j > 0:
        i = best[j][1]
        out.append(text[i:j])
        j = i
    out.reverse()
    return out


def segment_ja(text: str) -> list[str]:
    """Min-cost lattice segmentation of one Japanese CJK run."""
    return lattice_segment(text, JA_VOCAB, _MAX_WORD_LEN)


# CJK runs (Han incl. 々, Hiragana, Katakana, Hangul) vs the pinned
# ASCII word pattern — the same mixed-splitter shape as analyze_cjk.
_JA_MIXED_RE = re.compile(
    r"([一-鿿々぀-ゟ゠-ヿ가-힯]+)|(\d+(?:\.\d+)+|\w+(?:'\w+)*)", re.ASCII
)


def analyze_ja(text: str) -> list[tuple[str, int]]:
    """Mixed-text Kuromoji-role pipeline: CJK runs -> lattice
    segmentation, non-CJK runs -> the pinned ASCII word rules;
    lowercased, NO stop filter, positions sequential (gap-free)."""
    if not text:
        return []
    toks: list[str] = []
    for m in _JA_MIXED_RE.finditer(text.lower()):
        if m.group(1):
            toks.extend(segment_ja(m.group(1)))
        else:
            toks.append(m.group(2))
    return [(t, i) for i, t in enumerate(toks) if len(t) <= 255]
