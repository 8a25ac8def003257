"""SmartChineseAnalyzer role — dictionary lattice segmentation for
Simplified Chinese over a compact pinned vocabulary.

Reference: ``src/Lucene.Net.Analysis.SmartCn/HHMMSegmenter.cs`` builds
a word DAG from the bigram dictionary and takes the shortest
(min-cost) path; ``SmartChineseAnalyzer.cs`` wraps it with sentence
splitting and a stop filter. Shipping the HHMM bigram models is out of
scope; this module keeps the algorithmic core — the min-cost word-DAG
path, shared with the Kuromoji-role lattice in analysis/japanese.py —
over a small public vocabulary of common Simplified-Chinese words.

Pinned behavior: same cost model as the Japanese lattice (constant
per dictionary word, unknown single-char / same-class-run edges);
mixed text tokenizes non-CJK runs with the standard ASCII rules;
lowercased; NO stop filter; positions sequential and gap-free.
"""

from __future__ import annotations

from lucenenet_spark.analysis.japanese import _JA_MIXED_RE, lattice_segment

# Compact pinned vocabulary: common function words + technical nouns
# (Simplified). Public common-usage words only.
ZH_VOCAB: frozenset[str] = frozenset(
    {
        # function words
        "的", "了", "是", "在", "和", "与", "有", "为", "这", "那",
        "我们", "他们", "一个", "可以", "不是", "没有",
        # verbs
        "使用", "进行", "执行", "处理", "分析", "构建", "建立",
        "查询", "搜索", "检索", "保存", "删除", "更新", "计算",
        "学习", "研究", "开发", "设计", "支持", "提供",
        # nouns
        "数据", "数据库", "系统", "索引", "文档", "文本", "信息",
        "技术", "方法", "结果", "问题", "时间", "语言", "中文",
        "机器", "模型", "分词", "词典", "引擎", "分布式", "大规模",
        "高速", "内存", "文件", "服务器", "网络", "用户", "程序",
        "中国", "北京", "大学", "公司", "世界", "今天",
    }
)
_MAX_WORD_LEN = max(len(w) for w in ZH_VOCAB)


def segment_zh(text: str) -> list[str]:
    """Min-cost word-DAG segmentation of one Chinese CJK run."""
    return lattice_segment(text, ZH_VOCAB, _MAX_WORD_LEN)


def analyze_zh(text: str) -> list[tuple[str, int]]:
    """Mixed-text SmartCn-role pipeline: CJK runs -> word-DAG
    segmentation, non-CJK runs -> the pinned ASCII word rules;
    lowercased, NO stop filter, positions sequential (gap-free)."""
    if not text:
        return []
    toks: list[str] = []
    for m in _JA_MIXED_RE.finditer(text.lower()):
        if m.group(1):
            toks.extend(segment_zh(m.group(1)))
        else:
            toks.append(m.group(2))
    return [(t, i) for i, t in enumerate(toks) if len(t) <= 255]
