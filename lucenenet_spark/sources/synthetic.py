"""Distributed deterministic synthetic source-code corpus.

Generates the engine's input table shape per BASELINE.json input_hint —
``(repo, path, commit, lang, content)`` — fully inside Spark
(``spark.range`` → ``mapInPandas``), with every row a pure function of
``(seed, docid)``: the corpus is identical for any partitioning or
parallelism level, which is what makes the N-vs-4N scaling runs and
resume-from-checkpoint tests byte-comparable. Mirrors the reference's
pluggable benchmark content sources
(``src/Lucene.Net.Benchmark/ByTask/Feeds/ReutersContentSource.cs`` /
``EnwikiContentSource.cs``) re-expressed as a Spark source.

Content statistics (FIXTURES.md §1): Zipf-skewed ~5k-term vocabulary
with a handful of head terms in >30% of docs (exercises skewed-term
salting), camelCase / snake_case / dotted identifiers, keywords,
numerics, English stopwords; 20–2000 tokens/doc (90% in 20–400).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CORPUS_SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("commit", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("content", T.StringType()),
    ]
)

_EXTS = np.array(["py", "cs", "java", "md"])
_LANGS = {"py": "python", "cs": "csharp", "java": "java", "md": "markdown"}
_DIRS = np.array(["core", "util", "io", "index", "search"])
_KINDS = np.array(["mod", "lib", "svc", "impl"])

# head terms land in >30% of docs (Zipf head — the skew stressor);
# "if"/"the"/... are in the stop set so stop-filtering is exercised too
_HEAD = np.array(["return", "if", "value", "data0", "self", "x"])
_KEYWORDS = np.array(["class", "def", "import", "public", "static", "void", "int", "string"])
_STOPS = np.array(["the", "a", "of", "to", "in", "is", "for"])


@lru_cache(maxsize=4)
def vocab(seed: int = 42, n: int = 5000) -> np.ndarray:
    """Deterministic identifier vocabulary (built once per worker)."""
    rng = np.random.default_rng(seed)
    syll = np.array(
        ["foo", "bar", "baz", "qux", "get", "set", "run", "calc", "parse",
         "node", "tree", "hash", "map", "list", "util", "core", "spark",
         "index", "merge", "scan", "read", "write", "batch", "shard"]
    )
    a = rng.choice(syll, n)
    b = rng.choice(syll, n)
    style = rng.integers(0, 4, n)
    out = np.empty(n, dtype=object)
    for i in range(n):
        if style[i] == 0:
            out[i] = f"{a[i]}_{b[i]}_{i}"
        elif style[i] == 1:
            out[i] = f"{a[i]}{b[i].capitalize()}{i}"
        elif style[i] == 2:
            out[i] = f"{a[i]}{i}.{b[i]}{i % 7}"
        else:
            out[i] = f"{a[i]}{i}"
    return out


def _gen_doc(docid: int, seed: int, voc: np.ndarray) -> tuple[str, str, str, str, str]:
    rng = np.random.default_rng([seed, docid])
    repo = f"repo-{docid % 64:03d}"
    ext = _EXTS[rng.integers(len(_EXTS))]
    path = f"src/{_DIRS[rng.integers(len(_DIRS))]}/{_KINDS[rng.integers(len(_KINDS))]}_{docid}.{ext}"
    commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
    n_tok = int(rng.integers(20, 400) if rng.random() < 0.9 else rng.integers(400, 2000))
    r = rng.random(n_tok)
    words = np.empty(n_tok, dtype=object)
    m = r < 0.25
    words[m] = _HEAD[rng.integers(0, len(_HEAD), int(m.sum()))]
    m = (r >= 0.25) & (r < 0.35)
    words[m] = _KEYWORDS[rng.integers(0, len(_KEYWORDS), int(m.sum()))]
    m = (r >= 0.35) & (r < 0.42)
    words[m] = rng.integers(0, 100, int(m.sum())).astype(str)
    m = (r >= 0.42) & (r < 0.47)
    words[m] = _STOPS[rng.integers(0, len(_STOPS), int(m.sum()))]
    m = r >= 0.47
    # Zipf-ish body: pareto-shaped index into the vocab
    idx = np.minimum((rng.pareto(1.2, int(m.sum()))).astype(np.int64), len(voc) - 1)
    words[m] = voc[idx]
    return repo, path, commit, _LANGS[str(ext)], " ".join(words)


def _gen_batches(seed: int):
    def gen(iterator):
        voc = vocab(seed)
        for pdf in iterator:
            rows = [_gen_doc(int(i), seed, voc) for i in pdf["id"]]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return gen


def synthetic_corpus(
    spark: SparkSession, n_docs: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n_docs, 1, parts).mapInPandas(
        _gen_batches(seed), schema=CORPUS_SCHEMA
    )


# ------------------------------------------------- deterministic code corpus
# A source-code-identifier corpus derived row-by-row from an existing
# table by PURE SQL arithmetic — the same expression string runs in
# Spark SQL and DuckDB, so a code-analyzed index is oracle-checkable
# end-to-end (used by the code_* driver entries with
# CorpusSpec(code=True), the WordDelimiterFilter role).
#
# 12 three-letter identifier stems packed into one literal: substr()
# is 1-based in BOTH dialects, so stem k = substr(lit, 1+3k, 3).
CODE_STEMS = "getsetusrrecidxcntpartokmrgsrthshbyt"
_N_STEMS = 12


def _stem(e: str) -> str:
    return f"substr('{CODE_STEMS}', 1 + 3*(({e}) % {_N_STEMS}), 3)"


def _cap(w: str) -> str:
    return f"(upper(substr({w},1,1)) || substr({w},2,2))"


def code_text_expr(id_expr: str = "doc_id", n_idents: int = 6) -> str:
    """SQL expression: ``n_idents`` identifiers per row, style cycling
    camelCase / snake_case / Capitalized-with-digit-suffix, each built
    from three stems chosen by modular arithmetic over ``id_expr``.
    Deterministic, dialect-portable (substr/upper/||/% only)."""
    idents = []
    for j in range(n_idents):
        w1 = _stem(f"({id_expr})*7 + {j * 3}")
        w2 = _stem(f"({id_expr})*11 + {j * 3 + 1}")
        w3 = _stem(f"({id_expr})*13 + {j * 3 + 2}")
        camel = f"({w1} || {_cap(w2)} || {_cap(w3)})"
        snake = f"({w1} || '_' || {w2} || '_' || {w3})"
        digit = (
            f"({_cap(w1)} || {w2} || "
            f"substr('0123456789', 1 + ((({id_expr}) + {j}) % 10), 1))"
        )
        idents.append(
            f"CASE ((({id_expr}) + {j}) % 3) WHEN 0 THEN {camel}"
            f" WHEN 1 THEN {snake} ELSE {digit} END"
        )
    return " || ' ' || ".join(idents)


def code_corpus_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """SELECT producing the (doc_id, text) code corpus from ``table``."""
    return (
        f"SELECT {id_col} AS doc_id, {code_text_expr(id_col)} AS text"
        f" FROM {table}"
    )


def mid_text_expr(id_expr: str = "doc_id") -> str:
    """SQL expression: text rich in UAX#29 ASCII Mid*-class tokens
    (the CorpusSpec(uax29=True) showcase corpus) — a MidLetter colon
    pair ("mrg:srt"), a MidNum comma-grouped number ("4,600"-class),
    a MidNumLet dotted version ("1.2.3"), a MidNumLet dotted name
    ("get.usr"), plus two plain stems for BM25 background. Under the
    full UAX#29 rules each stays ONE token; the pinned default
    tokenizer splits the colon/comma forms. Deterministic,
    dialect-portable (substr/||/% only; int||str casts identically in
    Spark SQL and DuckDB)."""
    w1 = _stem(f"({id_expr})*7")
    w2 = _stem(f"({id_expr})*7 + 1")
    w3 = _stem(f"({id_expr})*7 + 2")
    w4 = _stem(f"({id_expr})*7 + 3")
    colon = f"({w1} || ':' || {w2})"
    comma = f"(((({id_expr}) % 9) + 1) || ',' || (((({id_expr}) * 37) % 900) + 100))"
    ver = (
        f"(((({id_expr}) % 9) + 1) || '.' || (({id_expr}) % 7)"
        f" || '.' || (({id_expr}) % 5))"
    )
    dotted = f"({w3} || '.' || {w4})"
    return (
        f"{colon} || ' ' || {comma} || ' ' || {ver} || ' ' || {dotted}"
        f" || ' ' || {w1} || ' ' || {w3}"
    )


def mid_corpus_sql(table: str = "documents", id_col: str = "doc_id") -> str:
    """SELECT producing the (doc_id, text) Mid*-token corpus."""
    return (
        f"SELECT {id_col} AS doc_id, {mid_text_expr(id_col)} AS text"
        f" FROM {table}"
    )


# Deterministic Japanese corpus for the Kuromoji-role entries: each
# doc gets one of these template sentences by doc_id % len. The
# templates mix dictionary words, unknown katakana/hiragana runs, and
# ASCII so the lattice segmenter (analysis/japanese.py) is exercised
# end-to-end; the oracle re-derives each variant's token stream with
# the same pinned pure function and joins it as a literal table.
JA_TEMPLATES: tuple[str, ...] = (
    "日本語の形態素解析を実行する",
    "検索システムはデータを高速に処理する",
    "テーブルのハッシュ索引を構築した",
    "分散処理で大規模な文書を解析します",
    "spark で日本語の検索を実行します",
    "機械学習と自然言語処理の技術",
    "インデックスはメモリに保存する",
    "東京大学で情報検索を研究する",
)


def ja_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its JA_TEMPLATES
    sentence — dialect-portable (CASE/%/string literal only)."""
    return _template_expr(JA_TEMPLATES, id_expr)


def _template_expr(templates: tuple[str, ...], id_expr: str) -> str:
    whens = " ".join(f"WHEN {v} THEN '{s}'" for v, s in enumerate(templates))
    return f"CASE (({id_expr}) % {len(templates)}) {whens} END"


# Deterministic Simplified-Chinese corpus for the SmartCn-role entry —
# same contract as JA_TEMPLATES.
ZH_TEMPLATES: tuple[str, ...] = (
    "我们使用分布式系统处理大规模数据",
    "中文分词是信息检索的技术",
    "在北京大学研究机器学习",
    "spark 引擎支持高速查询",
    "建立索引可以提供高速搜索",
    "这个方法分析文档的结果",
    "数据库保存用户的信息",
    "程序在内存执行计算",
)


def zh_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its ZH_TEMPLATES
    sentence — dialect-portable."""
    return _template_expr(ZH_TEMPLATES, id_expr)


# Deterministic Polish corpus for the Stempel-role entry — same
# contract as JA_TEMPLATES. The sentences spread inflected case /
# agreement / gerund forms of shared lemmas (indeks, system,
# dokument, informacja, wyszukiwanie, przetwarzać) across variants so
# the light stemmer (analysis/polish.py) is what makes a TermQuery on
# the stem match them all.
PL_TEMPLATES: tuple[str, ...] = (
    "wyszukiwanie informacji w zbiorach dokumentów",
    "system indeksowania przetwarza dokumenty szybko",
    "indeks odwrócony przyspiesza wyszukiwania w systemie",
    "dane tekstowe przetwarzane i zapisywane w indeksie",
    "szybkie zapytania do systemów wyszukiwania informacji",
    "dokument zawiera informacje o strukturze indeksu",
    "silnik przetwarza zapytania nad danymi w pamięci",
    "budowa indeksów dokumentów w rozproszonym systemie",
)


def pl_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its PL_TEMPLATES
    sentence — dialect-portable."""
    return _template_expr(PL_TEMPLATES, id_expr)


# Deterministic two-sentence English corpus for the OpenNLP-role entry
# — same contract as JA_TEMPLATES. Each variant has TWO sentences so
# the sentence detector and the sentence-scoped NNP rule are exercised;
# shared nouns (documents, memory, index, query) recur across variants.
EN_POS_TEMPLATES: tuple[str, ...] = (
    "The search engine indexes documents quickly. It stores postings in memory.",
    "A distributed system processes the data. Spark executes the query plan.",
    "The index contains terms and positions. Compression reduces the storage.",
    "Engineers build scalable systems. The pipeline transforms documents into postings.",
    "The query returns ranked results. Scoring uses the term frequency.",
    "A tokenizer splits the text into words. The filter removes stopwords.",
    "The cluster schedules tasks on executors. Memory limits affect performance.",
    "Indexes accelerate the search. The merger combines segments efficiently.",
)


def en_pos_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its EN_POS_TEMPLATES
    sentences — dialect-portable."""
    return _template_expr(EN_POS_TEMPLATES, id_expr)


# Deterministic Greek corpus for the ICUTransformFilter-role entry —
# same contract as JA_TEMPLATES. Shared content words (κατάλογος,
# σύστημα, δεδομένα, αναζήτηση, έγγραφο) recur across variants; the
# Any-Latin transliteration (analysis/icu_transform.py) is what the
# index stores, so a Latin-script TermQuery matches them all.
EL_TEMPLATES: tuple[str, ...] = (
    "ο αλφαβητικός κατάλογος περιέχει τα έγγραφα",
    "το σύστημα επεξεργάζεται τα δεδομένα γρήγορα",
    "η αναζήτηση βρίσκει τον κατάλογο των όρων",
    "τα δεδομένα αποθηκεύονται στη μνήμη του συστήματος",
    "ο κατάλογος των εγγράφων ενημερώνεται συνεχώς",
    "η μηχανή εκτελεί την αναζήτηση στα έγγραφα",
    "το ευρετήριο επιταχύνει τις αναζητήσεις δεδομένων",
    "οι όροι του καταλόγου ταξινομούνται αλφαβητικά",
)


def el_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its EL_TEMPLATES
    sentence — dialect-portable."""
    return _template_expr(EL_TEMPLATES, id_expr)


# The CollationTestBase.TestCollationKeySort fixture words (A..J
# tracer order) for the collation-role entries — same deterministic
# doc_id % n assignment contract as JA_TEMPLATES.
COLLATE_TEMPLATES: tuple[str, ...] = (
    "pêche", "HAT", "péché", "HUT", "peach",
    "HÅT", "sin", "HØT", "sín", "HOT",
)


def collate_text_expr(id_expr: str = "doc_id") -> str:
    """SQL CASE expression assigning each row its COLLATE_TEMPLATES
    word — dialect-portable."""
    return _template_expr(COLLATE_TEMPLATES, id_expr)
