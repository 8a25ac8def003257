"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Seed=42; columns (repo, path, commit, lang, content) exactly per
BASELINE.json input_hint. Zipf-skewed ~vocab with a few head terms in
>30% of docs (exercises skew handling), camelCase/snake_case/dotted
identifiers, keywords, numerics. Generator code only — no data files.
"""

from __future__ import annotations

import hashlib
import random

_EXT_LANG = {"py": "python", "cs": "csharp", "java": "java", "md": "markdown"}

_HEAD_TERMS = ["return", "if", "value", "data0", "self", "x"]  # >30% of docs
_KEYWORDS = ["class", "def", "import", "public", "static", "void", "int", "string"]


def _vocab(rng: random.Random, n: int = 2000) -> list[str]:
    out = []
    syll = ["foo", "bar", "baz", "qux", "get", "set", "run", "calc", "parse",
            "node", "tree", "hash", "map", "list", "util", "core", "spark"]
    for i in range(n):
        style = rng.randrange(4)
        a, b = rng.choice(syll), rng.choice(syll)
        if style == 0:
            out.append(f"{a}_{b}_{i}")          # snake_case
        elif style == 1:
            out.append(f"{a}{b.capitalize()}{i}")  # camelCase
        elif style == 2:
            out.append(f"{a}{i}.{b}{i % 7}")    # dotted call a.b
        else:
            out.append(f"{a}{i}")
    return out


def generate_corpus(n_docs: int = 200, seed: int = 42) -> list[dict]:
    rng = random.Random(seed)
    vocab = _vocab(rng)
    rows = []
    for i in range(n_docs):
        repo = f"repo-{i % 8:03d}"
        ext = rng.choice(list(_EXT_LANG))
        path = f"src/{rng.choice(['core','util','io'])}/{rng.choice(['mod','lib','svc'])}_{i}.{ext}"
        commit = hashlib.sha1(f"{repo}/{path}".encode()).hexdigest()
        n_tok = rng.randint(20, 400) if rng.random() < 0.9 else rng.randint(400, 2000)
        words = []
        for _ in range(n_tok):
            r = rng.random()
            if r < 0.25:
                words.append(rng.choice(_HEAD_TERMS))  # Zipf head
            elif r < 0.35:
                words.append(rng.choice(_KEYWORDS))
            elif r < 0.42:
                words.append(str(rng.randrange(100)))
            elif r < 0.47:
                words.append(rng.choice(["the", "a", "of", "to", "in"]))  # stopwords
            else:
                # Zipf-ish body: low ids more common
                idx = min(int(rng.paretovariate(1.2)) - 1, len(vocab) - 1)
                words.append(vocab[idx])
        content = " ".join(words)
        rows.append(
            {
                "repo": repo,
                "path": path,
                "commit": commit,
                "lang": _EXT_LANG[ext],
                "content": content,
            }
        )
    # pinned total order = (repo, path, commit); docid = rank in this order
    rows.sort(key=lambda r: (r["repo"], r["path"], r["commit"]))
    return rows


def corpus_texts(rows: list[dict]) -> list[str]:
    """Texts in docid order (rows are already sorted)."""
    return [r["content"] for r in rows]
