"""Surround query language parser — proximity operators over spans
(reference ``Lucene.Net.QueryParser/Surround/``: ``Parser/QueryParser.jj``
grammar, ``Query/DistanceQuery.cs`` (nW/nN → SpanNearQuery with
slop = distance - 1), ``Query/SrndTruncQuery.cs`` (``*``/``?``
truncation → SpanMultiTermQueryWrapper), ``Query/SrndBooleanQuery.cs``).

Grammar (case-insensitive operators), both infix and prefix forms::

    query    := orExpr
    orExpr   := andExpr (OR andExpr)*
    andExpr  := notExpr (AND notExpr)*
    notExpr  := distExpr (NOT distExpr)*
    distExpr := primary (( [n]W | [n]N ) primary)*     # default n = 1
    primary  := (AND|OR|W|N|nW|nN) '(' query (',' query)* ')'
              | '(' query ')'
              | term                                    # may hold * ?

Mapping onto this engine (pinned; scope documented):

- ``a 3W b``  → SpanNearQuery(slop=2, in_order=True)   (DistanceQuery
  ``opDistance - 1``, DistanceQuery.cs:91)
- ``a 3N b``  → SpanNearQuery(slop=2, in_order=False)
- consecutive SAME-op infix distance folds into one N-clause near
  (the reference parser collects same-operator chains the same way)
- OR of span-shaped operands inside a distance op → SpanOrQuery;
  truncated terms → SpanMultiTermQuery(Prefix/Wildcard)
- a query that is boolean-only over plain terms → BooleanQuery of
  TermQuery (scored); NOT maps to MUST_NOT
- boolean ops over *distance* subqueries are out of scope here and
  raise (the reference rewrites them to constant-score span filters;
  this engine exposes spans as a separate count surface —
  spans.span_query)

``parse_surround`` returns the AST; ``run_surround`` evaluates it on a
searcher: span-shaped → (docid, n_spans), boolean/term-shaped →
ranked top-k.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from lucenenet_spark.search.queries import (
    BooleanQuery,
    Occur,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.search.spans import (
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanQuery,
    SpanTermQuery,
)

_TOKEN_RE = re.compile(
    r"\s*(?:(?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)"
    r"|(?P<dist>\d*[wWnN])(?=[\s(])"
    r"|(?P<word>[^\s(),]+))"
)


@dataclass
class _Tok:
    kind: str
    text: str


def _lex(s: str) -> list[_Tok]:
    out: list[_Tok] = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"surround: cannot lex at {s[pos:]!r}")
        pos = m.end()
        for kind in ("lparen", "rparen", "comma", "dist", "word"):
            t = m.group(kind)
            if t is not None:
                up = t.upper()
                if kind == "word" and up in ("AND", "OR", "NOT"):
                    out.append(_Tok(up, up))
                elif kind == "dist":
                    out.append(_Tok("DIST", up))
                else:
                    out.append(_Tok(kind, t))
                break
    return out


class _Parser:
    def __init__(self, toks: list[_Tok]):
        self.toks = toks
        self.i = 0

    def peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def eat(self, kind: str) -> _Tok:
        t = self.peek()
        if t is None or t.kind != kind:
            raise ValueError(f"surround: expected {kind}, got {t}")
        self.i += 1
        return t

    # ---- grammar ----
    def query(self):
        return self.or_expr()

    def or_expr(self):
        node = self.and_expr()
        parts = [node]
        while (t := self.peek()) and t.kind == "OR":
            self.i += 1
            parts.append(self.and_expr())
        return parts[0] if len(parts) == 1 else _bool(parts, Occur.SHOULD)

    def and_expr(self):
        parts = [self.not_expr()]
        while (t := self.peek()) and t.kind == "AND":
            self.i += 1
            parts.append(self.not_expr())
        return parts[0] if len(parts) == 1 else _bool(parts, Occur.MUST)

    def not_expr(self):
        node = self.dist_expr()
        while (t := self.peek()) and t.kind == "NOT":
            self.i += 1
            rhs = self.dist_expr()
            node = _bool_not(node, rhs)
        return node

    def dist_expr(self):
        node = self.primary()
        while (t := self.peek()) and t.kind == "DIST":
            self.i += 1
            dist, ordered = _dist_of(t.text)
            rhs = self.primary()
            left = _as_span(node)
            right = _as_span(rhs)
            # fold same-op chains into one N-clause near
            if (
                isinstance(left, SpanNearQuery)
                and left.slop == dist - 1
                and left.in_order == ordered
                and getattr(left, "_folded", False)
            ):
                node = SpanNearQuery(
                    left.clauses + (right,), slop=dist - 1, in_order=ordered
                )
            else:
                node = SpanNearQuery((left, right), slop=dist - 1, in_order=ordered)
            object.__setattr__(node, "_folded", True)
        return node

    def primary(self):
        t = self.peek()
        if t is None:
            raise ValueError("surround: unexpected end of input")
        if t.kind in ("AND", "OR", "DIST") and self._next_is_lparen():
            self.i += 1
            args = self._arg_list()
            if t.kind == "AND":
                return _bool(args, Occur.MUST)
            if t.kind == "OR":
                spans = [a for a in args if isinstance(a, SpanQuery)]
                if len(spans) == len(args):
                    return SpanOrQuery(tuple(spans))
                return _bool(args, Occur.SHOULD)
            dist, ordered = _dist_of(t.text)
            return SpanNearQuery(
                tuple(_as_span(a) for a in args), slop=dist - 1, in_order=ordered
            )
        if t.kind == "lparen":
            self.i += 1
            node = self.query()
            self.eat("rparen")
            return node
        w = self.eat("word").text.lower()
        if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
            return SpanMultiTermQuery(PrefixQuery(prefix=w[:-1]))
        if "*" in w or "?" in w:
            return SpanMultiTermQuery(WildcardQuery(pattern=w))
        return SpanTermQuery(term=w)

    def _next_is_lparen(self) -> bool:
        return (
            self.i + 1 < len(self.toks) and self.toks[self.i + 1].kind == "lparen"
        )

    def _arg_list(self):
        self.eat("lparen")
        args = [self.query()]
        while (t := self.peek()) and t.kind == "comma":
            self.i += 1
            args.append(self.query())
        self.eat("rparen")
        return args


def _dist_of(text: str) -> tuple[int, bool]:
    n = int(text[:-1]) if len(text) > 1 else 1
    if n < 1:
        raise ValueError("surround: distance must be >= 1")
    return n, text[-1] == "W"


def _as_span(node) -> SpanQuery:
    if isinstance(node, SpanQuery):
        return node
    if isinstance(node, TermQuery):
        return SpanTermQuery(term=node.term)
    # OR of plain terms in distance context → SpanOr
    # (SpanNearClauseFactory.cs converts the same way)
    if (
        isinstance(node, BooleanQuery)
        and node.clauses
        and all(
            c.occur == Occur.SHOULD and isinstance(c.query, TermQuery)
            for c in node.clauses
        )
    ):
        return SpanOrQuery(
            tuple(SpanTermQuery(term=c.query.term) for c in node.clauses)
        )
    raise NotImplementedError(
        "surround: boolean subqueries inside a distance operator are "
        "out of scope (reference rewrites them via SpanNearClauseFactory)"
    )


def _as_scored(node):
    """Span leaves double as scored term queries in boolean context."""
    if isinstance(node, SpanTermQuery):
        return TermQuery(term=node.term)
    if isinstance(node, SpanMultiTermQuery):
        return node.wrapped
    if isinstance(node, SpanQuery):
        raise NotImplementedError(
            "surround: distance subqueries under AND/OR/NOT are out of "
            "scope; run them via spans.span_query"
        )
    return node


def _bool(parts, occur: Occur):
    return BooleanQuery.of(*[(_as_scored(p), occur) for p in parts])


def _bool_not(left, right):
    inc = _as_scored(left)
    exc = _as_scored(right)
    pairs = []
    if isinstance(inc, BooleanQuery):
        pairs = [(c.query, c.occur) for c in inc.clauses]
    else:
        pairs = [(inc, Occur.MUST)]
    pairs.append((exc, Occur.MUST_NOT))
    return BooleanQuery.of(*pairs)


def parse_surround(s: str):
    """Parse a surround expression → SpanQuery or BooleanQuery/Term AST."""
    p = _Parser(_lex(s))
    node = p.query()
    if p.peek() is not None:
        raise ValueError(f"surround: trailing input at {p.peek()}")
    return node


def run_surround(searcher, s: str, k: int = 10):
    """Evaluate: span-shaped → (docid, n_spans) DataFrame; term/boolean
    → ranked (docid, score) DataFrame (top-k)."""
    from lucenenet_spark.search import spans as sp

    node = parse_surround(s)
    if isinstance(node, SpanQuery) and not isinstance(
        node, (SpanTermQuery, SpanMultiTermQuery)
    ):
        return sp.span_query(searcher, node)
    if isinstance(node, SpanQuery):
        node = _as_scored(node)
    return searcher.search_df(node, k)
