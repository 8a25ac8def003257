"""Classic query-parser subset → Query AST.

Covers the surface the reference's classic QueryParser exposes
(``QueryParser/Classic/QueryParserBase.cs:188,443-920``):
``term``, ``"a phrase"``, ``+must -not``, infix ``AND OR NOT``,
``boost^2.5``, ``prefix*``, ``wild?card*``, ``fuzzy~`` / ``fuzzy~1``,
``[a TO b]`` / ``{a TO b}``, parentheses. Bare terms run through the
analyzer (GetFieldQuery semantics: stopwords vanish, multi-token text
becomes a phrase); wildcard/fuzzy/range terms are lowercased but not
analyzed (LowercaseExpandedTerms default).
"""

from __future__ import annotations

import re
from dataclasses import replace as _dc_replace

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)

_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<quoted>(?:[A-Za-z_][A-Za-z0-9_]*:)?"[^"]*")
    | (?P<range>[\[{]\s*\S+\s+TO\s+\S+\s*[\]}])
    | (?P<and>AND\b)
    | (?P<or>OR\b)
    | (?P<not>NOT\b)
    | (?P<plus>\+)
    | (?P<minus>-)
    | (?P<word>[^\s()^]+)
    )""",
    re.VERBOSE,
)
_BOOST = re.compile(r"\^(\d+(?:\.\d+)?)")


def _boosted(q: Query | None, b: float) -> Query | None:
    """Fold a trailing ^boost onto a parsed group
    (``QueryParserBase.cs:919`` HandleBoost — multiplies into the
    clause query's boost)."""
    if q is None or b == 1.0:
        return q
    return _dc_replace(q, boost=q.boost * b)


class _Parser:
    # class attrs so the flexible StandardQueryParser (standard_parser.py)
    # can reuse the leaf grammar with its own token table / defaults
    TOKEN = _TOKEN
    phrase_slop = 0  # default slop for phrases without an explicit ~N
    fuzzy_max_edits = 2  # default edits for bare `term~`
    fuzzy_prefix_length = 0
    allow_leading_wildcard = True  # classic surface is permissive

    def __init__(self, s: str, analyzer=analyze):
        self.s = s
        self.i = 0
        self.analyze = analyzer

    def peek(self):
        if self.i >= len(self.s):
            return None, None
        m = self.TOKEN.match(self.s, self.i)
        if not m:
            return None, None
        kind = m.lastgroup
        return kind, m

    def next(self):
        kind, m = self.peek()
        if m:
            self.i = m.end()
        return kind, m

    def maybe_boost(self) -> float:
        m = _BOOST.match(self.s, self.i)
        if m:
            self.i = m.end()
            return float(m.group(1))
        return 1.0

    def parse(self) -> Query:
        clauses: list[BooleanClause] = []
        pending_occur: Occur | None = None
        prev_operator: str | None = None
        while True:
            kind, m = self.peek()
            if kind is None or kind == "rparen":
                break
            self.next()
            if kind == "plus":
                pending_occur = Occur.MUST
                continue
            if kind == "minus" or kind == "not":
                pending_occur = Occur.MUST_NOT
                continue
            if kind == "and":
                prev_operator = "AND"
                # retroactively make previous clause MUST (classic parser)
                if clauses and clauses[-1].occur == Occur.SHOULD:
                    clauses[-1] = BooleanClause(clauses[-1].query, Occur.MUST)
                continue
            if kind == "or":
                prev_operator = "OR"
                continue
            q = self._leaf(kind, m)
            if q is None:
                pending_occur = None
                continue
            occur = pending_occur or Occur.SHOULD
            if pending_occur is None and prev_operator == "AND":
                occur = Occur.MUST
            clauses.append(BooleanClause(q, occur))
            pending_occur = None
        return BooleanQuery(clauses=tuple(clauses))

    def _leaf(self, kind, m) -> Query | None:
        """One leaf clause (group / quoted phrase / range / word) —
        the shared lexical surface of the Classic parser and the
        flexible StandardQueryParser built on top of it."""
        q: Query | None = None
        if kind == "lparen":
            q = self.parse()
            k2, _ = self.next()  # consume ')'
            q = _boosted(q, self.maybe_boost())
        elif kind == "quoted":
            raw = m.group("quoted")
            qfield = None
            if not raw.startswith('"'):  # field:"..." prefix
                qfield, raw = raw.split(":", 1)
            text = raw[1:-1]
            pairs = self.analyze(text)
            boost = self.maybe_boost()
            slop = self.phrase_slop
            sm = re.match(r"~(\d+)", self.s[self.i :])
            if sm:
                self.i += sm.end()
                slop = int(sm.group(1))
            if not pairs:
                q = None
            elif len(pairs) == 1:
                q = TermQuery(boost=boost, term=pairs[0][0], field=qfield)
            else:
                base = pairs[0][1]
                q = PhraseQuery(
                    boost=boost,
                    phrase_terms=tuple(t for t, _ in pairs),
                    term_positions=tuple(p - base for _, p in pairs),
                    slop=slop,
                    field=qfield,
                )
        elif kind == "range":
            body = m.group("range")
            inc_lo, inc_hi = body[0] == "[", body[-1] == "]"
            lo, hi = re.match(r"[\[{]\s*(\S+)\s+TO\s+(\S+)\s*[\]}]", body).groups()
            boost = self.maybe_boost()
            q = TermRangeQuery(
                boost=boost,
                lower=None if lo == "*" else lo.lower(),
                upper=None if hi == "*" else hi.lower(),
                include_lower=inc_lo,
                include_upper=inc_hi,
            )
        elif kind == "word":
            word = m.group("word")
            # field:term — captured onto the term/phrase node
            # (GetFieldQuery); single-field searchers ignore it,
            # MultiFieldSearcher routes on it
            qfield = None
            fqm = re.match(r"^([A-Za-z_][A-Za-z0-9_]*):(.+)$", word)
            if fqm:
                qfield, word = fqm.group(1), fqm.group(2)
            fm = re.match(r"(.+?)~(\d?)$", word)
            if fm and not word.startswith("~"):
                base, edits = fm.group(1), fm.group(2)
                boost = self.maybe_boost()
                q = FuzzyQuery(
                    boost=boost,
                    term=base.lower(),
                    max_edits=int(edits) if edits else self.fuzzy_max_edits,
                    prefix_length=self.fuzzy_prefix_length,
                )
            elif "*" in word or "?" in word:
                if word[0] in "*?" and not self.allow_leading_wildcard:
                    # AllowLeadingWildcardProcessor.cs:49 — rejected
                    # unless explicitly enabled
                    raise ValueError(
                        f"leading wildcard not allowed: {word!r}"
                    )
                boost = self.maybe_boost()
                if word.endswith("*") and "*" not in word[:-1] and "?" not in word:
                    q = PrefixQuery(boost=boost, prefix=word[:-1].lower())
                else:
                    q = WildcardQuery(boost=boost, pattern=word.lower())
            else:
                boost = self.maybe_boost()
                pairs = self.analyze(word)
                if not pairs:
                    q = None
                elif len(pairs) == 1:
                    q = TermQuery(boost=boost, term=pairs[0][0], field=qfield)
                else:
                    q = PhraseQuery(
                        boost=boost,
                        phrase_terms=tuple(t for t, _ in pairs),
                        field=qfield,
                    )
        return q


def parse_query(s: str, stem: bool = False) -> Query:
    """Parse a classic-syntax query string; single-clause boolean
    collapses via Query.rewrite at search time. ``stem=True`` runs
    terms/phrases through the Porter pipeline — REQUIRED when querying
    an index built with ``CorpusSpec(stem=True)``."""
    if stem:
        from lucenenet_spark.analysis.analyzer import analyze_stemmed

        return _Parser(s, analyzer=analyze_stemmed).parse()
    return _Parser(s).parse()
