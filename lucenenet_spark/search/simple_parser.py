"""SimpleQueryParser — the lenient end-user syntax (reference
``src/Lucene.Net.QueryParser/Simple/SimpleQueryParser.cs:64``):
``+`` AND, ``|`` OR, ``-`` NOT, ``"..."`` phrase, trailing ``*``
prefix, ``~N`` fuzzy (term) / slop (phrase), ``( )`` grouping,
``\\`` escape. Never raises: malformed input degrades to literal
text (the parser's whole point).

Tree construction ports ``BuildQueryTree`` (ref ``:494``) exactly:
clauses combine left-associatively; a run of the same operator
flattens into one BooleanQuery; an operator CHANGE nests the tree
built so far as the first clause of a new BooleanQuery under the new
operator — so ``a + b | c`` parses as ``(a AND b) OR c``. A negated
branch becomes ``BooleanQuery{MUST_NOT branch, SHOULD MatchAllDocs}``
(ref ``:501-508``), double negation cancels (``state.Not % 2``).
Default operator between bare clauses is SHOULD (ref ``:130``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
)

_SPECIAL = set('()"|+-\\')
_FUZZ = re.compile(r"~(\d*)")


@dataclass
class _State:
    top: Query | None = None
    cur_op: Occur | None = None  # None == "not explicitly set"
    prev_op: Occur | None = None
    nots: int = 0


class _SimpleParser:
    def __init__(self, s: str, default_operator: Occur, analyzer):
        self.s = s
        self.i = 0
        self.n = len(s)
        self.default_op = default_operator
        self.analyze = analyzer

    # ---------------------------------------------------------- tree

    def _build(self, st: _State, branch: Query | None) -> None:
        """BuildQueryTree port (SimpleQueryParser.cs:494)."""
        if branch is not None:
            if st.nots % 2 == 1:
                branch = BooleanQuery.of(
                    (branch, Occur.MUST_NOT),
                    (MatchAllDocsQuery(), Occur.SHOULD),
                )
            if st.top is None:
                st.top = branch
            else:
                op = st.cur_op if st.cur_op is not None else self.default_op
                if st.prev_op is None or st.prev_op != op:
                    st.top = BooleanQuery.of((st.top, op))
                st.top = BooleanQuery(
                    boost=st.top.boost,
                    clauses=st.top.clauses + (BooleanClause(branch, op),),
                    minimum_number_should_match=st.top.minimum_number_should_match,
                )
                st.prev_op = op
        st.cur_op = None
        st.nots = 0

    # --------------------------------------------------------- lexing

    def _fuzziness(self) -> int | None:
        m = _FUZZ.match(self.s, self.i)
        if not m:
            return None
        self.i = m.end()
        return int(m.group(1)) if m.group(1) else -1  # -1 = bare ~

    def _consume_phrase(self) -> Query | None:
        # opening '"' already consumed; lenient: EOF terminates
        buf = []
        while self.i < self.n:
            c = self.s[self.i]
            self.i += 1
            if c == "\\" and self.i < self.n:
                buf.append(self.s[self.i])
                self.i += 1
            elif c == '"':
                break
            else:
                buf.append(c)
        fz = self._fuzziness()
        slop = fz if fz is not None and fz >= 0 else 0
        pairs = self.analyze("".join(buf))
        if not pairs:
            return None
        if len(pairs) == 1:
            return TermQuery(term=pairs[0][0])
        base = pairs[0][1]
        return PhraseQuery(
            phrase_terms=tuple(t for t, _ in pairs),
            term_positions=tuple(p - base for _, p in pairs),
            slop=slop,
        )

    def _consume_token(self) -> Query | None:
        buf = []
        escaped_any = False
        while self.i < self.n:
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < self.n:
                buf.append(self.s[self.i + 1])
                self.i += 2
                escaped_any = True
                continue
            if c.isspace() or c in '()"|+':
                break
            self.i += 1
            buf.append(c)
        word = "".join(buf)
        if not word:
            return None
        # trailing * -> prefix (PREFIX_OPERATOR, ref :404-485)
        if word.endswith("*") and not escaped_any:
            stripped = word[:-1]
            if stripped:
                return PrefixQuery(prefix=stripped.lower())
            return None
        # ~N -> fuzzy; N defaults to 2 on a bare ~ (FUZZY_OPERATOR)
        fm = re.match(r"(.+?)~(\d*)$", word)
        if fm and not escaped_any:
            edits = int(fm.group(2)) if fm.group(2) else 2
            return FuzzyQuery(term=fm.group(1).lower(), max_edits=edits)
        pairs = self.analyze(word)
        if not pairs:
            return None
        if len(pairs) == 1:
            return TermQuery(term=pairs[0][0])
        base = pairs[0][1]
        return PhraseQuery(
            phrase_terms=tuple(t for t, _ in pairs),
            term_positions=tuple(p - base for _, p in pairs),
        )

    # -------------------------------------------------------- parsing

    def parse_sub(self, depth: int = 0) -> Query | None:
        st = _State()
        while self.i < self.n:
            c = self.s[self.i]
            if c.isspace():
                self.i += 1
            elif c == "(":
                self.i += 1
                self._build(st, self.parse_sub(depth + 1))
            elif c == ")":
                self.i += 1
                if depth > 0:
                    break
                # stray close paren at top level: lenient no-op
            elif c == '"':
                self.i += 1
                self._build(st, self._consume_phrase())
            elif c == "+":
                self.i += 1
                st.cur_op = Occur.MUST
            elif c == "|":
                self.i += 1
                if self.i < self.n and self.s[self.i] == "|":
                    self.i += 1  # '||' synonym
                st.cur_op = Occur.SHOULD
            elif c == "-":
                self.i += 1
                st.nots += 1
            else:
                self._build(st, self._consume_token())
        return st.top


def parse_simple(
    s: str,
    default_operator: Occur = Occur.SHOULD,
    analyzer=analyze,
) -> Query:
    """Parse a SimpleQueryParser-syntax string into the Query AST.
    Empty / all-stopword input yields an empty BooleanQuery (matches
    nothing), mirroring the reference's empty result."""
    top = _SimpleParser(s or "", default_operator, analyzer).parse_sub()
    return top if top is not None else BooleanQuery()
