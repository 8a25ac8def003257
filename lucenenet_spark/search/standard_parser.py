"""Flexible StandardQueryParser analog → Query AST.

The reference's modern configurable parser
(``QueryParser/Flexible/Standard/StandardQueryParser.cs:106``) parses
the same lexical surface as the Classic parser but through a
config-object pipeline (``QueryConfigHandler`` / ``ConfigurationKeys``)
and a JavaCC grammar with **operator precedence**
(``Flexible/Standard/Parser/StandardSyntaxParser.cs:170``):

    Query     ::= DisjQuery ( DisjQuery )*     — juxtaposition → default op
    DisjQuery ::= ConjQuery ( OR ConjQuery )*  — OR binds loosest
    ConjQuery ::= ModClause ( AND ModClause )* — AND binds tighter
    ModClause ::= [ + | - | NOT ] Clause

so ``a OR b AND c`` parses as ``a OR (b AND c)`` — unlike Classic's
flat left-to-right fold which yields ``(SHOULD a, MUST b, MUST c)``.
The node pipeline the reference runs afterwards
(``Flexible/Core/QueryNodeProcessorPipeline.cs``;
``BooleanQuery2ModifierNodeProcessor`` maps And-children → MUST,
``GroupQueryNodeProcessor`` applies the default operator to juxtaposed
clauses, ``AllowLeadingWildcardProcessor.cs:49`` rejects leading
wildcards unless configured, ``MultiFieldQueryNodeProcessor`` expands
fieldless leaves over ``SetMultiFields``, boosted by ``FieldsBoost``)
is folded directly into the recursive-descent construction here — the
AST is small enough that a separate node-rewrite pipeline would be
ceremony.

Config surface mirrors ``StandardQueryParser``'s properties
(``DefaultOperator``, ``PhraseSlop``, ``FuzzyMinSim``→max_edits,
``FuzzyPrefixLength``, ``AllowLeadingWildcard``, ``SetMultiFields``,
``FieldsBoost``).  The flexible grammar additionally lexes
``/regexp/`` terms (``RegexpToken.REGEXPTERM``) → RegexpQuery.

Leaf construction (quoted phrase / range / word / group) is shared
with the Classic parser via ``_Parser._leaf`` — the two parsers differ
in clause combination, not in leaf lexing, exactly as in the
reference where both grammars build the same ``FieldQueryNode`` leaves.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field, replace

from lucenenet_spark.analysis.analyzer import analyze
from lucenenet_spark.search.parser import _Parser
from lucenenet_spark.search.queries import (
    BooleanClause,
    BooleanQuery,
    Occur,
    PhraseQuery,
    Query,
    RegexpQuery,
    TermQuery,
)

# Classic token table + the flexible grammar's REGEXPTERM (/.../)
_STD_TOKEN = re.compile(
    r"""\s*(?:
      (?P<lparen>\()
    | (?P<rparen>\))
    | (?P<quoted>(?:[A-Za-z_][A-Za-z0-9_]*:)?"[^"]*")
    | (?P<regexp>(?:[A-Za-z_][A-Za-z0-9_]*:)?/(?:[^/\\]|\\.)*/)
    | (?P<range>[\[{]\s*\S+\s+TO\s+\S+\s*[\]}])
    | (?P<and>AND\b|&&)
    | (?P<or>OR\b|\|\|)
    | (?P<not>NOT\b|!)
    | (?P<plus>\+)
    | (?P<minus>-)
    | (?P<word>[^\s()^]+)
    )""",
    re.VERBOSE,
)


@dataclass(frozen=True)
class StandardQueryConfig:
    """``ConfigurationKeys`` analog — one frozen object instead of the
    reference's attribute-keyed ``QueryConfigHandler`` map."""

    default_operator: str = "OR"  # ConfigurationKeys.DEFAULT_OPERATOR
    phrase_slop: int = 0  # ConfigurationKeys.PHRASE_SLOP
    fuzzy_max_edits: int = 2  # FuzzyConfig (FuzzyMinSim → edits)
    fuzzy_prefix_length: int = 0  # FuzzyConfig.PrefixLength
    allow_leading_wildcard: bool = False  # default FALSE, unlike Classic
    multi_fields: tuple[str, ...] = ()  # SetMultiFields
    fields_boost: dict[str, float] = field(default_factory=dict)
    stem: bool = False  # analyzer choice (Porter pipeline)

    def __post_init__(self):
        if self.default_operator not in ("OR", "AND"):
            raise ValueError(f"default_operator: {self.default_operator!r}")


class _StandardParser(_Parser):
    TOKEN = _STD_TOKEN

    def __init__(self, s: str, config: StandardQueryConfig):
        analyzer = analyze
        if config.stem:
            from lucenenet_spark.analysis.analyzer import analyze_stemmed

            analyzer = analyze_stemmed
        super().__init__(s, analyzer=analyzer)
        self.config = config
        self.phrase_slop = config.phrase_slop
        self.fuzzy_max_edits = config.fuzzy_max_edits
        self.fuzzy_prefix_length = config.fuzzy_prefix_length
        self.allow_leading_wildcard = config.allow_leading_wildcard

    # --- grammar ---------------------------------------------------
    # StandardSyntaxParser.cs:174 Query(): juxtaposed DisjQuery list
    def parse(self) -> Query:
        clauses: list[BooleanClause] = []
        top_occur = (
            Occur.MUST if self.config.default_operator == "AND" else Occur.SHOULD
        )
        while True:
            kind, _ = self.peek()
            if kind is None or kind == "rparen":
                break
            got = self._disj_query()
            if got is None:
                continue
            q, occur = got
            clauses.append(BooleanClause(q, occur or top_occur))
        if len(clauses) == 1 and clauses[0].occur in (Occur.SHOULD, Occur.MUST):
            return clauses[0].query
        return BooleanQuery(clauses=tuple(clauses))

    # DisjQuery ::= ConjQuery ( OR ConjQuery )*
    def _disj_query(self):
        first = self._conj_query()
        parts = [first] if first is not None else []
        while True:
            kind, m = self.peek()
            if kind != "or":
                break
            self.next()
            nxt = self._conj_query()
            if nxt is not None:
                parts.append(nxt)
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        # OrQueryNode → SHOULD children (explicit MUST_NOT survives)
        return (
            BooleanQuery(
                clauses=tuple(
                    BooleanClause(q, occ or Occur.SHOULD) for q, occ in parts
                )
            ),
            None,
        )

    # ConjQuery ::= ModClause ( AND ModClause )*
    def _conj_query(self):
        first = self._mod_clause()
        parts = [first] if first is not None else []
        while True:
            kind, m = self.peek()
            if kind != "and":
                break
            self.next()
            nxt = self._mod_clause()
            if nxt is not None:
                parts.append(nxt)
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        # AndQueryNode → BooleanQuery2ModifierNodeProcessor: MUST
        # children unless the modifier already says MUST_NOT
        return (
            BooleanQuery(
                clauses=tuple(
                    BooleanClause(q, occ if occ == Occur.MUST_NOT else Occur.MUST)
                    for q, occ in parts
                )
            ),
            None,
        )

    # ModClause ::= [ + | - | NOT ] Clause
    def _mod_clause(self):
        occur: Occur | None = None
        while True:
            kind, m = self.peek()
            if kind == "plus":
                occur = Occur.MUST
            elif kind in ("minus", "not"):
                occur = Occur.MUST_NOT
            else:
                break
            self.next()
        kind, m = self.peek()
        if kind is None or kind == "rparen" or kind in ("and", "or"):
            # dangling modifier / operator with no clause — skip token
            if kind in ("and", "or"):
                self.next()
            return None
        self.next()
        q = self._clause(kind, m)
        if q is None:
            return None
        return q, occur

    def _clause(self, kind, m) -> Query | None:
        if kind == "regexp":
            raw = m.group("regexp")
            if not raw.startswith("/"):
                # field: prefix parsed but dropped, matching the
                # Classic parser's single-field multi-term convention
                _, raw = raw.split(":", 1)
            boost = self.maybe_boost()
            return RegexpQuery(boost=boost, pattern=raw[1:-1])
        q = self._leaf(kind, m)
        return self._multi_field(q)

    # MultiFieldQueryNodeProcessor + FieldBoostMapProcessor: a
    # fieldless term/phrase expands to a SHOULD-disjunction over the
    # configured fields, each boosted by FieldsBoost
    def _multi_field(self, q: Query | None) -> Query | None:
        if q is None or not self.config.multi_fields:
            return q
        if not isinstance(q, (TermQuery, PhraseQuery)) or q.field is not None:
            return q
        per_field = []
        for f in self.config.multi_fields:
            fb = self.config.fields_boost.get(f, 1.0)
            per_field.append(replace(q, field=f, boost=q.boost * fb))
        if len(per_field) == 1:
            return per_field[0]
        return BooleanQuery(
            clauses=tuple(BooleanClause(c, Occur.SHOULD) for c in per_field)
        )


def parse_standard(
    s: str, config: StandardQueryConfig | None = None
) -> Query:
    """Parse with the flexible StandardQueryParser semantics
    (precedence grammar + config object).  Single top-level clause
    collapses to the clause query itself (the reference's one-child
    BooleanQueryNode elision in ``BooleanSingleChildOptimizationQueryNodeProcessor``)."""
    return _StandardParser(s, config or StandardQueryConfig()).parse()
