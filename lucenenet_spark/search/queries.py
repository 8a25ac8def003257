"""Query AST — the user-facing operator surface (SURVEY.md §2.9).

Mirrors the reference query types' *semantics* (not structure):
TermQuery (``Search/TermQuery.cs``), BooleanQuery with
MUST/SHOULD/MUST_NOT + minimumNumberShouldMatch
(``Search/BooleanQuery.cs``, ``BooleanClause.cs:120``), PhraseQuery
(``Search/PhraseQuery.cs``), multi-term queries that expand against
the term dictionary (Prefix/Wildcard/Fuzzy/TermRange —
``Search/PrefixQuery.cs`` etc.), MatchAllDocsQuery, ConstantScoreQuery
and DisjunctionMaxQuery (``Search/DisjunctionMaxQuery.cs:69-77``).

``rewrite()`` applies the reference's logical rewrites: single-clause
BooleanQuery collapses with boost folding (``BooleanQuery.cs:531-560``)
and multi-term queries expand to a ConstantScore/Boolean form once the
matching terms are known (``Search/MultiTermQuery.cs`` rewrite modes).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Sequence

import pandas as pd


class Occur(Enum):
    MUST = "MUST"
    SHOULD = "SHOULD"
    MUST_NOT = "MUST_NOT"


@dataclass(frozen=True)
class Query:
    boost: float = 1.0

    def terms(self) -> list[str]:
        """All index terms this query touches (for stats prefetch)."""
        return []

    def rewrite(self, term_dictionary=None) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    term: str = ""
    # index field to search (``Index/Term.cs`` Field); None = the
    # searcher's default. Single-field searchers ignore it;
    # MultiFieldSearcher routes on it.
    field: str | None = None

    def terms(self) -> list[str]:
        return [self.term]


@dataclass(frozen=True)
class BooleanClause:
    query: Query
    occur: Occur = Occur.SHOULD


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[BooleanClause, ...] = ()
    minimum_number_should_match: int = 0

    @staticmethod
    def of(*pairs: tuple[Query, Occur], boost: float = 1.0, min_should_match: int = 0):
        return BooleanQuery(
            boost=boost,
            clauses=tuple(BooleanClause(q, o) for q, o in pairs),
            minimum_number_should_match=min_should_match,
        )

    def terms(self) -> list[str]:
        out: list[str] = []
        for c in self.clauses:
            out.extend(c.query.terms())
        return out

    def rewrite(self, term_dictionary=None) -> Query:
        clauses = tuple(
            BooleanClause(c.query.rewrite(term_dictionary), c.occur) for c in self.clauses
        )
        # BooleanQuery.cs:531-560 — one positive clause, no minMatch:
        # collapse to the clause with boosts multiplied
        if (
            len(clauses) == 1
            and clauses[0].occur != Occur.MUST_NOT
            and self.minimum_number_should_match == 0
        ):
            inner = clauses[0].query
            return _with_boost(inner, inner.boost * self.boost)
        return BooleanQuery(self.boost, clauses, self.minimum_number_should_match)


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Phrase query. slop=0: exact — terms at consecutive positions
    (``Search/ExactPhraseScorer.cs``), integer phrase frequency.
    slop>0: sloppy — greedy minimal-window matching with
    1/(1+matchLength) fractional frequency (functions/sloppy.py; the
    ``SloppyPhraseScorer`` role with a pinned deterministic spec).
    Scored with BM25 over the phrase frequency and summed idf
    (``BM25Similarity.IdfExplain(collectionStats, termStats[])``)."""

    phrase_terms: tuple[str, ...] = ()
    # relative positions, defaults to 0..n-1; stopword gaps allowed
    term_positions: tuple[int, ...] | None = None
    slop: int = 0
    field: str | None = None

    def positions(self) -> tuple[int, ...]:
        return self.term_positions or tuple(range(len(self.phrase_terms)))

    def terms(self) -> list[str]:
        return list(self.phrase_terms)


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with ALTERNATIVES per slot (``Search/MultiPhraseQuery.cs:72``):
    slot i matches if ANY of its terms occurs at the expected position —
    the synonym/analyzer-graph phrase. Matching rides the same positions
    join as PhraseQuery with each slot's position set = the union of its
    terms' positions; weight = float32-ordered idf sum over every term
    of every slot (the reference sums TermStatistics over all termArrays
    entries, absent terms contributing their df=0 idf)."""

    slots: tuple[tuple[str, ...], ...] = ()
    term_positions: tuple[int, ...] | None = None
    slop: int = 0
    field: str | None = None

    def positions(self) -> tuple[int, ...]:
        return self.term_positions or tuple(range(len(self.slots)))

    def terms(self) -> list[str]:
        return [t for slot in self.slots for t in slot]


@dataclass(frozen=True)
class MatchAllDocsQuery(Query):
    pass


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query = field(default_factory=MatchAllDocsQuery)

    def terms(self) -> list[str]:
        return self.query.terms()


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """max(clause scores) + tie_breaker * (sum - max) per doc
    (``Search/DisjunctionMaxQuery.cs:69-77``)."""

    disjuncts: tuple[Query, ...] = ()
    tie_breaker: float = 0.0

    def terms(self) -> list[str]:
        out: list[str] = []
        for q in self.disjuncts:
            out.extend(q.terms())
        return out


class MultiTermQuery(Query):
    """Base for queries that expand against the term dictionary
    (``Search/MultiTermQuery.cs``). ``matches(terms)`` filters a
    sorted numpy/str sequence; expansion happens in
    ``IndexSearcher._expand`` as a DataFrame predicate instead of a
    TermsEnum automaton walk."""

    def dict_predicate(self):  # -> pyspark Column over F.col('term')
        raise NotImplementedError

    def python_predicate(self, term: str) -> bool:
        raise NotImplementedError

    def vector_predicate(self, terms):  # pd.Series[str] -> bool ndarray
        """Vectorized expansion over the driver-cached dictionary —
        C-level pandas/numpy instead of a Python loop per term (the
        loop was measurably slower than the distributed fallback it
        shadowed at 10^5+ cached terms)."""
        import numpy as np

        return np.fromiter(
            (self.python_predicate(t) for t in terms), dtype=bool, count=len(terms)
        )


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    prefix: str = ""

    def dict_predicate(self):
        from pyspark.sql import functions as F

        return F.col("term").startswith(self.prefix)

    def python_predicate(self, term: str) -> bool:
        return term.startswith(self.prefix)

    def vector_predicate(self, terms):
        return terms.str.startswith(self.prefix).to_numpy(dtype=bool)


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    """``*`` any run, ``?`` single char (``Search/WildcardQuery.cs``)."""

    pattern: str = ""

    def _regex(self) -> str:
        """``*`` any run, ``?`` one char, ``\\`` escapes the next char
        (``WildcardQuery.cs`` WILDCARD_ESCAPE)."""
        import re as _re

        out = []
        i, n = 0, len(self.pattern)
        while i < n:
            ch = self.pattern[i]
            if ch == "\\" and i + 1 < n:
                out.append(_re.escape(self.pattern[i + 1]))
                i += 2
                continue
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(_re.escape(ch))
            i += 1
        return "^" + "".join(out) + "$"

    def dict_predicate(self):
        from pyspark.sql import functions as F

        return F.col("term").rlike(self._regex())

    def python_predicate(self, term: str) -> bool:
        import re as _re

        return _re.match(self._regex(), term) is not None

    def vector_predicate(self, terms):
        return terms.str.match(self._regex()).to_numpy(dtype=bool)


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """Terms matching an ANCHORED regular expression
    (``Search/RegexpQuery.cs:52`` — Lucene regexps are full-match
    against the term). The automaton walk over the FST collapses to a
    dictionary predicate scan (rlike/fullmatch)."""

    pattern: str = ""

    def dict_predicate(self):
        from pyspark.sql import functions as F

        return F.col("term").rlike(f"^(?:{self.pattern})$")

    def python_predicate(self, term: str) -> bool:
        import re as _re

        return _re.fullmatch(self.pattern, term) is not None

    def vector_predicate(self, terms):
        return terms.str.fullmatch(self.pattern).to_numpy(dtype=bool)


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """Edit distance <= max_edits (default 2, the automaton ceiling in
    ``Search/FuzzyQuery.cs:58`` / ``Util/Automaton/LevenshteinAutomata.cs``).

    ``prefix_length`` requires candidates to share the query's first
    ``min(prefix_length, len(term))`` chars exactly, with the distance
    measured on the suffixes (``FuzzyQuery.cs:76`` realPrefixLength /
    FuzzyTermsEnum). ``max_expansions`` keeps only the closest N
    variants, ranked by edit-similarity boost desc then term asc —
    TopTermsScoringBooleanQueryRewrite's priority queue
    (``FuzzyQuery.cs:46`` defaultMaxExpansions=50). Our default None =
    expand everything up to MAX_CLAUSE_COUNT (kept so standing
    oracle-pinned entries are unchanged; pass 50 for the reference
    default). ``transpositions`` selects the distance, mirroring the
    ``FuzzyQuery.cs:45`` ``defaultTranspositions=true`` ctor parameter:
    True (default) counts an adjacent swap as ONE edit — the OSA /
    restricted Damerau-Levenshtein recurrence of
    ``LevenshteinAutomata`` with transpositions — False is plain
    Levenshtein (a swap costs 2)."""

    term: str = ""
    max_edits: int = 2
    prefix_length: int = 0
    max_expansions: int | None = None
    transpositions: bool = True

    def _p(self) -> int:
        return min(self.prefix_length, len(self.term))

    def _dist(self, a: str, b: str) -> int:
        return _osa(a, b) if self.transpositions else _levenshtein(a, b)

    def dict_predicate(self):
        """Distributed-dictionary predicate. JVM-side pushdown filters
        (length band; ``F.levenshtein`` budget — plain lev is within a
        factor 2 of OSA, so ``lev <= 2*max_edits`` is a sound OSA
        prefilter) shrink the scan before the exact distance; with
        transpositions the exact OSA test runs as an Arrow-batched
        pandas UDF over the few prefilter survivors."""
        from pyspark.sql import functions as F

        p = self._p()
        suffix = F.col("term").substr(F.lit(p + 1), F.length(F.col("term")))
        band = (
            F.abs(F.length(F.col("term")) - F.lit(len(self.term)))
            <= self.max_edits
        )
        if not self.transpositions:
            cond = band & (
                F.levenshtein(suffix, F.lit(self.term[p:])) <= self.max_edits
            )
        else:
            from pyspark.sql.functions import pandas_udf

            qsuf, budget = self.term[p:], self.max_edits

            @pandas_udf("boolean")
            def osa_ok(s: pd.Series) -> pd.Series:
                return s.map(lambda t: _osa(t, qsuf) <= budget)

            cond = (
                band
                & (F.levenshtein(suffix, F.lit(qsuf)) <= 2 * budget)
                & osa_ok(suffix)
            )
        if p:
            cond = F.col("term").startswith(self.term[:p]) & cond
        return cond

    def python_predicate(self, term: str) -> bool:
        p = self._p()
        return term.startswith(self.term[:p]) and (
            self._dist(term[p:], self.term[p:]) <= self.max_edits
        )

    def vector_predicate(self, terms):
        """Length-window prefilter (|len(t)-len(q)| <= max_edits lower-
        bounds both Levenshtein and OSA, and shared prefixes preserve
        the length gap) shrinks the dictionary to a few percent before
        the exact DP runs — the FuzzyTermsEnum automaton pre-gate,
        vectorized."""
        import numpy as np

        p = self._p()
        lens = terms.str.len().to_numpy()
        cand = np.abs(lens - len(self.term)) <= self.max_edits
        if p:
            cand &= terms.str.startswith(self.term[:p]).to_numpy(dtype=bool)
        out = np.zeros(len(terms), dtype=bool)
        idx = np.flatnonzero(cand)
        vals = terms.to_numpy()
        qsuf = self.term[p:]
        for i in idx:
            out[i] = self._dist(vals[i][p:], qsuf) <= self.max_edits
        return out


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    """Terms in [lower, upper] byte order (``Search/TermRangeQuery.cs``)."""

    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True

    def dict_predicate(self):
        from pyspark.sql import functions as F

        c = F.lit(True)
        if self.lower is not None:
            c = c & (F.col("term") >= self.lower if self.include_lower else F.col("term") > self.lower)
        if self.upper is not None:
            c = c & (F.col("term") <= self.upper if self.include_upper else F.col("term") < self.upper)
        return c

    def python_predicate(self, term: str) -> bool:
        if self.lower is not None:
            if term < self.lower or (term == self.lower and not self.include_lower):
                return False
        if self.upper is not None:
            if term > self.upper or (term == self.upper and not self.include_upper):
                return False
        return True

    def vector_predicate(self, terms):
        import numpy as np

        vals = terms.to_numpy()
        mask = np.ones(len(terms), dtype=bool)
        if self.lower is not None:
            mask &= (vals > self.lower) if not self.include_lower else (vals >= self.lower)
        if self.upper is not None:
            mask &= (vals < self.upper) if not self.include_upper else (vals <= self.upper)
        return mask


def _levenshtein(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _osa(a: str, b: str) -> int:
    """Optimal String Alignment (restricted Damerau-Levenshtein): an
    adjacent transposition counts as ONE edit, but no substring is
    edited twice — the recurrence of the reference's internal distance
    (``Suggest/Spell/LuceneLevenshteinDistance.cs:50`` transposition
    branch; also ``LevenshteinAutomata`` with transpositions=true).
    Distinct from FULL Damerau-Levenshtein (e.g. DuckDB's
    ``damerau_levenshtein``): osa('ca','abc') = 3 while full DL = 2 —
    they agree whenever no edit lands between a transposed pair."""
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return la + lb
    prev2: list[int] | None = None
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cb = b[j - 1]
            d = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if (
                i > 1
                and j > 1
                and ca == b[j - 2]
                and a[i - 2] == cb
            ):
                d = min(d, prev2[j - 2] + 1)
            cur[j] = d
        prev2, prev = prev, cur
    return prev[-1]


def _with_boost(q: Query, boost: float) -> Query:
    import dataclasses

    return dataclasses.replace(q, boost=boost)


def leading_wildcard_query(pattern: str) -> PrefixQuery:
    """Rewrite a leading-wildcard pattern (``*suffix``) into the
    PrefixQuery to run against a ``CorpusSpec(reverse=True)`` index
    (the ReverseStringFilter reversed-field idiom,
    ``Analysis/Reverse/ReverseStringFilter.cs:34``): the reversed
    dictionary turns the leading wildcard from a full-dictionary regex
    scan into a sorted-prefix lookup. Only the pure ``*literal`` shape
    qualifies; anything else should run as a plain WildcardQuery."""
    if not pattern.startswith("*"):
        raise ValueError("not a leading wildcard: " + pattern)
    suffix = pattern[1:]
    if any(ch in suffix for ch in "*?\\"):
        raise ValueError(
            "only the pure *literal shape rewrites to a reversed prefix: "
            + pattern
        )
    return PrefixQuery(prefix=suffix[::-1])


@dataclass(frozen=True)
class PhoneticQuery(MultiTermQuery):
    """Sounds-like expansion (PhoneticFilter.cs query-time idiom
    without reindexing): match every dictionary term whose soundex
    code (analysis/phonetic.py pinned spec) equals the query name's.
    Expansion rides the same paths as Prefix/Wildcard — JVM soundex
    Column on the distributed dictionary scan, python spec on the
    driver-cached one — then the constant-score rewrite."""

    name: str = ""

    def _code(self) -> str:
        from lucenenet_spark.analysis.phonetic import soundex_py

        return soundex_py(self.name)

    def dict_predicate(self):
        from pyspark.sql import functions as F

        from lucenenet_spark.analysis.phonetic import soundex_col

        return soundex_col(F.col("term")) == self._code()

    def python_predicate(self, term: str) -> bool:
        from lucenenet_spark.analysis.phonetic import soundex_py

        return soundex_py(term) == self._code()


@dataclass(frozen=True)
class SlowFuzzyQuery(MultiTermQuery):
    """Sandbox SlowFuzzyQuery (``Lucene.Net.Sandbox/Queries/
    SlowFuzzyQuery.cs:33``): fuzzy matching beyond the automaton
    ceiling. ``minimum_similarity`` >= 1 is an absolute edit budget
    (any distance, unlike FuzzyQuery's max 2); a fractional value in
    (0, 1) is the length-scaled threshold of the pre-4.0 API —
    a term qualifies when 1 - d/min(len(term), len(query)) >=
    minimum_similarity (``SlowFuzzyTermsEnum`` similarity)."""

    term: str = ""
    minimum_similarity: float = 3.0

    def _max_edits_for(self, tlen: int) -> int:
        if self.minimum_similarity >= 1.0:
            return int(self.minimum_similarity)
        m = min(tlen, len(self.term))
        return int((1.0 - self.minimum_similarity) * m)

    def dict_predicate(self):
        from pyspark.sql import functions as F

        d = F.levenshtein(F.col("term"), F.lit(self.term))
        if self.minimum_similarity >= 1.0:
            return d <= int(self.minimum_similarity)
        m = F.least(F.length(F.col("term")), F.lit(len(self.term)))
        return (
            F.lit(1.0) - d.cast("double") / m.cast("double")
        ) >= self.minimum_similarity

    def python_predicate(self, term: str) -> bool:
        d = _levenshtein(term, self.term)
        if self.minimum_similarity >= 1.0:
            return d <= int(self.minimum_similarity)
        m = min(len(term), len(self.term))
        return m > 0 and (1.0 - d / m) >= self.minimum_similarity

    def vector_predicate(self, terms):
        import numpy as np

        lens = terms.str.len().to_numpy()
        budget = (
            int(self.minimum_similarity)
            if self.minimum_similarity >= 1.0
            else int(
                (1.0 - self.minimum_similarity) * np.maximum(
                    np.minimum(lens, len(self.term)), 1
                ).max()
            )
        )
        cand = np.abs(lens - len(self.term)) <= max(budget, 0)
        out = np.zeros(len(terms), dtype=bool)
        vals = terms.to_numpy()
        for i in np.flatnonzero(cand):
            out[i] = self.python_predicate(vals[i])
        return out
