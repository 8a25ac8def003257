"""The reference query set — the TestBM25Similarity/TestBooleanQuery-
style suite (north rule) run by bench.py, the scaling harness, and the
oracle-identity tests. One entry per user-facing query type
(SURVEY.md §2.9) over the synthetic source-code corpus vocabulary.
"""

from __future__ import annotations

from lucenenet_spark.search.queries import (
    BooleanQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    WildcardQuery,
)
from lucenenet_spark.sources.synthetic import vocab


def reference_query_set(seed: int = 42) -> dict[str, Query]:
    voc = vocab(seed)
    # TermQuery is unanalyzed (Lucene semantics), so the probe must
    # hand it an INDEX term: lowercase the vocab identifier and, for
    # dotted identifiers, take the first tokenizer fragment. (Until
    # r4 these probes passed the raw camelCase/dotted surface form
    # and silently matched nothing — bench/scaling identity checks
    # still held, but the two probes measured an empty scan.)
    # voc[4500] was the old "rare" pick, but under the corpus's
    # pareto(1.2) body its expected count is < 1 even at 600k docs;
    # voc[800] has df ~ a dozen docs at the 200k bench scale — rare
    # AND present, so the probe exercises a real tail lookup.
    rare = str(voc[800]).lower().split(".")[0]  # tail term, small df
    mid = str(voc[50]).lower().split(".")[0]  # Zipf-body, moderate df
    return {
        "term_head": TermQuery(term="return"),
        "term_mid": TermQuery(term=mid),
        "term_rare": TermQuery(term=rare),
        "bool_and": BooleanQuery.of(
            (TermQuery(term="return"), Occur.MUST), (TermQuery(term="value"), Occur.MUST)
        ),
        "bool_or": BooleanQuery.of(
            (TermQuery(term="class"), Occur.SHOULD), (TermQuery(term="def"), Occur.SHOULD)
        ),
        "bool_not": BooleanQuery.of(
            (TermQuery(term="value"), Occur.MUST), (TermQuery(term="data0"), Occur.MUST_NOT)
        ),
        "min_should_match": BooleanQuery.of(
            (TermQuery(term="return"), Occur.SHOULD),
            (TermQuery(term="value"), Occur.SHOULD),
            (TermQuery(term="data0"), Occur.SHOULD),
            min_should_match=2,
        ),
        "phrase": PhraseQuery(phrase_terms=("return", "value")),
        "dismax": DisjunctionMaxQuery(
            disjuncts=(TermQuery(term="return"), TermQuery(term="class")), tie_breaker=0.1
        ),
        "prefix": PrefixQuery(prefix="get"),
        "wildcard": WildcardQuery(pattern="ret*"),
        "fuzzy": FuzzyQuery(term="retrn", max_edits=2),
        "sloppy_phrase": PhraseQuery(phrase_terms=("return", "value"), slop=2),
        "multi_phrase": MultiPhraseQuery(slots=(("return",), ("value", "data0"))),
        "regexp": RegexpQuery(pattern="ret.*"),
    }
