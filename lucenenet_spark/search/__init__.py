from lucenenet_spark.search.queries import (  # noqa: F401
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher  # noqa: F401
from lucenenet_spark.search.parser import parse_query  # noqa: F401
