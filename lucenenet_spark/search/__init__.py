from lucenenet_spark.search.queries import (  # noqa: F401
    BooleanClause,
    BooleanQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllDocsQuery,
    MultiPhraseQuery,
    Occur,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucenenet_spark.search.searcher import IndexSearcher  # noqa: F401
from lucenenet_spark.search.parser import parse_query  # noqa: F401
from lucenenet_spark.search.collectors import SortField  # noqa: F401
from lucenenet_spark.search.multifield import MultiFieldSearcher  # noqa: F401
from lucenenet_spark.search.join import join_query, to_parent_join  # noqa: F401
