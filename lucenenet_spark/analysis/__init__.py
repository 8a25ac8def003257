from lucenenet_spark.analysis.analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
    UAX29_TOKEN_PATTERN,
    analyze,
    analyze_series,
    analyze_uax29,
    duckdb_token_sql,
)
from lucenenet_spark.analysis.chinese import analyze_zh, segment_zh  # noqa: F401
from lucenenet_spark.analysis.japanese import analyze_ja, segment_ja  # noqa: F401
from lucenenet_spark.analysis.opennlp_role import (  # noqa: F401
    make_opennlp_analyzer,
    opennlp_tokens,
    split_sentences,
)
from lucenenet_spark.analysis.polish import analyze_pl, stem_pl  # noqa: F401
