from lucenenet_spark.analysis.analyzer import (  # noqa: F401
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
    analyze,
    analyze_series,
    duckdb_token_sql,
)
