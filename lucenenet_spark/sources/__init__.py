from lucenenet_spark.sources.synthetic import CORPUS_SCHEMA, synthetic_corpus

__all__ = ["CORPUS_SCHEMA", "synthetic_corpus"]
