from lucenenet_spark.index.builder import CorpusSpec, InvertedIndex, build_index  # noqa: F401
