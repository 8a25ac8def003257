from lucenenet_spark.index.builder import CorpusSpec, InvertedIndex, build_index  # noqa: F401
from lucenenet_spark.index.multifield import MultiFieldIndex, build_multi_field_index  # noqa: F401
