"""lucenenet_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch, Spark-first rebuild of the query and data-processing
semantics of Lucene.NET 4.8 (reference: Jeevananthan-23/lucenenet).
NOT a port: indexing is a DataFrame pipeline (tokenize via Arrow UDFs,
hash-aggregate posting construction, parquet posting tables), search is
a declarative plan (broadcast stats, filter-pushdown term lookup,
TakeOrderedAndProject top-k), with float32 BM25 scoring bit-faithful to
``Search/Similarities/BM25Similarity.cs``.
"""

__version__ = "0.1.0"

from lucenenet_spark.session import get_spark  # noqa: F401
from lucenenet_spark.functions.similarity import (  # noqa: F401
    BM25Similarity,
    ClassicSimilarity,
)
