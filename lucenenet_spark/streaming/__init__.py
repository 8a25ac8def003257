from lucenenet_spark.streaming.ingest import (
    append_batch,
    apply_tombstones,
    delete_docs,
    load_live,
    stream_index,
)

__all__ = [
    "append_batch",
    "apply_tombstones",
    "delete_docs",
    "load_live",
    "stream_index",
]
