"""Multi-field indexing — the FieldInfos / per-field inverted-index
model (reference ``src/Lucene.Net/Index/FieldInfos.cs``,
``Document/Field.cs``): a document carries several indexed fields
(title, body, path, …), each with its OWN postings, norms (per-field
length), and statistics (df, ttf, avgdl per field) — BM25 scores a
term against the field it was searched in, exactly as the reference
keeps Terms/Norms per field name.

Spark shape: docids are pinned ONCE on the corpus, then each field is
an :class:`InvertedIndex` built over the same docid column (the
builder's fused one-scan pipeline per field; fields are few, and each
build scans only its text column thanks to parquet column pruning).
Cross-field queries union per-field scored frames on docid and fold
with the shared boolean/dismax combiners (search/multifield.py).

Persisted layout: ``path/fields/<name>/…`` (each field a standard
index warehouse) + ``path/fieldinfos.json``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from lucenenet_spark.index.builder import (
    CorpusSpec,
    InvertedIndex,
    assign_docids,
    build_index,
)


@dataclass
class MultiFieldIndex:
    fields: dict[str, InvertedIndex]
    field_order: tuple[str, ...]
    default_field: str

    def __getitem__(self, field: str) -> InvertedIndex:
        return self.fields[field]

    def cache(self) -> "MultiFieldIndex":
        for idx in self.fields.values():
            idx.cache()
        return self

    def unpersist(self) -> "MultiFieldIndex":
        for idx in self.fields.values():
            idx.unpersist()
        return self

    def save(self, path: str) -> None:
        for name, idx in self.fields.items():
            idx.save(os.path.join(path, "fields", name))
        info = {
            "field_order": list(self.field_order),
            "default_field": self.default_field,
        }
        with open(os.path.join(path, "fieldinfos.json"), "w") as f:
            json.dump(info, f)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "MultiFieldIndex":
        with open(os.path.join(path, "fieldinfos.json")) as f:
            info = json.load(f)
        fields = {
            name: InvertedIndex.load(spark, os.path.join(path, "fields", name))
            for name in info["field_order"]
        }
        return cls(
            fields=fields,
            field_order=tuple(info["field_order"]),
            default_field=info["default_field"],
        )


def build_multi_field_index(
    spark: SparkSession,
    corpus: DataFrame,
    field_cols: dict[str, str],
    spec: CorpusSpec | None = None,
    default_field: str | None = None,
) -> MultiFieldIndex:
    """Build one inverted index per field over a SHARED docid space.

    ``field_cols``: field name -> corpus text column. docids are
    assigned once from ``spec`` (id_col or pinned total order) so every
    field's postings reference the same documents; per-field builds
    then run with ``id_col='docid'`` (no re-ordering, no second docid
    shuffle)."""
    spec = spec or CorpusSpec()
    with_ids = assign_docids(corpus, spec)
    order = tuple(field_cols)
    fields: dict[str, InvertedIndex] = {}
    for name in order:
        fspec = CorpusSpec(
            text_col=field_cols[name], id_col="docid", meta_cols=spec.meta_cols,
            stem=spec.stem, cjk=spec.cjk,
        )
        fields[name] = build_index(spark, with_ids, fspec)
    return MultiFieldIndex(
        fields=fields,
        field_order=order,
        default_field=default_field or order[0],
    )
