"""Faceting demo (Demo/Facet subfolder role).

Reference: ``src/Lucene.Net.Demo/Facet/SimpleFacetsExample.cs``
(counts per dimension + drill-down + drill-sideways),
``RangeFacetsExample.cs`` (numeric range buckets) — the same
search-then-facet flows over this engine's collectors:

    python examples/facets_demo.py [sf_dir]

Indexes the testdata documents table (default
``$SPARK_GRAFT_SF_DIR`` or sf0.001), runs one query, and prints:

1. facet counts per ``lang`` and per ``source`` among the matches
   (SimpleFacetsExample's "FacetResult per dimension");
2. drill-down to one lang + the drill-sideways table showing what
   each dimension's counts would be if that selection changed;
3. doc-length range buckets (RangeFacetsExample with field_length
   standing in for the timestamp field).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(sf_dir: str | None = None) -> int:
    from lucenenet_spark import get_spark
    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search import IndexSearcher, parse_query
    from lucenenet_spark.search import collectors as coll

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001"
    )
    spark = get_spark(master=os.environ.get("SPARK_GRAFT_MASTER", "local[*]"))
    docs = spark.read.parquet(f"{sf_dir.rstrip('/')}/documents.parquet")
    idx = build_index(
        spark, docs,
        CorpusSpec(text_col="text", id_col="doc_id",
                   meta_cols=("lang", "source")),
    ).cache()
    s = IndexSearcher(idx)
    q = parse_query("spark OR index")

    print("== facet counts among matches ==")
    for dim in ("lang", "source"):
        print(f"-- {dim} --")
        for r in coll.facet_counts(s, q, dim, top_n=5).collect():
            print(f"  {r[dim]}: {r['n_docs']}")

    print("== drill-down lang=en, sideways on both dims ==")
    for r in coll.drill_sideways(s, q, {"lang": "en"}).collect():
        print(f"  {r['dim']}={r['value']}: {r['n_docs']}")

    print("== doc-length range facets ==")
    ranges = [("short", 0, 30), ("medium", 30, 60), ("long", 60, 10_000)]
    for r in coll.facet_ranges(s, q, "field_length", ranges).collect():
        print(f"  {r['label']}: {r['n_docs']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1 else None))
