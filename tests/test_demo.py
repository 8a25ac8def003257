"""Demo subproject role (examples/demo.py — IndexFiles.cs /
SearchFiles.cs) + the builder nullable-meta regression it surfaced.
"""

from __future__ import annotations

import os

import pytest


@pytest.fixture()
def source_tree(tmp_path):
    src = tmp_path / "src"
    (src / "sub").mkdir(parents=True)
    (src / "a.txt").write_text("spark builds the inverted index")
    (src / "sub" / "b.txt").write_text(
        "the index merges segments with hash tables"
    )
    (src / "c.txt").write_text("unrelated words only here")
    return str(src)


def test_demo_index_update_search(spark, tmp_path, source_tree, capsys):
    import examples.demo as demo

    idx_dir = str(tmp_path / "idx")
    assert demo.cmd_index(idx_dir, source_tree) == 0
    out = capsys.readouterr().out
    assert "3 docs" in out

    # refusing to clobber without --update (IndexFiles.cs -u contract)
    assert demo.cmd_index(idx_dir, source_tree) == 2

    assert demo.cmd_search(idx_dir, "index AND hash") == 0
    out = capsys.readouterr().out
    assert "1 total matching documents" in out
    assert "b.txt" in out

    # --update appends a new shard; search spans both shards
    src2 = tmp_path / "src2"
    src2.mkdir()
    (src2 / "d.txt").write_text("a fresh document about hash indexes")
    assert demo.cmd_index(idx_dir, str(src2), update=True) == 0
    assert demo.cmd_search(idx_dir, "hash") == 0
    out = capsys.readouterr().out
    assert "2 total matching documents" in out
    assert "d.txt" in out and "b.txt" in out


def test_facets_demo_runs(spark, capsys):
    """Demo/Facet role (examples/facets_demo.py): the three example
    flows (per-dim counts, drill-sideways, range buckets) run end to
    end on the sf0.001 table and print non-empty tables."""
    if not os.path.exists("/root/testdata/sf0.001/documents.parquet"):
        pytest.skip("testdata not present")
    import examples.facets_demo as fd

    assert fd.main("/root/testdata/sf0.001") == 0
    out = capsys.readouterr().out
    assert "facet counts among matches" in out
    assert "en: " in out            # lang facet has the en bucket
    assert "__hits__" in out        # drill-sideways hit-count row
    assert "medium: " in out        # range facet bucket


def test_builder_accepts_non_nullable_meta(spark):
    """Regression: posting rows carry NULL meta, so a NON-nullable
    source meta column (e.g. the _metadata.file_path metadata column)
    must be widened to nullable in the fused segment schema — it NPE'd
    in the JVM cache serializer before the fix."""
    from pyspark.sql import functions as F

    from lucenenet_spark.index import CorpusSpec, build_index
    from lucenenet_spark.search.queries import TermQuery
    from lucenenet_spark.search.searcher import IndexSearcher

    docs = spark.createDataFrame(
        [(0, "spark merges tables"), (1, "hash tables everywhere")],
        "doc_id long, text string",
    ).withColumn("tag", F.lit("t"))  # literal -> non-nullable
    assert not docs.schema["tag"].nullable
    idx = build_index(
        spark, docs,
        CorpusSpec(text_col="text", id_col="doc_id", meta_cols=("tag",)),
    ).cache()
    s = IndexSearcher(idx)
    assert {h.docid for h in s.search(TermQuery(term="tables"), 5)} == {0, 1}
    tags = {r["docid"]: r["tag"] for r in idx.docs.collect()}
    assert tags == {0: "t", 1: "t"}
