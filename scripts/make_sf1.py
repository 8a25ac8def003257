"""Synthesize an sf1-scale testdata directory (one decade past the
largest driver-generated scale) for the round-5 soak.

The driver ships sf{0.001,0.01,0.1}; the r4 verdict asked for an sf1
soak.  This script deterministically expands the two tables the engine
actually indexes — `documents` (5 000 -> 50 000 rows) and `embeddings`
(2 000 -> 20 000 rows) — by a 10x replica rule (replica k shifts the id
by k*1_000_000; k>0 appends a single distinguishing token to `text`
and nudges `embedding[0]` so vectors aren't bit-equal).  Everything is
baked into the parquet once, so the Spark queries and their DuckDB
oracles read byte-identical inputs — the correctness comparison is as
exact at sf1 as at the driver scales.  The remaining TPC-H-ish tables
are copied unscaled from sf0.1 (view registration only; no sampled
soak entry reads them).

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/lucenenet_bench/sf1)
"""

from __future__ import annotations

import os
import shutil
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
SHIFT = 1_000_000


def expand_documents(out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/documents.parquet")
    doc_id = t.column("doc_id").to_numpy()
    text = t.column("text").to_pylist()
    lang = t.column("lang")
    source = t.column("source")

    ids, texts, langs, sources = [], [], [], []
    for k in range(REPLICAS):
        ids.append(doc_id + k * SHIFT)
        if k == 0:
            texts.extend(text)
        else:
            texts.extend([f"{s} rep{k}" for s in text])
        langs.append(lang)
        sources.append(source)

    out = pa.table(
        {
            "doc_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.concat_arrays([c.combine_chunks() for c in langs]),
            "source": pa.concat_arrays([c.combine_chunks() for c in sources]),
            "n_chars": pa.array([len(s) for s in texts], type=pa.int64()),
        }
    )
    pq.write_table(out, f"{out_dir}/documents.parquet")
    return out.num_rows


def expand_embeddings(out_dir: str) -> int:
    t = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = t.column("vec_id").to_numpy()
    emb = t.column("embedding").to_pylist()
    label = t.column("label")

    ids, vecs, labels = [], [], []
    for k in range(REPLICAS):
        ids.append(vec_id + k * SHIFT)
        if k == 0:
            vecs.extend(emb)
        else:
            # nudge one component so replicas aren't bit-equal vectors;
            # float32-round once here so Spark and DuckDB read the same bits
            for v in emb:
                w = list(v)
                w[0] = float(np.float32(w[0]) + np.float32(k) * np.float32(1e-3))
                vecs.append(w)
        labels.append(label)

    out = pa.table(
        {
            "vec_id": pa.array(np.concatenate(ids), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.concat_arrays([c.combine_chunks() for c in labels]),
        }
    )
    pq.write_table(out, f"{out_dir}/embeddings.parquet")
    return out.num_rows


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/lucenenet_bench/sf1"
    os.makedirs(out_dir, exist_ok=True)
    n_docs = expand_documents(out_dir)
    n_vecs = expand_embeddings(out_dir)
    for name in (
        "region nation customer supplier part orders lineitem events".split()
    ):
        shutil.copy(f"{SRC}/{name}.parquet", f"{out_dir}/{name}.parquet")
    print(f"sf1 at {out_dir}: documents={n_docs} embeddings={n_vecs} (10x sf0.1)")


if __name__ == "__main__":
    main()
