"""Driver-mimic: run every __spark_entry__ query against its DuckDB
oracle at a given sf and compare row count, schema-ish dtypes, and
exact values (columns sorted by name, rows sorted) — a local preview
of CORRECTNESS_r{N}.json.

Usage: python scripts/validate_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import duckdb
import numpy as np
import pandas as pd

import __spark_entry__ as entry_mod
from lucenenet_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def compare(spark_df, duck_df, name: str) -> list[str]:
    problems = []
    s = spark_df.toPandas()
    d = duck_df
    if len(s) != len(d):
        problems.append(f"row count: spark={len(s)} duck={len(d)}")
    scols, dcols = sorted(s.columns), sorted(d.columns)
    if scols != dcols:
        problems.append(f"columns: spark={scols} duck={dcols}")
        return problems
    s = s[scols].sort_values(scols).reset_index(drop=True)
    d = d[dcols].sort_values(dcols).reset_index(drop=True)
    if len(s) == len(d):
        for c in scols:
            sv, dv = s[c].to_numpy(), d[c].to_numpy()
            if np.issubdtype(sv.dtype, np.floating) or np.issubdtype(dv.dtype, np.floating):
                eq = np.array_equal(
                    sv.astype(np.float64), dv.astype(np.float64), equal_nan=True
                )
            else:
                eq = list(sv) == list(dv)
            if not eq:
                bad = [
                    (i, sv[i], dv[i])
                    for i in range(len(sv))
                    if not (sv[i] == dv[i] or (pd.isna(sv[i]) and pd.isna(dv[i])))
                ][:5]
                problems.append(f"col {c}: {len(bad)}+ diffs, first {bad}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in os_:
            n = sdf.count()
            print(f"PASS {name}: rows-only check ({n} rows, no oracle)")
            continue
        try:
            ddf = con.execute(os_[name]).df()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            failures += 1
            continue
        problems = compare(sdf, ddf, name)
        if problems:
            failures += 1
            print(f"FAIL {name}:")
            for p in problems:
                print(f"  - {p}")
        else:
            print(f"PASS {name} ({len(ddf)} rows)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
