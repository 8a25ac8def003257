"""Cross-engine deterministic hashing primitives.

Every dedup/fingerprint operator needs hash values that are exactly
reproducible by the DuckDB SQL oracle. Engine-native hashes differ
(Spark xxhash64 ≠ DuckDB hash), so everything here is built on the
**md5-prefix integer**: ``int(md5(s).hex()[:15], 16)`` — 60 bits,
non-negative, computable in Spark as
``conv(substring(md5(s),1,15),16,10)`` and in DuckDB as
``CAST('0x' || substring(md5(s),1,15) AS BIGINT)``, verified equal.

MinHash permutations are the classic universal-hash family
``h_i(x) = (a_i * x + b_i) mod p`` with ``p = 2^31 - 1`` and seeded
(a, b) constants, applied to ``base mod p``: all products stay below
2^62, so int64 arithmetic is exact (no overflow, no float drift) in
both engines.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_31 = (1 << 31) - 1


def md5_prefix_int(s: str) -> int:
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def md5_prefix_int_col(col: Column) -> Column:
    """Spark column: md5-prefix integer of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_prefix_int_sql(expr: str) -> str:
    """DuckDB expression computing the identical integer."""
    return f"CAST('0x' || substring(md5({expr}), 1, 15) AS BIGINT)"


def minhash_coeffs(n_hashes: int, seed: int = 42) -> list[tuple[int, int]]:
    """Seeded (a, b) pairs for the universal-hash family, identical
    constants inlined into Spark closures and oracle SQL."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=n_hashes, dtype=np.int64)
    b = rng.integers(0, MERSENNE_31, size=n_hashes, dtype=np.int64)
    return [(int(x), int(y)) for x, y in zip(a, b)]


def permute_col(base_mod_p: Column, a: int, b: int) -> Column:
    """Spark: (a * base + b) mod p on a base already reduced mod p."""
    return (F.lit(a) * base_mod_p + F.lit(b)) % F.lit(MERSENNE_31)


def permute_sql(base_expr: str, a: int, b: int) -> str:
    return f"(({a} * {base_expr} + {b}) % {MERSENNE_31})"
