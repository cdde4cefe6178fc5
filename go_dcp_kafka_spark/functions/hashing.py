"""Deterministic, oracle-portable hashing.

Every hash here is defined so the EXACT same value is computable in both
Spark SQL and DuckDB SQL (the driver's correctness oracle):

    Spark :  CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)
    DuckDB:  CAST(CONCAT('0x', substring(md5(s), 1, 15)) AS BIGINT)

15 hex chars = 60 bits < 2^63, so the value is identical signed int64 in
both engines. ``h31`` reduces to 31 bits so products with 31-bit multipliers
stay inside int64 (no overflow divergence between engines) — used by
minhash permutations and simhash bit derivation.

Spark-side engine-internal hashing (bucketing, salting) uses xxhash64 —
faster, but NOT oracle-portable; never exposed in query results.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Mersenne-ish prime > 2^31 for permutation hashing (fits comfortably in
#: int64 products with 31-bit operands).
MINHASH_PRIME = 2147483647  # 2^31 - 1


def md5_hash60(col: Column) -> Column:
    """60-bit deterministic hash of a string column (oracle-portable)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_hash60_sql(expr: str) -> str:
    """DuckDB twin of md5_hash60."""
    return f"CAST(CONCAT('0x', substring(md5({expr}), 1, 15)) AS BIGINT)"


def h31(col: Column) -> Column:
    """31-bit hash: md5_hash60 % (2^31-1)."""
    return md5_hash60(col) % F.lit(MINHASH_PRIME)


def h31_sql(expr: str) -> str:
    return f"({md5_hash60_sql(expr)} % {MINHASH_PRIME})"


def perm_hash(h: Column, a: int, b: int) -> Column:
    """Universal-hash permutation (a*h + b) mod p with 31-bit a, b —
    products stay < 2^62, identical in any int64 engine."""
    return (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)


def perm_params(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs via splitmix-style integer mixing — no RNG
    state, reproducible everywhere (including SQL if ever needed)."""
    out = []
    x = seed & 0x7FFFFFFF
    for _ in range(k):
        x = (x * 1103515245 + 12345) % MINHASH_PRIME
        a = x or 1
        x = (x * 1103515245 + 12345) % MINHASH_PRIME
        b = x
        out.append((a, b))
    return out
