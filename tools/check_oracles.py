"""Local mimic of the driver's CORRECTNESS check: run every queries() entry
on Spark and its oracle_sql() twin on DuckDB at the given SF, compare row
count + sorted-column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    # Strict mimic of the driver's hash: no int/decimal coercion. A DuckDB
    # HUGEINT landing as float64 vs Spark's int64 MUST fail here, because it
    # fails the driver's value hash (round-1 lesson: sum(BIGINT) -> HUGEINT).
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def dtype_kind(s: pd.Series) -> str:
    k = str(s.dtype).lower()
    for fam in ("int", "float", "bool", "datetime"):
        if fam in k:
            return fam
    return "object"


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from go_dcp_kafka_spark.session import get_spark

    spark = get_spark("oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, os_ = entry.queries(), entry.oracle_sql()
    failed = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            spark_pd = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"✗ {name}: SPARK ERROR {type(e).__name__}: {str(e)[:300]}")
            failed.append(name)
            continue
        if name not in os_:
            print(f"• {name}: rows-only ({len(spark_pd)} rows)")
            continue
        try:
            duck_pd = con.sql(os_[name]).df()
        except Exception as e:
            print(f"✗ {name}: DUCKDB ERROR {str(e)[:300]}")
            failed.append(name)
            continue
        a, b = canon(spark_pd), canon(duck_pd)
        if list(a.columns) != list(b.columns):
            print(f"✗ {name}: schema {list(a.columns)} vs {list(b.columns)}")
            failed.append(name)
            continue
        if len(a) != len(b):
            print(f"✗ {name}: rows {len(a)} vs {len(b)}")
            failed.append(name)
            continue
        kinds_a = {c: dtype_kind(a[c]) for c in a.columns}
        kinds_b = {c: dtype_kind(b[c]) for c in b.columns}
        if kinds_a != kinds_b:
            diff = {c: (kinds_a[c], kinds_b[c]) for c in a.columns if kinds_a[c] != kinds_b[c]}
            print(f"✗ {name}: dtype kinds differ (spark, duckdb): {diff}")
            failed.append(name)
            continue
        ok = True
        for c in a.columns:
            if str(a[c].dtype).startswith("float"):
                m = ~(np.isclose(a[c], b[c], atol=2e-6, equal_nan=True))
            else:
                m = a[c].ne(b[c]) & ~(a[c].isna() & b[c].isna())
            if m.any():
                i = int(np.argmax(m.to_numpy()))
                print(f"✗ {name}: col {c}: {int(m.sum())}/{len(a)} differ; e.g. row {i}: {a[c].iloc[i]!r} vs {b[c].iloc[i]!r}")
                ok = False
        if ok:
            print(f"✓ {name}: {len(a)} rows match")
        else:
            failed.append(name)
    print(f"\n{'FAILED: ' + ', '.join(failed) if failed else 'ALL MATCH'}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
