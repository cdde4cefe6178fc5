"""Driver-contract guards for __spark_entry__.py — regressions here cost a
whole round (round-1 lessons encoded as tests):

1. every queries() entry has an oracle_sql() twin (the driver marks
   oracle-less entries as errors, not rows-only);
2. no query output contains an array/map/struct column (the driver's row
   canonicalizer sorts rows by all columns and dies on unsortable lists);
3. oracle result dtype KINDS match the Spark schema per column — catches
   the HUGEINT trap (a bare DuckDB sum() lands in pandas as float64 while
   Spark returns int64) and any other engine dtype divergence.
"""

from pyspark.sql import types as T

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    q, o = set(entry.queries()), set(entry.oracle_sql())
    assert q == o, f"missing oracles: {sorted(q - o)}; orphan oracles: {sorted(o - q)}"


def test_query_outputs_are_scalar_only(spark):
    bad = {}
    for name, fn in entry.queries().items():
        schema = fn(spark, SF).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"unsortable (non-scalar) output columns: {bad}"


def _spark_kind(dt: T.DataType) -> str:
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return "float"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        return "datetime"
    return "object"


def _pandas_kind(dtype) -> str:
    k = str(dtype).lower()
    for fam in ("int", "float", "bool", "datetime"):
        if fam in k:
            return fam
    return "object"


def test_oracle_dtypes_match_spark_schema(spark):
    """Run every oracle on DuckDB at sf0.001 and require per-column dtype
    KIND equality with the Spark query schema. A bare DuckDB sum() fails
    here as int-vs-float (HUGEINT -> pandas float64)."""
    import os

    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = {}
    for name, sql in oracles.items():
        spark_kinds = {f.name: _spark_kind(f.dataType) for f in qs[name](spark, SF).schema.fields}
        duck = con.sql(sql).df()
        duck_kinds = {c: _pandas_kind(duck[c].dtype) for c in duck.columns}
        if spark_kinds != duck_kinds:
            bad[name] = {
                c: (spark_kinds.get(c), duck_kinds.get(c))
                for c in set(spark_kinds) | set(duck_kinds)
                if spark_kinds.get(c) != duck_kinds.get(c)
            }
    assert not bad, f"oracle dtype-kind mismatches (spark, duckdb): {bad}"


def test_scenario_rebuild_is_deterministic(spark):
    """r7: the scenario result cache is REMOVED (results must be computed
    from the parquet inputs on every invocation). Pin what that requires:
    two independent invocations replay the full build + CDC epoch +
    incremental maintenance and land on identical rows and dtypes."""
    import __spark_entry__ as entry

    fn = entry.queries()["doc_vocab_ivm"]
    first = fn(spark, SF)
    first_rows = {tuple(r) for r in first.collect()}
    second = fn(spark, SF)
    assert {tuple(r) for r in second.collect()} == first_rows
    assert dict(second.dtypes) == dict(first.dtypes)
