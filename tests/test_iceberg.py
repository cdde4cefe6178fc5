"""The Iceberg execution path (SURVEY §7 TableFormat): no Iceberg jars exist
in this sandbox, so the cluster-mode MERGE is pinned two ways —

1. a GOLDEN test of ``iceberg_merge_sql``: the mutation/deletion/insert arms
   must stay in sync with SnapshotTable.merge's semantics (full-document
   replacement, tombstones delete, unmatched mutations insert);
2. an integration test that runs the REAL ``MERGE INTO`` when an Iceberg
   runtime is present and skips cleanly when it is not.
"""

import re

import pytest

from go_dcp_kafka_spark.table.snapshot import iceberg_merge_sql


def _norm(sql: str) -> str:
    return re.sub(r"\s+", " ", sql).strip()


GOLDEN = _norm("""
    MERGE INTO cat.db.transcripts t USING updates s
    ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
    WHEN MATCHED AND s.op = 'mutation' THEN UPDATE SET
        t.role = s.role, t.text = s.text, t.tool = s.tool, t.ts = s.ts
    WHEN MATCHED AND s.op != 'mutation' THEN DELETE
    WHEN NOT MATCHED AND s.op = 'mutation' THEN INSERT
        (conv_id, turn_idx, role, text, tool, ts)
        VALUES (s.conv_id, s.turn_idx, s.role, s.text, s.tool, s.ts)
""")


def test_iceberg_merge_sql_golden():
    got = iceberg_merge_sql(
        "cat.db.transcripts",
        "updates",
        key_cols=("conv_id", "turn_idx"),
        payload_cols=("role", "text", "tool", "ts"),
    )
    assert _norm(got) == GOLDEN


def test_iceberg_merge_sql_arms_cover_cdc_semantics():
    """Structural invariants that must hold for ANY key/payload set: every
    op arm present, every payload column SET and INSERTed, keys joined."""
    sql = iceberg_merge_sql("t", "s", ("k1", "k2"), ("p1", "p2"))
    n = _norm(sql)
    assert "WHEN MATCHED AND s.op = 'mutation' THEN UPDATE SET" in n
    assert "WHEN MATCHED AND s.op != 'mutation' THEN DELETE" in n
    assert "WHEN NOT MATCHED AND s.op = 'mutation' THEN INSERT" in n
    assert "t.k1 = s.k1 AND t.k2 = s.k2" in n
    assert "t.p1 = s.p1, t.p2 = s.p2" in n
    assert "(k1, k2, p1, p2) VALUES (s.k1, s.k2, s.p1, s.p2)" in n
    # tombstones must NOT insert (a deletion of an absent key is a no-op)
    assert "WHEN NOT MATCHED AND s.op != 'mutation'" not in n


def _iceberg_available(spark) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def test_iceberg_merge_integration(spark, tmp_path):
    """Runs the generated MERGE against a real Iceberg table when the
    runtime jar is on the classpath; otherwise skips (sandbox has no jars).
    On a cluster this is the 'same planner code' proof for the COW/MOR
    fallback's semantics."""
    if not _iceberg_available(spark):
        pytest.skip("no iceberg-spark-runtime on the classpath")
    spark.conf.set("spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "wh"))
    spark.sql("CREATE TABLE it.db.t (k INT, v STRING) USING iceberg")
    spark.sql("INSERT INTO it.db.t VALUES (1, 'a'), (2, 'b')")
    src = spark.createDataFrame(
        [(1, "A", "mutation"), (2, None, "deletion"), (3, "c", "mutation")],
        ["k", "v", "op"],
    )
    src.createOrReplaceTempView("updates")
    spark.sql(iceberg_merge_sql("it.db.t", "updates", ("k",), ("v",)))
    got = {r["k"]: r["v"] for r in spark.sql("SELECT * FROM it.db.t").collect()}
    assert got == {1: "A", 3: "c"}
