"""M5: mapper surface, normalization, routing, dead-letter, discard-ack."""

import glob
import os

import pandas as pd
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.mapper import (
    compose,
    default_mapper,
    filter_mapper,
    log_style_mapper,
    route_mapper,
)
from go_dcp_kafka_spark.functions.normalize import normalize_text_col, normalize_text_pandas
from go_dcp_kafka_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
from go_dcp_kafka_spark.streaming.runner import CdcPipeline
from go_dcp_kafka_spark.table.snapshot import SnapshotTable


def test_normalize_col_and_pandas_agree(spark):
    df = spark.createDataFrame(
        [("  a   b\t c  ",), ("x",), (None,), ("  ",)], ["text"]
    )
    got = df.select(
        normalize_text_col("text").alias("a"),
        normalize_text_pandas(F.col("text")).alias("b"),
    ).collect()
    for r in got:
        assert r["a"] == r["b"]
    assert got[0]["a"] == "a b c"
    assert got[2]["a"] is None


def test_filter_mapper_discard_still_advances_checkpoint(spark, log_dir, tmp_path):
    """P3 semantics: a mapper that discards everything still advances the
    HWM checkpoint (ctx.Ack on empty mapper result, connector.go:98-101)."""
    pipe = CdcPipeline(
        spark, str(tmp_path / "t"), run_id="disc",
        mapper=filter_mapper(F.lit(False)),
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=4)
    assert pipe.read_table().count() == 0
    ck = pipe.checkpoints.load()
    assert len(ck) > 0 and (ck["hwm_seqno"] > 0).all()


def test_log_style_mapper_drops_tombstones(spark, log_dir, tmp_path):
    """DefaultMapper parity: deletions/expirations dropped -> deleted keys
    remain in the table (log-sink semantics, mapper.go:10-20)."""
    pipe_log = CdcPipeline(spark, str(tmp_path / "a"), run_id="l", mapper=log_style_mapper)
    pipe_log.run_stream(log_dir, str(tmp_path / "cka"), max_files_per_trigger=8)
    pipe_tbl = CdcPipeline(spark, str(tmp_path / "b"), run_id="t")
    pipe_tbl.run_stream(log_dir, str(tmp_path / "ckb"), max_files_per_trigger=8)
    assert pipe_log.read_table().count() > pipe_tbl.read_table().count()


def test_routing_and_dead_letter(spark, log_dir, tmp_path):
    """P4 + S7: route by role to two tables; unmapped roles dead-letter."""
    base = str(tmp_path / "t")
    tables = {
        "user_turns": SnapshotTable(spark, f"{base}/user_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
        "agent_turns": SnapshotTable(spark, f"{base}/agent_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
    }
    pipe = CdcPipeline(
        spark, base, tables=tables, run_id="route",
        mapper=compose(
            default_mapper,
            route_mapper({"user": "user_turns", "assistant": "agent_turns", "tool": "agent_turns"}),
        ),
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    u = pipe.read_table("user_turns").toPandas()
    a = pipe.read_table("agent_turns").toPandas()
    assert len(u) > 0 and len(a) > 0
    assert (u["role"] == "user").all()
    assert set(a["role"]) <= {"assistant", "tool"}
    # 'system' role had no mapping -> dead-lettered (reference panics here)
    rej_files = glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)
    assert rej_files, "no rejections written"
    rej = pd.concat([pd.read_parquet(f) for f in rej_files])
    assert (rej["error"] == "unknown routing target").any()


def test_validation_rejections(spark, log_dir, tmp_path):
    """Rows failing validation dead-letter; valid rows still merge
    (RejectionLog semantics, rejection_log_sink_response_handler.go:36-76)."""
    base = str(tmp_path / "t")
    pipe = CdcPipeline(
        spark, base, run_id="val",
        # text is null on tombstones by design (value=nil, event.go:24-56)
        validate=F.col("conv_id").isNotNull()
        & (F.col("text").isNull() | (F.length("text") < 10_000))
        & (F.col("turn_idx") < 50),
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    tbl = pipe.read_table().toPandas()
    assert (tbl["turn_idx"] < 50).all()
    rej_files = glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)
    rej = pd.concat([pd.read_parquet(f) for f in rej_files])
    assert (rej["turn_idx"] >= 50).all() and len(rej) > 0


def test_oversize_measures_whole_message(spark, log_dir, tmp_path):
    """The oversize guard sizes the SERIALIZED message (key + full payload),
    not just text — matching the reference's whole-Kafka-message semantics
    (producer_batch.go:196-207): a row blown up via `tool` dead-letters even
    when its text is tiny."""
    base = str(tmp_path / "t")
    big_tool = "x" * 5000
    pipe = CdcPipeline(
        spark, base, run_id="osz",
        # inflate the tool column on a deterministic subset; text untouched
        mapper=lambda df: df.withColumn(
            "tool", F.when(F.col("turn_idx") % 7 == 0, F.lit(big_tool)).otherwise(F.col("tool"))
        ),
        max_message_bytes=4000,
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    rej_files = glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)
    assert rej_files, "oversize-via-tool rows were not dead-lettered"
    rej = pd.concat([pd.read_parquet(f) for f in rej_files])
    over = rej[rej["error_class"] == "oversize"]
    assert len(over) > 0 and (over["turn_idx"] % 7 == 0).all()
    # surviving table rows never carry the oversized tool payload
    tbl = pipe.read_table().toPandas()
    assert not (tbl["tool"].fillna("").str.len() >= 5000).any()
