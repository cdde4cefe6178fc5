"""Event-time windowed aggregation: watermark semantics (late-data drop,
bounded state) and session-window merging, streaming AND batch."""

import datetime as dt
import os

import pandas as pd
import pytest

from go_dcp_kafka_spark.streaming.windows import (
    session_window_counts,
    windowed_event_counts,
)

T0 = dt.datetime(2024, 1, 1, 10, 0, 0)


def _write_batch(path: str, rows, mtime: int) -> None:
    df = pd.DataFrame(rows, columns=["user_id", "partition_id", "ts"])
    df["user_id"] = df["user_id"].astype("int64")
    df["partition_id"] = df["partition_id"].astype("int32")
    df["ts"] = df["ts"].astype("datetime64[us]")
    df.to_parquet(path, index=False)
    os.utime(path, (mtime, mtime))


def _stream(spark, src):
    return (
        spark.readStream.schema("user_id long, partition_id int, ts timestamp_ntz")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _run_to_memory(df, name, ckpt, mode="update"):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_watermark_drops_late_rows_and_bounds_state(spark, tmp_path):
    """File 1 carries events in the 10:00 window plus one at 11:00, which
    advances the watermark to 10:50 — far past that window's end. Once the
    advanced watermark has propagated (Spark filters late rows with the
    PREVIOUS batch's watermark — SPARK-40925 two-value semantics, hence the
    spacer batch), a replayed 10:02 event must be DROPPED: the 10:00
    window's count stays 2 in every update, while on-time rows keep
    landing. This is the state-eviction contract that keeps streaming
    aggregation bounded at 10^10 events."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = dt.timedelta(minutes=1)
    _write_batch(
        os.path.join(src, "b0.parquet"),
        [(1, 0, T0), (1, 0, T0 + 2 * m), (1, 0, T0 + 60 * m)],
        1_700_000_000,
    )
    _write_batch(  # spacer: lets the advanced watermark become active
        os.path.join(src, "b1.parquet"), [(1, 0, T0 + 65 * m)], 1_700_000_010
    )
    _write_batch(
        os.path.join(src, "b2.parquet"),
        [(1, 0, T0 + 2 * m), (1, 0, T0 + 68 * m)],  # late replay + fresh
        1_700_000_020,
    )
    counts = windowed_event_counts(
        _stream(spark, src), window_duration="10 minutes", watermark_delay="10 minutes"
    )
    _run_to_memory(counts, "win_counts", str(tmp_path / "ck"))
    out = spark.table("win_counts").toPandas()
    w0 = out[out["window_start"] == T0]
    # the late replay never bumped the closed window: max observed count is 2
    assert not w0.empty and int(w0["n_events"].max()) == 2
    # the fresh on-time rows all landed in the open 11:00 window
    w11 = out[out["window_start"] == T0 + 60 * m]
    assert int(w11["n_events"].max()) == 3


def test_session_window_merges_and_closes(spark, tmp_path):
    """Two events 5 min apart merge into ONE session (gap 30 min); an event
    2 h later opens a NEW session and the watermark closes the first."""
    src = str(tmp_path / "src")
    os.makedirs(src)
    m = dt.timedelta(minutes=1)
    _write_batch(
        os.path.join(src, "b0.parquet"),
        [(7, 0, T0), (7, 0, T0 + 5 * m)],
        1_700_000_000,
    )
    _write_batch(os.path.join(src, "b1.parquet"), [(7, 0, T0 + 120 * m)], 1_700_000_010)
    sess = session_window_counts(
        _stream(spark, src), gap="30 minutes", watermark_delay="10 minutes"
    )
    # append mode: only CLOSED sessions emit — exactly the first one
    _run_to_memory(sess, "sess_counts", str(tmp_path / "ck"), mode="append")
    out = spark.table("sess_counts").toPandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 2
    assert r["session_start"] == T0
    # session end = last event + gap (session_window semantics)
    assert r["session_end"] == T0 + 35 * m


def test_windowed_counts_batch_equals_manual(spark):
    """Batch mode: the same operator over a static frame equals a manual
    floor-to-bucket aggregation (the DuckDB-oracle semantics)."""
    import pyspark.sql.functions as F

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = windowed_event_counts(
        events, window_duration="1 hour", key_col="event_type", ts_col="ts"
    )
    manual = (
        events.groupBy(
            F.timestamp_seconds(
                (F.unix_timestamp("ts") - F.unix_timestamp("ts") % 3600)
            ).alias("bucket"),
            "event_type",
        )
        .agg(F.count("*").alias("n"))
    )
    j = got.join(
        manual,
        (got["window_start"].cast("timestamp") == manual["bucket"])
        & (got["event_type"] == manual["event_type"]),
    )
    assert j.count() == got.count() == manual.count()
    assert j.filter(F.col("n_events") != F.col("n")).count() == 0
