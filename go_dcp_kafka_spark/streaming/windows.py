"""Event-time windowed aggregation with watermarks — the late-data surface.

The reference never aggregates on event time (DCP delivers in seqno order
per vbucket, so its 'windows' are seqno ranges); a Spark-native engine gets
event-time windows for free and SHOULD expose them: per-window event rates
and session windows are the standard monitoring/analytics companions to a
CDC ingest (events/sec per partition, conversation activity bursts).

Both operators work in BATCH and STREAMING:

- batch: ``withWatermark`` is a no-op; the aggregation is an ordinary
  groupBy over ``F.window`` / ``F.session_window`` — one shuffle keyed on
  (window, key) with map-side partial aggregation.
- streaming: the watermark BOUNDS STATE — Spark evicts window state once
  the watermark (max event time - delay) passes the window end, and drops
  later-arriving rows for those windows. Without it, a 10^10-event stream
  accumulates state forever. That eviction-over-correctness trade is the
  documented contract of event-time processing (late rows beyond the delay
  are dropped, tested in tests/test_windows.py).

Scale shape: state size ∝ open windows × keys (bounded by the watermark
delay), never ∝ stream length; the shuffle is hash(window, key) — skew
follows hot keys exactly like the merge path and salts the same way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _as_event_time(events: DataFrame, ts_col: str) -> DataFrame:
    """Watermarks require TIMESTAMP (an instant); parquet written by pandas
    reads back as TIMESTAMP_NTZ. The engine pins the session zone to UTC
    (session.py), so the cast is face-value-preserving — document the
    constraint once here instead of failing at every call site."""
    if isinstance(events.schema[ts_col].dataType, T.TimestampNTZType):
        events = events.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return events


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "10 minutes",
    slide: str | None = None,
    watermark_delay: str = "30 minutes",
    key_col: str = "partition_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling (or sliding) per-key event counts on event time.

    Returns (window_start, window_end, <key>, n_events). Windows align to
    the epoch (Spark's ``F.window`` origin), matching DuckDB's
    ``time_bucket`` for divisor-of-a-day durations — oracle-portable."""
    win: Column = (
        F.window(F.col(ts_col), window_duration, slide)
        if slide
        else F.window(F.col(ts_col), window_duration)
    )
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n_events",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark_delay: str = "30 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of ``operators.sessionize``: dynamic-gap session
    windows via ``F.session_window``. Spark merges adjacent per-key events
    into one growing window and CLOSES it (emits + evicts state) when the
    watermark passes last-event-time + gap — the stateful counterpart of
    the batch lag/cumsum formulation, with the same gap semantics."""
    return (
        _as_event_time(events, ts_col)
        .withWatermark(ts_col, watermark_delay)
        .groupBy(F.session_window(F.col(ts_col), gap).alias("sess"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            key_col,
            "n_events",
        )
    )
