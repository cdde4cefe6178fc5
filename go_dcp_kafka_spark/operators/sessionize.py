"""Gap-based sessionization over an event stream.

The classic clickstream/transcript windowing operator: within each key
(user, conversation), consecutive events closer than ``gap_seconds`` belong
to one session; a larger gap starts the next.

Scale shape: every window is PARTITIONED by the key — one hash shuffle on
``key_col``, then per-key sorted scans in parallel. No global sort, no
single-partition window, no state beyond the shuffle. Skewed keys (one user
with 10^8 events) are bounded by per-key data volume exactly like the CDC
fold's conv_id grouping — AQE skew splitting applies to the exchange.

Time semantics are defined on FLOOR-OF-EPOCH-SECONDS (``unix_timestamp``)
so the operator is reproducible bit-for-bit in any engine with integer
epoch seconds (the DuckDB oracle uses ``floor(epoch(ts))``) — sub-second
jitter never flips a session boundary decision between engines.

Reference anchor: the reference groups DCP events per vbucket stream and
cuts batches on a time gap (ticker flush, producer_batch.go:54-75); this is
the analytical cousin over the keyed event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-event session assignment: adds ``session_idx`` (0-based per key,
    in (ts, order_col) order) to the input rows.

    ``order_col`` breaks timestamp ties deterministically; tied timestamps
    have gap 0 and therefore never open a session, so the assignment is
    order-stable even under ties."""
    sec = F.unix_timestamp(F.col(ts_col))
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    prev = F.lag(sec).over(w)
    is_new = F.when(prev.isNull(), F.lit(0)).otherwise(
        (sec - prev > gap_seconds).cast("int")
    )
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return events.withColumn("session_idx", F.sum(is_new).over(wsum).cast("long"))


def session_stats(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Per-session rollup: (key, session_idx, n_events, duration_sec).

    Two exchanges total: the sessionize window's hash shuffle on ``key_col``
    and the groupBy on (key, session_idx) — the second is partial-aggregated
    map-side and AQE-coalesced; both hash on the same key prefix so skew
    treatment carries over. ``duration_sec`` is integer floor-epoch math
    (oracle-portable)."""
    sec = F.unix_timestamp(F.col(ts_col))
    return (
        sessionize(events, key_col, ts_col, order_col, gap_seconds)
        .groupBy(key_col, "session_idx")
        .agg(
            F.count("*").alias("n_events"),
            (F.max(sec) - F.min(sec)).cast("long").alias("duration_sec"),
        )
    )
