"""Stateful HWM dedup via applyInPandasWithState — the mapGroupsWithState
path (north_star variant of SURVEY §2.5 T6).

The default pipeline dedups with a broadcast HWM anti-join against the
``_checkpoints`` table inside foreachBatch (deterministic + restart-safe).
This module is the alternative: per-partition high-watermark state held in
Spark's own state store, keyed by ``partition_id`` — the exact vectorized
analog of the reference's per-vbucket listener loop (one goroutine per DCP
stream consuming events in seqno order, /root/reference/connector.go:70-123).

Semantics per partition group, per micro-batch (rows sorted by
delivery_seq — arrival order):
- op='rollback'      -> hwm = min(hwm, rollback_point); marker EMITTED
                        downstream (consumers must invalidate already-emitted
                        old-branch rows — an append-only sink cannot retract,
                        so the control record travels with the stream and
                        fold_change_events applies the invalidation)
- seqno <= hwm       -> duplicate delivery; dropped
- otherwise          -> emitted, hwm = seqno

Post-rollback replays legitimately reuse seqnos > rollback_point, so
(partition, seqno) uniqueness holds only per history branch.

State = a single int64 per partition: O(#partitions) state total (1024 at
Couchbase scale) — constant memory, no per-key state explosion. The pandas
work inside the group is vectorized where the data allows (pure monotone
runs fold to a single cummax) with a scalar fallback only across rollback
boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from go_dcp_kafka_spark.schema import CHANGE_EVENT_SCHEMA

STATE_SCHEMA = T.StructType([T.StructField("hwm_seqno", T.LongType())])


def _dedup_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (hwm,) = state.get if state.exists else (-1,)
    hwm = int(hwm)
    for pdf in pdfs:
        pdf = pdf.sort_values("delivery_seq")
        is_rb = (pdf["op"] == "rollback").to_numpy()
        if not is_rb.any():
            # vectorized fast path: DCP order is monotone per partition, so
            # "fresh" = seqno above the running prefix max (cummax)
            seq = pdf["seqno"].to_numpy()
            prefix = np.maximum(np.concatenate(([hwm], np.maximum.accumulate(seq)[:-1])), hwm)
            keep = seq > prefix
            if len(seq):
                hwm = max(hwm, int(seq.max()))
            out = pdf.loc[keep]
        else:
            # rollback in batch: exact scalar fold across the boundary
            keep_idx = []
            for i, (op, seqno, rbp) in enumerate(
                zip(pdf["op"].to_numpy(), pdf["seqno"].to_numpy(), pdf["rollback_point"].to_numpy())
            ):
                if op == "rollback":
                    hwm = min(hwm, int(rbp))
                    keep_idx.append(i)  # marker flows downstream
                    continue
                if seqno <= hwm:
                    continue
                hwm = int(seqno)
                keep_idx.append(i)
            out = pdf.iloc[keep_idx]
        if len(out):
            yield out
    state.update((hwm,))


def stateful_hwm_dedup(stream: DataFrame) -> DataFrame:
    """Streaming change-event DataFrame -> deduplicated stream with
    per-partition HWM state in the Spark state store."""
    return stream.groupBy("partition_id").applyInPandasWithState(
        _dedup_group,
        outputStructType=CHANGE_EVENT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_dedup_to_parquet(
    spark: Any,
    source_dir: str,
    out_dir: str,
    checkpoint_location: str,
    max_files_per_trigger: int = 2,
) -> None:
    """Drain the log through the stateful dedup into a parquet stream sink
    (append mode — the state store enforces exactly-once emission)."""
    from go_dcp_kafka_spark.sources.changelog import stream_change_log

    stream = stream_change_log(spark, source_dir, max_files_per_trigger)
    q = (
        stateful_hwm_dedup(stream)
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_location)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
