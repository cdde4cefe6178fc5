"""Schemas for the change-event log, transcripts table, and state tables.

The change-event envelope mirrors ``couchbase.Event``
(/root/reference/couchbase/event.go:9-22): the three event-kind booleans
become one ``op`` column, ``VbID uint16`` becomes ``partition_id int``,
``SeqNo/RevNo uint64`` become int64 (synthetic data stays < 2^63), and the
opaque Key/Value bytes become typed transcript columns per the target data
model (conv_id, turn_idx | role, text, tool, ts).
"""

from __future__ import annotations

from pyspark.sql import types as T

OP_MUTATION = "mutation"
OP_DELETION = "deletion"
OP_EXPIRATION = "expiration"
OP_ROLLBACK = "rollback"  # control record: truncate partition HWM (SURVEY §2.5 T5)

OPS = (OP_MUTATION, OP_DELETION, OP_EXPIRATION)

#: Payload columns of the transcripts table (BASELINE.json input_hint).
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

#: Full change-event envelope. ``delivery_seq`` is the global arrival order
#: (monotone per file write order) — the tiebreaker that makes replay after a
#: rollback deterministic. ``rollback_point`` is set only on op='rollback'
#: control rows. ``tool`` is ABSENT in early files (schema evolution); reading
#: with this schema backfills nulls.
CHANGE_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("seqno", T.LongType(), False),
        T.StructField("delivery_seq", T.LongType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("rev_no", T.LongType(), True),
        T.StructField("event_time", T.TimestampType(), True),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("rollback_point", T.LongType(), True),
    ]
)

#: Per-partition high-watermark checkpoint row — mirrors the reference's
#: ``map[vbID]*models.CheckpointDocument`` saved dirty-only to a compacted
#: topic (/root/reference/kafka/metadata/kafka_metadata.go:26-46).
CHECKPOINT_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("hwm_seqno", T.LongType(), False),
        T.StructField("commit_epoch", T.LongType(), False),
    ]
)

#: Per (partition, epoch) lineage/metrics row — mirrors the reference's
#: Prometheus collector gauges (/root/reference/metric/collector.go:38-56).
LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("commit_epoch", T.LongType(), False),
        T.StructField("first_seqno", T.LongType(), True),
        T.StructField("last_seqno", T.LongType(), True),
        T.StructField("n_mutations", T.LongType(), False),
        T.StructField("n_deletions", T.LongType(), False),
        T.StructField("n_expirations", T.LongType(), False),
        T.StructField("n_duplicates_dropped", T.LongType(), False),
        T.StructField("n_merged", T.LongType(), False),
        T.StructField("batch_latency_ms", T.LongType(), True),
    ]
)

#: Dead-letter row — mirrors ``RejectionLog{Topic, Value, Error, Key}``
#: (/root/reference/kafka/rejection_log_sink_response_handler.go:82-87).
#: ``error_class`` mirrors the reference's per-message error-type dispatch
#: (producer_batch.go:146-185 classifies MessageTooLargeError separately
#: from generic write errors): validation | routing | oversize.
REJECTION_SCHEMA = T.StructType(
    [
        T.StructField("target", T.StringType(), True),
        T.StructField("conv_id", T.StringType(), True),
        T.StructField("turn_idx", T.IntegerType(), True),
        T.StructField("error", T.StringType(), False),
        T.StructField("error_class", T.StringType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("commit_epoch_key", T.StringType(), False),
    ]
)

REJECT_VALIDATION = "validation"
REJECT_ROUTING = "routing"
REJECT_OVERSIZE = "oversize"
REJECT_DECODE = "decode"  # malformed wire record (JSON line that fails to parse)

#: Name of the Spark corrupt-record column on the JSON wire path. A line
#: that fails to parse lands here verbatim (PERMISSIVE mode) and is
#: dead-lettered with error_class='decode' instead of failing the epoch —
#: the reference classifies per-message produce errors the same way
#: (/root/reference/kafka/producer/producer_batch.go:146-185); its
#: no-handler mode panics (connector.go:132-138), ours always has the DLQ.
CORRUPT_COL = "_corrupt_record"

#: Key columns of the transcripts table (the MERGE ON clause).
KEY_COLS = ("conv_id", "turn_idx")

#: Payload columns carried from an event into the table.
PAYLOAD_COLS = ("role", "text", "tool", "ts")
