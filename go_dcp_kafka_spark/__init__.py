"""go_dcp_kafka_spark — a PySpark-native CDC / incremental-ingest engine.

A from-scratch re-imagination of Trendyol/go-dcp-kafka's DCP->Kafka connector
(reference at /root/reference, read-only) as a Spark Structured Streaming
pipeline: a change-event log (mutation/deletion/expiration records keyed by
(conv_id, turn_idx), carrying vbucket-style partition_id and seqno/rollback
metadata) is tailed, deduplicated by (partition, seqno) high-watermark state,
and applied as key-partitioned MERGE upserts into a versioned transcripts
table with per-partition offset checkpoints, resumable replay, rollback
truncation, schema evolution, skew salting, and lineage/metrics tables.

This is NOT a port: the reference is a row-at-a-time Go callback pipeline
(/root/reference/connector.go:70-123); this engine is set-oriented columnar
Spark — micro-batches, vectorized expressions, no per-row Python.
"""

from go_dcp_kafka_spark.schema import CHANGE_EVENT_SCHEMA, TRANSCRIPT_SCHEMA
from go_dcp_kafka_spark.session import get_spark

__all__ = ["CHANGE_EVENT_SCHEMA", "TRANSCRIPT_SCHEMA", "get_spark"]

__version__ = "0.1.0"
