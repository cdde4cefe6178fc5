"""Change-event log source — the DCP stream analog (SURVEY §2.1 S1).

The reference opens DCP sockets and gets a callback per change event
(/root/reference/connector.go:50-56,156). Our source is an append-only
parquet log read with an **explicit schema** — never inferred — which is
also what makes schema evolution work: early files lack the ``tool`` column
and the reader backfills nulls.

Rate limiting: the reference's double trigger (batch >= 2000 msgs OR >= 1 MB
OR 10 s ticker — producer_batch.go:54-61,102-104) maps to Spark's micro-batch
admission: ``maxFilesPerTrigger`` / ``maxBytesPerTrigger`` on the source plus
the processing-time trigger. In a Kafka deployment this module becomes
``spark.readStream.format("kafka")`` + ``from_json`` — same downstream plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from go_dcp_kafka_spark.schema import CHANGE_EVENT_SCHEMA


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    """Full-log batch read (backfill / finite-DCP mode,
    /root/reference/dcp_event_handler.go:29-34)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)


def stream_change_log(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 2,
) -> DataFrame:
    """Streaming tail of the log; one micro-batch per trigger."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the log is append-only; file order is delivery order
    reader = reader.option("latestFirst", "false")
    return reader.parquet(path)
