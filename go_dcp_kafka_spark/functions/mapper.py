"""The Mapper surface — the reference's single extension point re-imagined.

Reference: ``type Mapper func(event couchbase.Event) []message.KafkaMessage``
(/root/reference/mapper.go:8) — per event, return 0..N sink messages; nil
means discard (the event is still acked, connector.go:98-101); messages may
rewrite key/value/headers and route to a different topic
(connector.go:125-140).

Ours: a mapper is ``DataFrame -> DataFrame`` over the deduplicated
micro-batch. Same expressive power, set-oriented:

- discard      => ``filter`` (checkpoints still advance: the HWM is computed
                  upstream of the mapper, mirroring the empty-ack path)
- 1->N         => ``explode`` of an array-valued expression
- rewrite      => ``withColumn`` / pandas UDF on payload columns
- routing      => add a ``target`` column (coalesce(msg-topic, collection
                  mapping) analog); CdcPipeline merges each target table

Mappers MUST preserve the envelope columns
(partition_id, seqno, delivery_seq, op, conv_id, turn_idx).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.normalize import normalize_text_col
from go_dcp_kafka_spark.schema import OP_MUTATION

Mapper = Callable[[DataFrame], DataFrame]


def default_mapper(df: DataFrame) -> DataFrame:
    """Identity + text normalization. NOTE the deliberate semantic shift from
    the reference's DefaultMapper (mapper.go:10-20), which DROPS deletions and
    expirations because its sink is an append-only log; our sink is a keyed
    table, so deletions must flow through and delete (SURVEY §2.2 P2)."""
    return df.withColumn("text", normalize_text_col("text"))


def log_style_mapper(df: DataFrame) -> DataFrame:
    """Exact DefaultMapper parity (mutations only, key+value forwarded) —
    for log-sink deployments / parity tests."""
    return df.filter(F.col("op") == OP_MUTATION)


def filter_mapper(predicate: Column) -> Mapper:
    """Discard events failing the predicate (nil-return analog). Checkpoints
    advance past discarded events because HWM is computed pre-mapper."""

    def _m(df: DataFrame) -> DataFrame:
        return df.filter(predicate)

    return _m


def route_mapper(routing: dict[str, str], route_key: Column | None = None, default: str | None = None) -> Mapper:
    """Topic-routing analog (getTopicName, connector.go:125-140): target =
    mapper-supplied topic else CollectionTopicMapping[collection]. Missing
    mapping -> null target, which CdcPipeline dead-letters (the reference
    panics; strict_routing=True reproduces that)."""

    def _m(df: DataFrame) -> DataFrame:
        key = route_key if route_key is not None else F.col("role")
        mapping = F.create_map(*[F.lit(x) for kv in routing.items() for x in kv])
        tgt = mapping[key]
        if default is not None:
            tgt = F.coalesce(tgt, F.lit(default))
        return df.withColumn("target", tgt)

    return _m


def compose(*mappers: Mapper) -> Mapper:
    """Chain mappers left-to-right."""

    def _m(df: DataFrame) -> DataFrame:
        for m in mappers:
            df = m(df)
        return df

    return _m
