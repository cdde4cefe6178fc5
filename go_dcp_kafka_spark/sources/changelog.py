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

from go_dcp_kafka_spark.schema import CHANGE_EVENT_SCHEMA, CORRUPT_COL


def read_change_log(spark: SparkSession, path: str) -> DataFrame:
    """Full-log batch read (backfill / finite-DCP mode,
    /root/reference/dcp_event_handler.go:29-34)."""
    return spark.read.schema(CHANGE_EVENT_SCHEMA).parquet(path)


def stream_change_log(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 2,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of the log; one micro-batch per trigger.

    Micro-batch admission mirrors the reference's double batch threshold
    (producer_batch.go:54-61: flush at N messages OR M bytes):
    ``maxFilesPerTrigger`` is the count knob, ``maxBytesPerTrigger`` the
    size knob (the size knob wins if both are set, matching Spark's file
    source precedence)."""
    reader = spark.readStream.schema(CHANGE_EVENT_SCHEMA)
    if max_bytes_per_trigger:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    elif max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # the log is append-only; file order is delivery order
    reader = reader.option("latestFirst", "false")
    return reader.parquet(path)


# ---------------------------------------------------------------- JSON wire
# A Kafka/Debezium-style deployment delivers change events as JSON lines.
# The timestamp columns travel as ISO-8601 strings (the JSON wire has no
# timestamp type); both readers parse with an explicit schema — never
# inferred — so schema evolution (absent ``tool`` key) backfills nulls
# exactly like the parquet path.

_JSON_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
    # decode-failure dead-lettering: malformed lines land verbatim in
    # CORRUPT_COL (PERMISSIVE) and CdcPipeline routes them to _rejections
    # with error_class='decode' — one poison message must not fail the epoch
    "mode": "PERMISSIVE",
    "columnNameOfCorruptRecord": CORRUPT_COL,
}

#: Read schema for the JSON wire: envelope + the corrupt-record capture.
#: (fresh StructType — StructType.add would mutate CHANGE_EVENT_SCHEMA)
from pyspark.sql import types as _T  # noqa: E402

JSON_WIRE_SCHEMA = _T.StructType(
    [*CHANGE_EVENT_SCHEMA.fields, _T.StructField(CORRUPT_COL, _T.StringType(), True)]
)


def read_change_log_json(spark: SparkSession, path: str) -> DataFrame:
    """Batch read of a JSON-lines change log (same envelope, wire format
    swapped). Downstream plan is identical to the parquet source."""
    return spark.read.schema(JSON_WIRE_SCHEMA).options(**_JSON_TS_OPTS).json(path)


def stream_change_log_json(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = 2,
    max_bytes_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail of a JSON-lines change log."""
    reader = spark.readStream.schema(JSON_WIRE_SCHEMA).options(**_JSON_TS_OPTS)
    if max_bytes_per_trigger:
        reader = reader.option("maxBytesPerTrigger", max_bytes_per_trigger)
    elif max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    reader = reader.option("latestFirst", "false")
    return reader.json(path)


def kafka_change_log_options(
    bootstrap_servers: str, topic: str, security: dict[str, str] | None = None
) -> dict[str, str]:
    """The options a real Kafka deployment passes to
    ``spark.readStream.format("kafka")``; the value column is then parsed
    with ``from_json(CHANGE_EVENT_SCHEMA)`` into the same envelope. Kept as
    a documented mapping (no Kafka broker or connector jar exists in this
    sandbox; the JSON-lines source above exercises the identical parse
    path). ``security``: the dict from
    ``kafka_transport_security_options`` (TLS/SCRAM), merged in."""
    out = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    if security:
        out.update(security)
    return out


def kafka_transport_security_options(
    scram_username: str,
    scram_password: str,
    root_ca_path: str | None = None,
    inter_ca_path: str | None = None,
    root_ca: str | None = None,
    inter_ca: str | None = None,
) -> dict[str, str]:
    """SCRAM-SHA-512-over-TLS transport config (S8), mapped Spark-native.

    Mirrors the reference's ``newTLSContent``
    (/root/reference/kafka/client.go:45-104) field-for-field: SCRAM
    credentials, root + intermediate CAs as either ``$ENV``-expandable file
    paths or inline PEM strings, with the same validation — at least one CA
    must resolve or the config is refused (client.go:92-96, "certPool is
    empty") — and the same TLS 1.2 floor (tls.Config MinVersion). Emitted
    as the option dict Spark's Kafka source forwards to the Java client:
    SASL_SSL + ScramLoginModule JAAS + a PEM truststore. The transport
    itself is the cluster's Kafka client — engine semantics end at
    producing a correct, validated option set."""
    import os as _os

    pems: list[str] = []
    for p in (root_ca_path, inter_ca_path):
        if p:
            with open(_os.path.expandvars(p)) as f:
                pems.append(f.read().strip())
    for c in (root_ca, inter_ca):
        if c:
            pems.append(c.strip())
    if not pems:
        raise ValueError(
            "certPool is empty: provide at least one CA (path or inline PEM)"
        )
    # JAAS values are double-quoted: escape backslash and quote so a
    # password containing either cannot truncate or extend the config line
    def _jq(v: str) -> str:
        return v.replace("\\", "\\\\").replace('"', '\\"')

    jaas = (
        "org.apache.kafka.common.security.scram.ScramLoginModule required "
        f'username="{_jq(scram_username)}" password="{_jq(scram_password)}";'
    )
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "SCRAM-SHA-512",
        "kafka.sasl.jaas.config": jaas,
        "kafka.ssl.truststore.type": "PEM",
        "kafka.ssl.truststore.certificates": "\n".join(pems),
        "kafka.ssl.protocol": "TLSv1.2",
        "kafka.ssl.enabled.protocols": "TLSv1.2,TLSv1.3",
    }
