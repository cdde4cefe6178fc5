"""Config + builder surface — the NewConnectorBuilder lifecycle (SURVEY §3.1).

The reference accepts config as a struct, a file path, or YAML text with
``${ENV_VAR}`` substitution (connector.go:195-206, 236-257), then applies
defaults (config/config.go:82-114: batchSize 2000, batchBytes 1MB, ticker
10s, ...). Ours: a dataclass, a YAML loader with the same env-substitution
regex semantics, and a fluent ``PipelineBuilder``
(NewConnectorBuilder(cfg).SetMapper(m).Build() analog,
connector.go:266-287).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field, fields
from typing import Any

_ENV_RE = re.compile(r"\$\{([A-Za-z_][A-Za-z0-9_]*)\}")


def substitute_env(text: str) -> str:
    """${VAR} -> os.environ[VAR] (empty string when unset — matching the
    reference's os.Getenv semantics, connector.go:241-249)."""
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1), ""), text)


_SPARK_LEVELS = {"ALL", "DEBUG", "ERROR", "FATAL", "INFO", "OFF", "TRACE", "WARN"}


def set_logger(level: str = "WARN", spark=None, logger=None):
    """SetLogger analog (/root/reference/connector.go:289-294): swap/retune
    the engine's logger. Configures the ``go_dcp_kafka_spark`` python logger
    (or a caller-supplied one) and, when a session is given, the JVM log4j
    level too. Returns the configured logger."""
    import logging

    log = logger or logging.getLogger("go_dcp_kafka_spark")
    py_level = getattr(logging, str(level).upper(), logging.WARNING)
    log.setLevel(py_level)
    if not log.handlers:
        h = logging.StreamHandler()
        h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
        log.addHandler(h)
    if spark is not None:
        lvl = str(level).upper()
        spark.sparkContext.setLogLevel(lvl if lvl in _SPARK_LEVELS else "WARN")
    return log


@dataclass
class PipelineConfig:
    """Engine analog of config.Connector{Kafka, Dcp}. Defaults mirror the
    reference's applyKafkaDefaults/applyDcpDefaults where a Spark analog
    exists; batching knobs map to source rate limits + trigger."""

    base_dir: str = "./cdc_table"
    source_dir: str = "./change_log"
    checkpoint_location: str = "./spark_ckpt"
    num_buckets: int = 16
    merge_mode: str | None = None         # 'cow' | 'mor' | None = auto (streaming -> mor)
    compact_every: int | None = None      # None = 64 under MOR, 0 = manual only
    compact_delta_bytes: int | None = None  # ALSO compact when outstanding delta bytes reach this
    compact_bucket_bytes: int | None = None  # per-bucket floor: rewrite only buckets with this many outstanding delta bytes
    dlq_retention_epochs: int | None = None  # prune _rejections dirs N epochs behind newest
    expire_every: int | None = None       # run snapshot expiry each N epochs (None = manual)
    keep_snapshots: int = 2               # snapshots retained by expiry (time-travel window)
    max_files_per_trigger: int = 2        # producerBatchSize analog (count threshold)
    max_bytes_per_trigger: int | None = None  # producerBatchBytes analog (size threshold)
    trigger_seconds: float | None = None  # producerBatchTickerDuration analog (10s default there)
    run_id: str = "run"
    strict_routing: bool = False          # reference panics on missing mapping
    routing: dict[str, str] = field(default_factory=dict)
    shuffle_partitions: int | None = None
    app_name: str = "go_dcp_kafka_spark"
    max_message_bytes: int | None = None  # MessageTooLargeError analog (producer_batch.go:146-185)
    log_level: str | None = None          # SetLogger analog (connector.go:289-294)
    source_format: str = "parquet"        # 'parquet' | 'json' (Kafka/Debezium-style lines)
    sink_compression: str = "snappy"      # producer compression analog (client.go:202-218): snappy|gzip|zstd|lz4|none
    sort_within_buckets: bool = False     # key-sorted bucket files -> selective row-group stats for point lookups
    #: S8 transport block (secureConnection + scramUsername/scramPassword +
    #: rootCA(Path)/interCA(Path), config/config.go:19-38): validated and
    #: mapped to Spark Kafka-source options by kafka_security_options()
    security: dict | None = None

    @classmethod
    def from_yaml(cls, path_or_text: str) -> PipelineConfig:
        import yaml

        text = path_or_text
        if os.path.exists(path_or_text):
            with open(path_or_text) as f:
                text = f.read()
        raw: dict[str, Any] = yaml.safe_load(substitute_env(text)) or {}
        known = {f.name for f in fields(cls)}
        unknown = set(raw) - known
        if unknown:
            raise ValueError(f"unknown config keys: {sorted(unknown)}")
        return cls(**raw)

    def kafka_security_options(self) -> dict[str, str]:
        """Resolve the ``security`` block (reference field names, camelCase
        or snake_case) into the Spark Kafka-source transport options; {}
        when ``secureConnection`` is false/absent, ValueError when secure
        but no CA resolves (client.go:92-96)."""
        s = self.security or {}

        def g(*names):
            for n in names:
                if s.get(n):
                    return s[n]
            return None

        if not (g("secureConnection", "secure_connection")):
            return {}
        from go_dcp_kafka_spark.sources.changelog import kafka_transport_security_options

        return kafka_transport_security_options(
            scram_username=g("scramUsername", "scram_username") or "",
            scram_password=g("scramPassword", "scram_password") or "",
            root_ca_path=g("rootCAPath", "root_ca_path"),
            inter_ca_path=g("interCAPath", "inter_ca_path"),
            root_ca=g("rootCA", "root_ca"),
            inter_ca=g("interCA", "inter_ca"),
        )


class PipelineBuilder:
    """Fluent builder: collects config + mapper + handlers, validates, and
    wires the pipeline — the reference's builder collects config/mapper/
    handlers and newConnector validates topics + wires commit closures."""

    def __init__(self, config: PipelineConfig | str | dict):
        if isinstance(config, str):
            config = PipelineConfig.from_yaml(config)
        elif isinstance(config, dict):
            config = PipelineConfig(**config)
        self.config = config
        self._mapper = None
        self._validate = None
        self._on_epoch_complete = None
        self._spark = None
        self._tables = None
        self._metrics = None
        self._logger = None

    def set_spark(self, spark):
        self._spark = spark
        return self

    def set_mapper(self, mapper):
        """SetMapper analog (connector.go:275-278)."""
        self._mapper = mapper
        return self

    def set_validator(self, predicate):
        """SinkResponseHandler/dead-letter analog."""
        self._validate = predicate
        return self

    def set_tables(self, tables: dict):
        self._tables = tables
        return self

    def on_epoch_complete(self, callback):
        """completionHandler analog (connector.go:309-312): invoked with the
        epoch stats dict after each durable commit."""
        self._on_epoch_complete = callback
        return self

    def set_metrics(self, registry):
        """Live gauge registry (streaming.metrics.MetricsRegistry) — the
        reference's metric collector hookup."""
        self._metrics = registry
        return self

    def set_logger(self, logger):
        """SetLogger analog (connector.go:289-294): use a caller-supplied
        logging.Logger instead of the package default."""
        self._logger = logger
        return self

    def build(self):
        from go_dcp_kafka_spark.session import get_spark
        from go_dcp_kafka_spark.streaming.runner import CdcPipeline

        c = self.config
        spark = self._spark or get_spark(c.app_name, shuffle_partitions=c.shuffle_partitions)
        mapper = self._mapper
        if c.routing and mapper is None:
            from go_dcp_kafka_spark.functions.mapper import route_mapper

            mapper = route_mapper(c.routing)
        if c.log_level is not None:
            set_logger(c.log_level, spark=spark, logger=self._logger)
        elif self._logger is not None:
            # caller supplied a pre-configured logger with no explicit config
            # level: attach a handler if missing but do NOT touch its level
            # (ADVICE r2: build() used to silently reset it to WARN)
            import logging

            if not self._logger.handlers:
                h = logging.StreamHandler()
                h.setFormatter(logging.Formatter("%(asctime)s %(name)s %(levelname)s %(message)s"))
                self._logger.addHandler(h)
        pipe = CdcPipeline(
            spark,
            c.base_dir,
            tables=self._tables,
            mapper=mapper,
            validate=self._validate,
            num_buckets=c.num_buckets,
            run_id=c.run_id,
            strict_routing=c.strict_routing,
            merge_mode=c.merge_mode,
            compact_every=c.compact_every,
            compact_delta_bytes=c.compact_delta_bytes,
            compact_bucket_bytes=c.compact_bucket_bytes,
            dlq_retention_epochs=c.dlq_retention_epochs,
            expire_every=c.expire_every,
            keep_snapshots=c.keep_snapshots,
            max_message_bytes=c.max_message_bytes,
            metrics=self._metrics,
            source_format=c.source_format,
            sink_compression=c.sink_compression,
            sort_within_buckets=c.sort_within_buckets,
        )
        pipe.on_epoch_complete = self._on_epoch_complete
        pipe.config = c
        return pipe
