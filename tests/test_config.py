"""Config loading + builder lifecycle (SURVEY §3.1 / §2.7)."""

import pytest

from go_dcp_kafka_spark.config import PipelineBuilder, PipelineConfig, substitute_env
from go_dcp_kafka_spark.gen import fold_oracle
from tests.conftest import assert_frames_equal


def test_env_substitution(monkeypatch):
    monkeypatch.setenv("CDC_DIR", "/data/x")
    monkeypatch.delenv("CDC_MISSING", raising=False)
    out = substitute_env("a: ${CDC_DIR}/log\nb: ${CDC_MISSING}end")
    assert out == "a: /data/x/log\nb: end"  # unset -> empty, like os.Getenv


def test_yaml_config_with_env(tmp_path, monkeypatch):
    monkeypatch.setenv("CDC_BASE", str(tmp_path / "base"))
    y = tmp_path / "cfg.yml"
    y.write_text(
        "base_dir: ${CDC_BASE}\nsource_dir: /src\nnum_buckets: 8\nmerge_mode: mor\n"
    )
    cfg = PipelineConfig.from_yaml(str(y))
    assert cfg.base_dir == str(tmp_path / "base")
    assert cfg.num_buckets == 8 and cfg.merge_mode == "mor"
    assert cfg.max_files_per_trigger == 2  # defaults applied


def test_yaml_compaction_knobs(tmp_path):
    y = tmp_path / "cfg.yml"
    y.write_text(
        "base_dir: /b\nsource_dir: /s\ncompact_every: 8\n"
        "compact_delta_bytes: 1048576\ncompact_bucket_bytes: 65536\n"
    )
    cfg = PipelineConfig.from_yaml(str(y))
    assert cfg.compact_every == 8
    assert cfg.compact_delta_bytes == 1_048_576
    assert cfg.compact_bucket_bytes == 65_536


def test_unknown_config_keys_rejected():
    with pytest.raises(ValueError, match="unknown config keys"):
        PipelineConfig.from_yaml("base_dir: /x\nbogus_knob: 1\n")


def test_builder_end_to_end_with_completion_handler(spark, gen_result, log_info, tmp_path):
    seen = []
    pipe = (
        PipelineBuilder(
            {
                "base_dir": str(tmp_path / "t"),
                "source_dir": log_info["dir"],
                "checkpoint_location": str(tmp_path / "ck"),
                "num_buckets": 8,
                "run_id": "built",
            }
        )
        .set_spark(spark)
        .on_epoch_complete(seen.append)
        .build()
    )
    pipe.run_stream(log_info["dir"], str(tmp_path / "ck"), max_files_per_trigger=4)
    assert len(seen) >= 2 and all("epoch" in s for s in seen)
    assert_frames_equal(pipe.read_table().toPandas(), fold_oracle(gen_result.events))


def test_set_logger_analog(spark):
    """SetLogger analog (connector.go:289-294): configures the package
    logger level and accepts a caller-supplied logger."""
    import logging

    from go_dcp_kafka_spark.config import set_logger

    log = set_logger("INFO", spark=spark)
    assert log.level == logging.INFO and log.name == "go_dcp_kafka_spark"
    custom = logging.getLogger("my_app_cdc")
    assert set_logger("DEBUG", logger=custom) is custom
    assert custom.level == logging.DEBUG
    set_logger("WARN", spark=spark)  # restore quiet JVM logs


def test_builder_wires_metrics_oversize_and_logger(spark, log_dir, tmp_path):
    from go_dcp_kafka_spark.streaming.metrics import BATCH_PRODUCE_LATENCY_MS, MetricsRegistry

    reg = MetricsRegistry()
    pipe = (
        PipelineBuilder(
            {
                "base_dir": str(tmp_path / "t"),
                "source_dir": log_dir,
                "run_id": "bw",
                "max_message_bytes": 25,
                "log_level": "WARN",
            }
        )
        .set_spark(spark)
        .set_metrics(reg)
        .build()
    )
    assert pipe.max_message_bytes == 25 and pipe.metrics is reg
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    assert reg.get(BATCH_PRODUCE_LATENCY_MS) > 0


def test_transport_security_mapping(tmp_path, monkeypatch):
    """S8 TLS/SCRAM mapped Spark-native (client.go:45-104): same fields
    (inline PEMs or $ENV-expandable paths), same validation (empty cert
    pool refused), emitted as the Kafka-source option set."""
    from go_dcp_kafka_spark.sources.changelog import (
        kafka_change_log_options,
        kafka_transport_security_options,
    )

    ca = tmp_path / "ca.pem"
    ca.write_text("-----BEGIN CERTIFICATE-----\nROOT\n-----END CERTIFICATE-----")
    monkeypatch.setenv("CA_DIR", str(tmp_path))
    sec = kafka_transport_security_options(
        "svc-user", "s3cret", root_ca_path="$CA_DIR/ca.pem", inter_ca="INTERPEM"
    )
    assert sec["kafka.security.protocol"] == "SASL_SSL"
    assert sec["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert 'username="svc-user"' in sec["kafka.sasl.jaas.config"]
    assert "ScramLoginModule required" in sec["kafka.sasl.jaas.config"]
    assert sec["kafka.ssl.truststore.type"] == "PEM"
    assert "ROOT" in sec["kafka.ssl.truststore.certificates"]
    assert "INTERPEM" in sec["kafka.ssl.truststore.certificates"]
    assert sec["kafka.ssl.protocol"] == "TLSv1.2"

    # merged into the source options
    opts = kafka_change_log_options("b:9093", "cdc", security=sec)
    assert opts["kafka.bootstrap.servers"] == "b:9093" and opts["kafka.security.protocol"] == "SASL_SSL"

    # the reference's refusal: secure with an empty cert pool
    import pytest

    with pytest.raises(ValueError, match="certPool is empty"):
        kafka_transport_security_options("u", "p")

    # JAAS escaping: a quote/backslash in the password cannot truncate or
    # extend the config line
    sec2 = kafka_transport_security_options('u"x\\y', 'p"w', inter_ca="PEM")
    assert 'username="u\\"x\\\\y" password="p\\"w";' in sec2["kafka.sasl.jaas.config"]

    # config-block plumbing (reference camelCase field names)
    cfg = PipelineConfig.from_yaml(
        "base_dir: /b\nsource_dir: /s\nsecurity:\n  secureConnection: true\n"
        f"  scramUsername: u\n  scramPassword: p\n  rootCAPath: {ca}\n"
    )
    assert cfg.kafka_security_options()["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    insecure = PipelineConfig.from_yaml("base_dir: /b\nsource_dir: /s\n")
    assert insecure.kafka_security_options() == {}
