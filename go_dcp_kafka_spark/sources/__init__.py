from go_dcp_kafka_spark.sources.changelog import read_change_log, stream_change_log

__all__ = ["read_change_log", "stream_change_log"]
