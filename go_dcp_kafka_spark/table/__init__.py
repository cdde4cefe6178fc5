from go_dcp_kafka_spark.table.snapshot import SnapshotTable

__all__ = ["SnapshotTable"]
