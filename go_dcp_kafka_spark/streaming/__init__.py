from go_dcp_kafka_spark.streaming.checkpoints import CheckpointStore
from go_dcp_kafka_spark.streaming.runner import CdcPipeline

__all__ = ["CheckpointStore", "CdcPipeline"]
