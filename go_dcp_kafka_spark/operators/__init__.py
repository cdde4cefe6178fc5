from go_dcp_kafka_spark.operators.fold import (
    apply_rollbacks,
    extract_rollback_markers,
    fold_change_events,
    hwm_filter,
    lww_winners,
)
from go_dcp_kafka_spark.operators.salting import salted_repartition

__all__ = [
    "apply_rollbacks",
    "extract_rollback_markers",
    "fold_change_events",
    "hwm_filter",
    "lww_winners",
    "salted_repartition",
]
