from go_dcp_kafka_spark.functions.mapper import (
    compose,
    default_mapper,
    filter_mapper,
    log_style_mapper,
    route_mapper,
)
from go_dcp_kafka_spark.functions.normalize import normalize_text_col, normalize_text_pandas

__all__ = [
    "compose",
    "default_mapper",
    "filter_mapper",
    "log_style_mapper",
    "route_mapper",
    "normalize_text_col",
    "normalize_text_pandas",
]
