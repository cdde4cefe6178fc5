"""Rejection-handler pipeline — dead-lettering with per-class dispatch.

Reference analog: /root/reference/example/ rejection-handler +
kafka/rejection_log_sink_response_handler.go (failed writes land in a
rejection topic) and producer_batch.go:146-185 (MessageTooLargeError
classified separately). Here: a validation predicate and an oversize guard
route failing rows to the `_rejections` table with distinct error classes
while the good rows merge normally.

Run: python examples/rejection_handler_pipeline.py
"""

import glob
import os
import sys
import tempfile
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from go_dcp_kafka_spark import get_spark
from go_dcp_kafka_spark.functions.mapper import route_mapper
from go_dcp_kafka_spark.gen import GenConfig, generate_change_events, write_change_log
from go_dcp_kafka_spark.streaming.runner import CdcPipeline


def main() -> None:
    spark = get_spark("example-rejections", master="local[4]", shuffle_partitions=8)

    res = generate_change_events(GenConfig(seed=2, n_convs=60, n_hot_convs=1, hot_turns=40, n_partitions=8))
    log_dir = tempfile.mkdtemp(prefix="changelog_")
    write_change_log(res.events, log_dir, n_files=4, evolution_boundary=res.meta["evolution_boundary"])

    from go_dcp_kafka_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
    from go_dcp_kafka_spark.table.snapshot import SnapshotTable

    base = tempfile.mkdtemp(prefix="table_")
    tables = {
        "user_turns": SnapshotTable(spark, f"{base}/user_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
        "agent_turns": SnapshotTable(spark, f"{base}/agent_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
    }
    pipe = CdcPipeline(
        spark,
        base,
        tables=tables,
        run_id="example",
        # 'system' role has no mapping -> error_class='routing' (the
        # reference panics on a missing CollectionTopicMapping entry)
        mapper=route_mapper(
            {"user": "user_turns", "assistant": "agent_turns", "tool": "agent_turns"}
        ),
        # tombstones carry null text by design — let them through
        validate=F.col("text").isNull() | (F.col("turn_idx") < 30),
        max_message_bytes=165,  # MessageTooLargeError analog (whole serialized message)
    )
    pipe.run_stream(log_dir, tempfile.mkdtemp(prefix="ckpt_"), max_files_per_trigger=2)

    print(f"\nmerged rows: user={pipe.read_table('user_turns').count()} agent={pipe.read_table('agent_turns').count()}")
    rej = pd.concat(
        [pd.read_parquet(f) for f in glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)]
    )
    print("\nrejections by class:")
    print(rej.groupby(["error_class", "error"]).size().to_string())
    print("\nsample dead-letter rows:")
    print(rej.head(5).to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
