"""spark-submit entry point: replay a change-event log into a transcripts
table on a real cluster.

    zip -r go_dcp_kafka_spark.zip go_dcp_kafka_spark/
    spark-submit \\
      --py-files go_dcp_kafka_spark.zip \\
      --conf spark.sql.adaptive.enabled=true \\
      --conf spark.sql.shuffle.partitions=<2-3x total executor cores> \\
      --conf spark.sql.files.maxPartitionBytes=<input bytes / total cores> \\
      tools/submit_replay.py --config pipeline.yml [--mode stream|batch]

On a cluster with an Iceberg catalog configured
(spark.sql.catalog.<name>=org.apache.iceberg.spark.SparkCatalog), the same
pipeline code issues a real MERGE INTO (see table/snapshot.py
iceberg_merge_sql); without one it uses the built-in SnapshotTable format.
The N->4N scaling criterion is a pure executor-count change: identical job,
--num-executors N vs 4N (this sandbox evidences it at local[1] vs local[4],
see BENCH/BASELINE.md).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True, help="pipeline YAML (config.PipelineConfig)")
    ap.add_argument("--mode", choices=["stream", "batch"], default="stream")
    ap.add_argument("--available-now", action="store_true", default=True)
    args = ap.parse_args()

    from go_dcp_kafka_spark.config import PipelineBuilder, PipelineConfig

    cfg = PipelineConfig.from_yaml(args.config)
    pipe = PipelineBuilder(cfg).build()
    if args.mode == "batch":
        pipe.run_batch_replay(cfg.source_dir)
    else:
        pipe.run_stream(
            cfg.source_dir,
            cfg.checkpoint_location,
            max_files_per_trigger=cfg.max_files_per_trigger,
            available_now=args.available_now,
            max_bytes_per_trigger=cfg.max_bytes_per_trigger,
        )
    print(f"final table rows: {pipe.read_table().count()}")


if __name__ == "__main__":
    main()
