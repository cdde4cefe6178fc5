"""Default-mapper pipeline — the 'hello world' deployment.

Reference analog: /root/reference/example/ default-mapper main.go — start
the connector with DefaultMapper and let it forward the stream. Here: tail
a change log with the default (normalizing) mapper, fold it into the
transcripts table, and read the final state back.

Run: python examples/default_mapper_pipeline.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_dcp_kafka_spark import get_spark
from go_dcp_kafka_spark.functions.mapper import default_mapper
from go_dcp_kafka_spark.gen import GenConfig, generate_change_events, write_change_log
from go_dcp_kafka_spark.streaming.runner import CdcPipeline


def main() -> None:
    spark = get_spark("example-default-mapper", master="local[4]", shuffle_partitions=8)

    # 1. a deterministic change log standing in for the DCP/Kafka tail
    res = generate_change_events(GenConfig(seed=1, n_convs=60, n_hot_convs=1, hot_turns=40, n_partitions=8))
    log_dir = tempfile.mkdtemp(prefix="changelog_")
    write_change_log(res.events, log_dir, n_files=4, evolution_boundary=res.meta["evolution_boundary"])

    # 2. the connector: stream -> dedup -> default mapper -> MERGE
    base = tempfile.mkdtemp(prefix="table_")
    pipe = CdcPipeline(spark, base, run_id="example", mapper=default_mapper)
    pipe.run_stream(log_dir, tempfile.mkdtemp(prefix="ckpt_"), max_files_per_trigger=2)

    # 3. observe the result
    table = pipe.read_table()
    print(f"\nfinal transcripts: {table.count()} rows")
    table.orderBy("conv_id", "turn_idx").show(10, truncate=60)
    print("per-partition checkpoints:")
    print(pipe.checkpoints.load().to_string(index=False))
    print("\nlineage (last 3 epochs):")
    print(pipe.lineage.read().tail(3).to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
