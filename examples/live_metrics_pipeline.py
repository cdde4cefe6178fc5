"""Live metrics pipeline — gauges while the stream runs.

Reference analog: /root/reference/metric/collector.go:38-56 — Prometheus
gauges (`kafka_connector_latency_ms`, `batch_produce_latency_ms`) scraped
while the connector runs. Here: a StreamingQueryListener + MetricsRegistry
publish the same gauges (`*_latency_ms_current`), polled after each
micro-batch and mirrored per-epoch into the lineage table.

Run: python examples/live_metrics_pipeline.py
"""

import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_dcp_kafka_spark import get_spark
from go_dcp_kafka_spark.gen import GenConfig, generate_change_events, write_change_log
from go_dcp_kafka_spark.streaming.metrics import ConnectorQueryListener, MetricsRegistry
from go_dcp_kafka_spark.streaming.runner import CdcPipeline


def main() -> None:
    spark = get_spark("example-metrics", master="local[4]", shuffle_partitions=8)

    res = generate_change_events(GenConfig(seed=3, n_convs=80, n_hot_convs=1, hot_turns=60, n_partitions=8))
    log_dir = tempfile.mkdtemp(prefix="changelog_")
    write_change_log(res.events, log_dir, n_files=6, evolution_boundary=res.meta["evolution_boundary"])

    registry = MetricsRegistry()
    listener = ConnectorQueryListener(registry, name_prefix="cdc-example")
    spark.streams.addListener(listener)

    base = tempfile.mkdtemp(prefix="table_")
    pipe = CdcPipeline(spark, base, run_id="example", metrics=registry)
    # print the gauges after every committed epoch (completionHandler analog)
    pipe.on_epoch_complete = lambda stats: print(f"epoch {stats['epoch']}: gauges={registry.snapshot()}")
    pipe.run_stream(log_dir, tempfile.mkdtemp(prefix="ckpt_"), max_files_per_trigger=2)

    time.sleep(1)  # let the last async progress event land
    spark.streams.removeListener(listener)
    print("\nfinal gauge snapshot:")
    for k, v in sorted(registry.snapshot().items()):
        print(f"  {k} = {v}")
    print("\nper-epoch lineage mirror (batch_latency_ms):")
    print(pipe.lineage.read()[["commit_epoch", "partition_id", "batch_latency_ms"]].tail(5).to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()
