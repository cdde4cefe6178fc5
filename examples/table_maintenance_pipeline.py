"""Table-maintenance tour: the operational surface a long-lived CDC table
needs beyond merges.

Reference analog: the go-dcp metadata lifecycle (checkpoint Clear/compacted
topic GC, kafka_metadata.go:131-133) generalized to a lake table: time
travel, incremental (changelog) reads for downstream consumers, compaction
of MOR deltas, snapshot expiry, and bucket-count evolution as the table
grows.

Run: python examples/table_maintenance_pipeline.py
"""

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from go_dcp_kafka_spark import get_spark
from go_dcp_kafka_spark.gen import GenConfig, generate_change_events, write_change_log
from go_dcp_kafka_spark.streaming.runner import CdcPipeline


def main() -> None:
    spark = get_spark("example-maintenance", master="local[4]", shuffle_partitions=8)
    res = generate_change_events(GenConfig(seed=9, n_convs=120, n_partitions=8))
    log_dir = tempfile.mkdtemp(prefix="changelog_")
    write_change_log(res.events, log_dir, n_files=6,
                     evolution_boundary=res.meta["evolution_boundary"])

    # streaming default = merge-on-read; compact every 2 epochs, expire old
    # snapshots every 2 epochs keeping a 3-version time-travel window
    pipe = CdcPipeline(
        spark, tempfile.mkdtemp(prefix="table_"), run_id="maint",
        compact_every=2, expire_every=2, keep_snapshots=3,
    )
    pipe.run_stream(log_dir, tempfile.mkdtemp(prefix="ckpt_"), max_files_per_trigger=2)
    tbl = pipe.tables["transcripts"]

    print(f"\ncurrent version: {tbl.version()}  retained snapshots: {tbl.versions()}")
    print(f"rows now: {tbl.read().count()}")

    # time travel: any retained snapshot stays readable
    v0 = tbl.versions()[0]
    print(f"rows as of v{v0}: {tbl.read(version=v0).count()}")

    # incremental scan: what changed since v0 — the CDC feed a downstream
    # consumer reads instead of rescanning the table
    changes = tbl.read_changes(v0)
    print("\nchangelog since v%d by kind:" % v0)
    changes.groupBy("_change").count().show()

    # incremental view maintenance (r5): a downstream per-role aggregate is
    # MAINTAINED from the changelog's before/after images — O(changed
    # groups) per poll — instead of re-grouping the whole table
    from pyspark.sql import functions as F

    from go_dcp_kafka_spark.operators.ivm import maintain_agg
    from go_dcp_kafka_spark.table.snapshot import SnapshotTable

    view = SnapshotTable(spark, tempfile.mkdtemp(prefix="view_"), ("role",), num_buckets=2)
    view.overwrite(
        tbl.read(version=v0).groupBy("role").agg(
            F.count("*").alias("n_rows"),
            F.coalesce(F.sum("turn_idx"), F.lit(0)).alias("sum_turn_idx"),
            F.min("turn_idx").alias("min_turn_idx"),
            F.max("turn_idx").alias("max_turn_idx"),
        ),
        epoch_id="view-init",
    )
    # MIN/MAX ride the same delta shuffle; a recompute scan runs only on
    # epochs that retract a group's stored extremum without re-establishing
    # it (reported via recomputed_groups)
    stats = maintain_agg(
        tbl, view, v0, ["role"], ["turn_idx"], min_cols=["turn_idx"], max_cols=["turn_idx"]
    )
    print("recomputed_groups:", stats["recomputed_groups"])
    print("\nmaintained per-role view (equals a fresh GROUP BY):")
    view.read().orderBy("role").show()

    # per-bucket compaction (r5): fold only buckets whose outstanding delta
    # bytes reach a floor — on a table with hot buckets, the rewrite covers
    # the hot slice and cold deltas wait until they accumulate
    print("delta stats:", tbl.delta_stats())
    print("hot-bucket compact:", tbl.compact(min_bucket_bytes=256 * 1024))

    # metadata-only column rename (r5): no data rewrite — old-era files are
    # aliased at read; old snapshots keep the old name (requires compacted
    # deltas, so fold the rest first)
    tbl.compact()
    tbl.rename_column("tool", "tool_name")
    print(f"\nafter rename, columns: {tbl.read().columns}")

    # bucket evolution: the table outgrew its bucket count
    print(f"buckets before: {tbl.num_buckets}")
    tbl.rebucket(32)
    print(f"buckets after:  {tbl.num_buckets}  rows unchanged: {tbl.read().count()}")

    spark.stop()


if __name__ == "__main__":
    main()
