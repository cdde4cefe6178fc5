"""T4 membership: two connector instances, each owning a disjoint partition
subset, concurrently merging into ONE shared table — the reference's
multi-instance deployment (vbuckets split by membership, all producing to
one topic). Final state must equal the single-instance oracle."""

import threading

from pyspark.sql import functions as F

from go_dcp_kafka_spark.functions.mapper import filter_mapper
from go_dcp_kafka_spark.gen import fold_oracle
from go_dcp_kafka_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
from go_dcp_kafka_spark.streaming.runner import DEFAULT_TARGET, CdcPipeline
from go_dcp_kafka_spark.table.snapshot import SnapshotTable
from tests.conftest import assert_frames_equal


def test_two_instances_disjoint_partitions_shared_table(spark, gen_result, log_info, tmp_path):
    shared = SnapshotTable(
        spark, str(tmp_path / "shared"), KEY_COLS, 8, schema=TRANSCRIPT_SCHEMA
    )
    errors = []

    def instance(i: int):
        try:
            pipe = CdcPipeline(
                spark,
                str(tmp_path / f"inst{i}"),
                tables={DEFAULT_TARGET: shared},
                mapper=filter_mapper(F.col("partition_id") % 2 == i),
                run_id=f"inst{i}",
            )
            pipe.run_stream(log_info["dir"], str(tmp_path / f"ck{i}"), max_files_per_trigger=3)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=instance, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    assert_frames_equal(shared.read().toPandas(), fold_oracle(gen_result.events))


def test_two_instances_separate_table_handles(spark, gen_result, log_info, tmp_path):
    """Same scenario but each instance constructs its OWN SnapshotTable
    handle on the shared path — the real multi-process deployment shape.
    Writer coordination is flock (same host) + the version-CAS commit
    (cross-host backstop); no shared in-process lock object exists."""
    shared_path = str(tmp_path / "shared")
    errors = []

    def instance(i: int):
        try:
            own_handle = SnapshotTable(
                spark, shared_path, KEY_COLS, 8, schema=TRANSCRIPT_SCHEMA
            )
            pipe = CdcPipeline(
                spark,
                str(tmp_path / f"inst{i}"),
                tables={DEFAULT_TARGET: own_handle},
                mapper=filter_mapper(F.col("partition_id") % 2 == i),
                run_id=f"sep{i}",
                merge_mode="cow",  # COW: concurrent bucket rewrites, the hard case
            )
            pipe.run_stream(log_info["dir"], str(tmp_path / f"ck{i}"), max_files_per_trigger=3)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=instance, args=(i,)) for i in (0, 1)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    reader = SnapshotTable(spark, shared_path, KEY_COLS, 8, schema=TRANSCRIPT_SCHEMA)
    assert_frames_equal(reader.read().toPandas(), fold_oracle(gen_result.events))
