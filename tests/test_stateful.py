"""applyInPandasWithState HWM dedup: the stateful-streaming path must
produce the same final state as the oracle when followed by the LWW fold."""

import os

from pyspark.sql import functions as F

from go_dcp_kafka_spark.operators.fold import fold_change_events
from go_dcp_kafka_spark.sources.changelog import read_change_log
from go_dcp_kafka_spark.streaming.stateful import run_stateful_dedup_to_parquet
from tests.conftest import assert_frames_equal


def _assert_deduped(deduped, rollback_partition):
    """(partition, seqno) unique downstream — except the rollback partition,
    where the replayed branch legitimately reuses seqnos > rollback_point
    (invalidated downstream via the emitted marker)."""
    dups = (
        deduped.filter(F.col("op") != "rollback")
        .groupBy("partition_id", "seqno")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dups.filter(F.col("partition_id") != rollback_partition).count() == 0
    # markers travel with the stream
    assert deduped.filter(F.col("op") == "rollback").count() >= 1


def test_stateful_dedup_then_fold_matches_oracle(spark, gen_result, log_info, tmp_path):
    from go_dcp_kafka_spark.gen import fold_oracle

    out = str(tmp_path / "deduped")
    run_stateful_dedup_to_parquet(
        spark, log_info["dir"], out, str(tmp_path / "ck"), max_files_per_trigger=2
    )
    deduped = read_change_log(spark, out)
    _assert_deduped(deduped, gen_result.rollback_partition)
    # deduped stream + fold (incl rollback invalidation) == oracle
    assert_frames_equal(fold_change_events(deduped).toPandas(), fold_oracle(gen_result.events))


def test_stateful_dedup_resume(spark, gen_result, log_info, tmp_path):
    """State survives restart: drain half, then the rest with the same
    checkpoint; no re-emission, same final state."""
    import glob
    import shutil

    from go_dcp_kafka_spark.gen import fold_oracle

    files = sorted(glob.glob(os.path.join(log_info["dir"], "chunk-*.parquet")))
    src = str(tmp_path / "src")
    os.makedirs(src)
    for f in files[:4]:
        shutil.copy2(f, src)
    out, ck = str(tmp_path / "deduped"), str(tmp_path / "ck")
    run_stateful_dedup_to_parquet(spark, src, out, ck, max_files_per_trigger=1)
    for f in files[4:]:
        shutil.copy2(f, src)
    run_stateful_dedup_to_parquet(spark, src, out, ck, max_files_per_trigger=1)

    deduped = read_change_log(spark, out)
    _assert_deduped(deduped, gen_result.rollback_partition)
    assert_frames_equal(fold_change_events(deduped).toPandas(), fold_oracle(gen_result.events))
