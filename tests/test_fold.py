"""M1: the set-oriented distributed fold must equal the sequential oracle
exactly — per-turn text equality under stable (conv_id, turn_idx) ordering
(the BASELINE.json contract, generalizing the reference's final-count
integration check /root/reference/test/integration/integration_test.go:107)."""

import pandas as pd
from pyspark.sql import functions as F

from go_dcp_kafka_spark.gen import GenConfig, fold_oracle, generate_change_events
from go_dcp_kafka_spark.operators.fold import fold_change_events
from go_dcp_kafka_spark.sources.changelog import read_change_log
from tests.conftest import assert_frames_equal


def test_fold_matches_oracle(spark, gen_result, log_info):
    expected = fold_oracle(gen_result.events)
    events = read_change_log(spark, log_info["dir"])
    actual = fold_change_events(events).toPandas()
    assert_frames_equal(actual, expected)


def test_fold_no_rollback(spark, tmp_path):
    from go_dcp_kafka_spark.gen import write_change_log

    res = generate_change_events(GenConfig(seed=7, n_convs=80, rollback=False, n_partitions=8, evolution_frac=0.25))
    d = str(tmp_path / "log")
    write_change_log(res.events, d, n_files=4, evolution_boundary=res.meta["evolution_boundary"])
    expected = fold_oracle(res.events)
    actual = fold_change_events(read_change_log(spark, d)).toPandas()
    assert_frames_equal(actual, expected)


def test_fold_schema_evolution_nulls(spark, log_dir):
    """Early files lack `tool`; winners from the early half must surface
    tool=NULL, late winners the real value."""
    events = read_change_log(spark, log_dir)
    final = fold_change_events(events)
    tools = final.select(
        F.sum(F.col("tool").isNotNull().cast("int")).alias("with_tool"),
    ).collect()[0]
    assert tools["with_tool"] > 0


def test_no_python_row_udfs_in_plan(spark, log_dir):
    """Hot path stays JVM-side: no BatchEvalPython / row-at-a-time Python in
    the fold plan (SURVEY §7 'keeping everything vectorized')."""
    events = read_change_log(spark, log_dir)
    plan = fold_change_events(events)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "PythonUDF" not in plan


def test_fold_is_single_shuffle(spark, log_dir):
    """The LWW fold should shuffle exactly once (groupBy key with map-side
    partial agg); rollback invalidation must be a broadcast join."""
    events = read_change_log(spark, log_dir)
    plan = fold_change_events(events)._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, f"fold plan has {n_exchanges} hash exchanges:\n{plan[:4000]}"
    assert "BroadcastExchange" in plan or "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
