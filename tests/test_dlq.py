"""Dead-letter queue exactly-once + retention (r3 verdict item 2).

The reference's rejection sink is at-least-once (a Kafka append per failed
message, rejection_log_sink_response_handler.go:36-76). This engine's north
rule is exactly-once state — the DLQ included: each (epoch, stage) writes a
keyed dir with overwrite semantics, so crash-replay rewrites instead of
appending duplicates.
"""

import glob
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from go_dcp_kafka_spark.streaming.checkpoints import CheckpointStore
from go_dcp_kafka_spark.streaming.runner import CdcPipeline, _dlq_dir_name


def _read_rej(base):
    files = glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)
    if not files:
        return pd.DataFrame()
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def test_dlq_exactly_once_across_crash_replay(spark, log_dir, tmp_path, monkeypatch):
    """Crash AFTER the DLQ write but BEFORE the checkpoint commit; restart
    re-delivers the epoch — rejection rows must not duplicate."""
    crashed = {"done": False}
    orig = CheckpointStore.commit

    def exploding(self, dirty, epoch_id):
        if not crashed["done"]:
            crashed["done"] = True
            raise RuntimeError("injected crash after DLQ write, before checkpoint")
        return orig(self, dirty, epoch_id)

    monkeypatch.setattr(CheckpointStore, "commit", exploding)
    base = str(tmp_path / "t")
    validate = F.col("turn_idx") < 50  # rejects every hot-conv tail turn
    pipe = CdcPipeline(spark, base, run_id="dlqx", validate=validate)
    with pytest.raises(Exception):
        pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    assert crashed["done"]
    first = _read_rej(base)
    assert len(first) > 0, "crash injected before any rejection was written"

    pipe2 = CdcPipeline(spark, base, run_id="dlqx", validate=validate)
    pipe2.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    after = _read_rej(base)

    # control: identical run with NO crash — the crash-replayed DLQ must be
    # row-identical (the re-delivered epoch REWROTE its keyed dir; an
    # append-mode DLQ would hold the first epoch's rows twice)
    base2 = str(tmp_path / "control")
    ctrl = CdcPipeline(spark, base2, run_id="dlqx", validate=validate)
    ctrl.run_stream(log_dir, str(tmp_path / "ck2"), max_files_per_trigger=8)
    control = _read_rej(base2)
    key = ["conv_id", "turn_idx", "commit_epoch_key", "error_class"]
    a = after[key].sort_values(key).reset_index(drop=True)
    c = control[key].sort_values(key).reset_index(drop=True)
    assert len(a) == len(c), f"crash replay changed DLQ row count: {len(a)} vs {len(c)}"
    assert a.equals(c), "crash replay duplicated or altered rejection rows"
    # and the reader surface agrees
    assert len(pipe2.read_rejections().toPandas()) == len(after)


def test_dlq_retention_prunes_old_epoch_dirs(spark, log_dir, tmp_path):
    """dlq_retention_epochs drops rejection dirs far behind the newest
    rejection epoch on the expire cadence (bounded small files on a
    long-running stream)."""
    base = str(tmp_path / "t")
    pipe = CdcPipeline(
        spark, base, run_id="dlqr",
        validate=F.col("turn_idx") < 50,
        dlq_retention_epochs=1,
        expire_every=1,
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=2)
    rej_root = os.path.join(base, "_rejections")
    dirs = sorted(os.listdir(rej_root))
    epochs = sorted(int(d.split("-")[-2]) for d in dirs)
    assert epochs, "no rejection dirs at all"
    assert max(epochs) - min(epochs) <= 1, f"retention did not prune: {dirs}"


def test_dlq_dir_name_stable_and_parseable():
    assert _dlq_dir_name("run:7", "guard") == "run-000000000007-guard"
    assert _dlq_dir_name("run:7@tableA", "route") == "run_tableA-000000000007-route"
    assert _dlq_dir_name("batch-0", "decode") == "batch-0-decode"


def test_two_routed_tables_compact_independently(spark, log_dir, tmp_path):
    """ADVICE r3 (medium): per-table compaction counters — each routed
    table compacts on its OWN compact_every schedule, not N× too often with
    only one table ever winning."""
    from go_dcp_kafka_spark.functions.mapper import compose, default_mapper, route_mapper
    from go_dcp_kafka_spark.schema import KEY_COLS, TRANSCRIPT_SCHEMA
    from go_dcp_kafka_spark.table.snapshot import SnapshotTable

    base = str(tmp_path / "t")
    tables = {
        "user_turns": SnapshotTable(spark, f"{base}/user_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
        "agent_turns": SnapshotTable(spark, f"{base}/agent_turns", KEY_COLS, 4, schema=TRANSCRIPT_SCHEMA),
    }
    pipe = CdcPipeline(
        spark, base, tables=tables, run_id="2tc",
        mapper=compose(
            default_mapper,
            route_mapper({"user": "user_turns", "assistant": "agent_turns",
                          "tool": "agent_turns", "system": "agent_turns"}),
        ),
        merge_mode="mor", compact_every=2,
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=2)
    # 4 epochs, compact_every=2: BOTH tables compacted (≤1 outstanding delta
    # each); the old shared counter compacted one table every single epoch
    # and the other never
    for name in tables:
        n_deltas = len(tables[name]._load_manifest()["deltas"])
        assert n_deltas <= 1, f"{name} has {n_deltas} outstanding deltas"
    assert set(pipe._epochs_since_compact) == {"user_turns", "agent_turns"}


def test_epoch_stats_carry_rejection_counts(spark, log_dir, tmp_path):
    """last_stats exposes per-stage rejection counts (the reference's
    per-class rejection metrics, metric/collector.go) — derived from the
    written DLQ parquet footers, zero extra Spark jobs."""
    pipe = CdcPipeline(
        spark, str(tmp_path / "t"), run_id="dlqm", validate=F.col("turn_idx") < 50
    )
    pipe.run_stream(log_dir, str(tmp_path / "ck"), max_files_per_trigger=8)
    n_rej = pipe.last_stats.get("n_rejected", {})
    assert n_rej.get("guard", 0) > 0
    # counts agree with the DLQ contents
    total_rows = len(_read_rej(str(tmp_path / "t")))
    assert sum(n_rej.values()) <= total_rows  # last epoch's counts vs all epochs


def test_dlq_retention_is_per_stream(spark, log_dir, tmp_path):
    """A restarted pipeline (new run_id, epochs restarting at 0) must not
    have its fresh rejection dirs pruned by a previous run's higher epoch
    numbers (r4 review)."""
    import shutil

    base = str(tmp_path / "t")
    pipe = CdcPipeline(
        spark, base, run_id="runA",
        validate=F.col("turn_idx") < 50, dlq_retention_epochs=2, expire_every=1,
    )
    pipe.run_stream(log_dir, str(tmp_path / "ckA"), max_files_per_trigger=4)
    rej_root = os.path.join(base, "_rejections")
    a_dirs = [d for d in os.listdir(rej_root) if d.startswith("runA")]
    assert a_dirs
    # simulate a high-epoch history for runA, then a fresh runB from epoch 0
    src = os.path.join(rej_root, a_dirs[0])
    shutil.copytree(src, os.path.join(rej_root, a_dirs[0].replace(a_dirs[0].split("-")[-2], "000000000999")))
    pipe2 = CdcPipeline(
        spark, base, run_id="runB",
        validate=F.col("turn_idx") < 50, dlq_retention_epochs=2, expire_every=1,
    )
    pipe2.run_stream(log_dir, str(tmp_path / "ckB"), max_files_per_trigger=4)
    dirs = os.listdir(rej_root)
    b_epochs = [int(d.split("-")[-2]) for d in dirs if d.startswith("runB-")]
    # runB's low epoch numbers survive runA's 999 (per-stream comparison);
    # a global newest would have pruned every runB dir (all < 999-2)
    assert b_epochs and min(b_epochs) <= 1, f"runB dirs pruned by runA's epochs: {dirs}"
