"""Generator invariants: the synthetic log must actually contain the
adversarial features the engine claims to survive (FIXTURES.md §1)."""

import numpy as np
import pandas as pd

from go_dcp_kafka_spark.gen import GenConfig, fold_oracle, generate_change_events


def test_deterministic(gen_result):
    again = generate_change_events(GenConfig(seed=42, n_convs=200, n_hot_convs=3, hot_turns=150, n_partitions=16))
    pd.testing.assert_frame_equal(gen_result.events, again.events)


def test_per_partition_order_except_replays(gen_result):
    ev = gen_result.events
    data = ev[ev["op"] != "rollback"]
    # duplicates exist
    dups = data.groupby(["partition_id", "seqno"]).size()
    assert (dups > 1).any(), "no duplicate deliveries generated"
    # rollback exists with a diverged branch
    assert gen_result.rollback_partition >= 0
    rb = ev[ev["op"] == "rollback"]
    assert len(rb) == 1 and rb["rollback_point"].iloc[0] == gen_result.rollback_point


def test_hot_key_skew(gen_result):
    ev = gen_result.events
    per_conv = ev[ev["conv_id"].notna()].groupby("conv_id").size()
    assert per_conv.max() > 20 * per_conv.median(), "no hot conversations"


def test_schema_evolution_files(log_dir):
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{log_dir}/chunk-*.parquet"))
    early = pq.read_schema(files[0]).names
    late = pq.read_schema(files[-1]).names
    assert "tool" not in early and "tool" in late


def test_oracle_basics(gen_result):
    final = fold_oracle(gen_result.events)
    assert len(final) > 0
    assert final.duplicated(["conv_id", "turn_idx"]).sum() == 0
    # diverged rollback branch must be visible in final state
    assert final["text"].str.startswith("rb/").any(), "rollback branch content missing from final state"
    # deleted keys absent: a key whose last event is deletion never appears
    ev = gen_result.events[gen_result.events["op"] != "rollback"]
    # sanity: some deletions were generated
    assert (ev["op"] == "deletion").any() and (ev["op"] == "expiration").any()


def test_partition_key_affinity(gen_result):
    """Every (conv_id, turn_idx) key must live in exactly one partition —
    the property that makes per-partition seqno a total order per key."""
    ev = gen_result.events
    data = ev[ev["conv_id"].notna()]
    nparts = data.groupby(["conv_id", "turn_idx"])["partition_id"].nunique()
    assert (nparts == 1).all()
