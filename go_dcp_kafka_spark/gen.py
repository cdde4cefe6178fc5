"""Deterministic synthetic change-event log generator + pandas fold oracle.

Mirrors the reference's integration-test strategy (seed a corpus, replay it,
assert exact final state — /root/reference/test/integration/integration_test.go:107,
test/couchbase/configure.sh) generalized from exact-count to exact-state, with
the adversarial features FIXTURES.md §1 calls for:

- **duplicates**: contiguous recent ranges of a partition re-emitted later
  (rebalance replay from last checkpoint — the reference drops the in-flight
  batch on rebalance and the new owner replays it,
  /root/reference/kafka/producer/producer_batch.go:68-75);
- **out-of-order across partitions** within delivery (seqno stays the
  per-partition ordering authority — DCP guarantees per-vbucket order);
- **rollback**: one partition truncates to ``rollback_point`` and re-emits a
  *diverged* branch with fresh seqnos (rollback mitigation,
  /root/reference/test/integration/integration_test.go:43-45);
- **schema evolution**: early files lack the ``tool`` column entirely;
- **hot-key skew**: a few conv_ids carry orders of magnitude more turns.

Everything is seeded numpy — no wall clock, no platform-dependent hashing.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field

import numpy as np
import pandas as pd

EPOCH_BASE = np.datetime64("2024-01-01T00:00:00", "us")

_MIX = np.uint64(0x9E3779B97F4A7C15)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mixer (splitmix64 finalizer), vectorized."""
    x = x.astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def key_partition(conv_idx: np.ndarray, turn_idx: np.ndarray, n_partitions: int) -> np.ndarray:
    """Document-key -> partition, the vbucket analog: Couchbase hashes the full
    document key to a vbucket (uint16 VbID, /root/reference/couchbase/event.go:16).
    All events of one (conv, turn) key land in one partition, which is what makes
    per-partition seqno a valid per-key ordering authority."""
    h = _mix64(conv_idx.astype(np.uint64) * np.uint64(1000003) + turn_idx.astype(np.uint64) * np.uint64(7919) + _MIX)
    return (h % np.uint64(n_partitions)).astype(np.int32)


_WORDS = np.array(
    "the quick brown fox jumps over lazy dog stream spark merge turn agent tool call reply plan act observe think".split()
)


def _texts(conv_idx: np.ndarray, turn_idx: np.ndarray, rev: np.ndarray, diverged: bool = False) -> np.ndarray:
    h = _mix64(conv_idx.astype(np.uint64) * np.uint64(2654435761) + turn_idx.astype(np.uint64) * np.uint64(40503) + rev.astype(np.uint64))
    w1 = _WORDS[(h % np.uint64(len(_WORDS))).astype(np.int64)]
    w2 = _WORDS[((h >> np.uint64(8)) % np.uint64(len(_WORDS))).astype(np.int64)]
    tag = "rb/" if diverged else ""
    return np.char.add(
        np.char.add(
            np.array([f"{tag}c"]).repeat(len(conv_idx)),
            conv_idx.astype("U12"),
        ),
        np.char.add(
            np.char.add(np.char.add(" t", turn_idx.astype("U8")), np.char.add(" r", rev.astype("U4"))),
            np.char.add(np.char.add(" ", w1), np.char.add(" ", w2)),
        ),
    )


@dataclass
class GenConfig:
    seed: int = 42
    n_convs: int = 300
    n_hot_convs: int = 3
    hot_turns: int = 400          # hot conv_ids with hundreds/thousands of turns
    max_turns: int = 8
    n_partitions: int = 32
    p_extra_rev: float = 0.25     # probability of a 2nd/3rd mutation revision
    p_delete: float = 0.06
    p_remutate: float = 0.4       # of deleted keys, re-mutated afterwards
    p_expire: float = 0.03
    n_dup_replays: int = 3        # rebalance-replay duplicate ranges
    dup_len: int = 40
    evolution_frac: float = 0.5   # `tool` column exists only after this point
    rollback: bool = True
    rollback_frac: float = 0.6    # truncate the victim partition at 60% of its stream
    roles: tuple = ("user", "assistant", "tool", "system")


@dataclass
class GenResult:
    events: pd.DataFrame
    rollback_partition: int = -1
    rollback_point: int = -1
    meta: dict = field(default_factory=dict)


def generate_change_events(cfg: GenConfig | None = None) -> GenResult:
    cfg = cfg or GenConfig()
    rng = np.random.default_rng(cfg.seed)

    # --- keys: (conv, turn) with Zipf-style hot conversations -----------------
    turns_per_conv = rng.integers(1, cfg.max_turns + 1, cfg.n_convs)
    hot = rng.choice(cfg.n_convs, size=min(cfg.n_hot_convs, cfg.n_convs), replace=False)
    turns_per_conv[hot] = cfg.hot_turns
    conv_of_key = np.repeat(np.arange(cfg.n_convs), turns_per_conv)
    offs = np.concatenate([[0], np.cumsum(turns_per_conv)])
    turn_of_key = np.arange(len(conv_of_key)) - np.repeat(offs[:-1], turns_per_conv)
    n_keys = len(conv_of_key)

    # --- per-key op script: revisions, optional delete/expire, re-mutation ----
    n_revs = 1 + (rng.random(n_keys) < cfg.p_extra_rev) + (rng.random(n_keys) < cfg.p_extra_rev * 0.3)
    del_kind = rng.random(n_keys)
    has_del = del_kind < cfg.p_delete
    has_exp = (del_kind >= cfg.p_delete) & (del_kind < cfg.p_delete + cfg.p_expire)
    has_remut = has_del & (rng.random(n_keys) < cfg.p_remutate)
    ev_per_key = n_revs + has_del + has_exp + has_remut

    key_of_ev = np.repeat(np.arange(n_keys), ev_per_key)
    k_offs = np.concatenate([[0], np.cumsum(ev_per_key)])
    ordinal = np.arange(len(key_of_ev)) - np.repeat(k_offs[:-1], ev_per_key)
    n_ev = len(key_of_ev)

    nrev_e = n_revs[key_of_ev]
    op = np.full(n_ev, "mutation", dtype=object)
    is_tomb = (ordinal == nrev_e) & (has_del[key_of_ev] | has_exp[key_of_ev])
    op[is_tomb & has_exp[key_of_ev]] = "expiration"
    op[is_tomb & has_del[key_of_ev]] = "deletion"
    rev_no = np.where(ordinal > nrev_e, nrev_e + 1, np.minimum(ordinal + 1, nrev_e)).astype(np.int64)

    conv_e = conv_of_key[key_of_ev]
    turn_e = turn_of_key[key_of_ev]
    partition = key_partition(conv_e, turn_e, cfg.n_partitions)

    # --- logical time: random per event, sorted within key so revisions ascend
    raw_t = rng.random(n_ev)
    by_key_time = np.lexsort((raw_t, key_of_ev))
    by_key_ord = np.lexsort((ordinal, key_of_ev))
    ltime = np.empty(n_ev)
    ltime[by_key_ord] = raw_t[by_key_time]

    # --- per-partition seqno: rank by logical time within partition -----------
    order_pt = np.lexsort((ltime, partition))
    seqno = np.empty(n_ev, dtype=np.int64)
    pos_in_part = np.arange(n_ev) - np.searchsorted(partition[order_pt], partition[order_pt])
    seqno[order_pt] = pos_in_part + 1

    base = pd.DataFrame(
        {
            "partition_id": partition,
            "seqno": seqno,
            "op": op,
            "conv_idx": conv_e,
            "turn_idx": turn_e.astype(np.int32),
            "rev_no": rev_no,
            "ltime": ltime,
        }
    )
    # delivery order = global logical time (per-partition ascending holds)
    base = base.sort_values("ltime", kind="mergesort").reset_index(drop=True)

    # --- duplicates: re-emit a contiguous recent range of a partition ---------
    parts = np.unique(partition)
    rb_part = int(rng.choice(parts)) if cfg.rollback else -1
    dup_pool = [int(p) for p in parts if p != rb_part]
    dup_parts = list(rng.choice(dup_pool, size=min(cfg.n_dup_replays, len(dup_pool)), replace=False))
    chunks = [base]
    for dp in dup_parts:
        idx = base.index[base["partition_id"] == dp].to_numpy()
        if len(idx) < 4:
            continue
        end = int(rng.integers(len(idx) // 2, len(idx)))
        start = max(0, end - cfg.dup_len)
        replay = base.loc[idx[start:end]].copy()
        chunks.append(replay)  # appended after the original stream (late replay)
    stream = pd.concat(chunks, ignore_index=True)

    # --- rollback: truncate victim partition, deliver a diverged branch -------
    rb_point = -1
    if cfg.rollback and rb_part >= 0:
        vict = stream[stream["partition_id"] == rb_part].sort_values("seqno")
        if len(vict) >= 5:
            cut = int(len(vict) * cfg.rollback_frac)
            rb_point = int(vict["seqno"].iloc[cut - 1])
            old_branch = vict[vict["seqno"] > rb_point]
            # new branch covers every key touched in the rolled-back range with
            # diverged content (last old-branch event per key, re-sequenced)
            nb = old_branch.groupby(["conv_idx", "turn_idx"], sort=False).tail(1).copy()
            nb = nb.sort_values("seqno").reset_index(drop=True)
            nb["seqno"] = rb_point + 1 + np.arange(len(nb), dtype=np.int64)
            nb["rev_no"] = nb["rev_no"] + 1000  # diverged revision line
            marker = pd.DataFrame(
                {
                    "partition_id": [rb_part],
                    "seqno": [rb_point],
                    "op": ["rollback"],
                    "conv_idx": [-1],
                    "turn_idx": [np.int32(-1)],
                    "rev_no": [np.int64(0)],
                    "ltime": [2.0],
                }
            )
            stream = pd.concat([stream, marker, nb], ignore_index=True)

    # --- materialize payload columns ------------------------------------------
    n = len(stream)
    stream["delivery_seq"] = np.arange(n, dtype=np.int64)
    conv_i = stream["conv_idx"].to_numpy()
    turn_i = stream["turn_idx"].to_numpy().astype(np.int64)
    rev_i = stream["rev_no"].to_numpy()
    is_mut = (stream["op"] == "mutation").to_numpy()
    is_ctl = (stream["op"] == "rollback").to_numpy()
    diverged = rev_i >= 1000

    conv_id = np.where(conv_i >= 0, np.char.add("conv-", conv_i.astype("U10")), None)
    role_cycle = np.array(cfg.roles, dtype=object)
    role = role_cycle[(_mix64(conv_i.astype(np.uint64) * np.uint64(31) + turn_i.astype(np.uint64)) % np.uint64(4)).astype(np.int64)]
    text = np.where(diverged, _texts(conv_i, turn_i, rev_i, diverged=True), _texts(conv_i, turn_i, rev_i))
    tool = np.where(role == "tool", np.char.add("tool-", (turn_i % 7).astype("U2")), None)

    out = pd.DataFrame(
        {
            "partition_id": stream["partition_id"].astype(np.int32),
            "seqno": stream["seqno"].astype(np.int64),
            "delivery_seq": stream["delivery_seq"],
            "op": stream["op"].astype(object),
            "conv_id": pd.array(np.where(is_ctl, None, conv_id), dtype=object),
            "turn_idx": stream["turn_idx"].astype("Int32"),
            "rev_no": stream["rev_no"].astype(np.int64),
            "event_time": EPOCH_BASE + (np.arange(n) * 1000).astype("timedelta64[us]"),
            "role": pd.array(np.where(is_mut, role, None), dtype=object),
            "text": pd.array(np.where(is_mut, text, None), dtype=object),
            "tool": pd.array(np.where(is_mut, tool, None), dtype=object),
            "ts": EPOCH_BASE + (stream["ltime"].to_numpy() * 86_400_000_000).astype("timedelta64[us]"),
            "rollback_point": pd.array(np.where(is_ctl, stream["seqno"], None), dtype="Int64"),
        }
    )
    out.loc[is_ctl, ["turn_idx"]] = pd.NA
    out.loc[is_ctl, ["seqno"]] = rb_point if rb_point >= 0 else 0

    # schema evolution: `tool` starts existing mid-stream. Presence is a
    # property of the EVENT, shared by duplicate re-deliveries of it (a
    # replay carries the identical payload), so key on first delivery.
    boundary = 0
    if cfg.evolution_frac and 0.0 < cfg.evolution_frac < 1.0:
        boundary = int(n * cfg.evolution_frac)
        first_delivery = out.groupby(["partition_id", "seqno"])["delivery_seq"].transform("min")
        out.loc[first_delivery < boundary, "tool"] = None

    return GenResult(
        events=out,
        rollback_partition=rb_part if rb_point >= 0 else -1,
        rollback_point=rb_point,
        meta={"n_events": n, "n_keys": n_keys, "dup_parts": dup_parts, "evolution_boundary": boundary},
    )


def write_change_log(
    events: pd.DataFrame,
    out_dir: str,
    n_files: int = 8,
    evolution_boundary: int | None = None,
) -> dict:
    """Write the stream as ordered parquet files (the simulated tail).

    Files entirely before ``evolution_boundary`` (a delivery_seq, from
    GenResult.meta) OMIT the ``tool`` column entirely — the mid-stream
    schema-evolution fixture. Readers use the full CHANGE_EVENT_SCHEMA and
    get nulls for the missing column. Rows in those files have tool=None by
    construction (see generate_change_events), so the drop is lossless.
    """
    os.makedirs(out_dir, exist_ok=True)
    n = len(events)
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    boundary = n if evolution_boundary is None else evolution_boundary
    paths = []
    for i in range(n_files):
        chunk = events.iloc[bounds[i] : bounds[i + 1]]
        if bounds[i + 1] <= boundary:
            assert chunk["tool"].isna().all()
            chunk = chunk.drop(columns=["tool"])
        p = os.path.join(out_dir, f"chunk-{i:05d}.parquet")
        chunk.to_parquet(p, index=False)
        # Spark's file stream source orders by modification time; pin mtimes
        # so streamed micro-batch order == delivery order deterministically.
        t = 1_700_000_000 + i * 10
        os.utime(p, (t, t))
        paths.append(p)
    with open(os.path.join(out_dir, "_gen_meta.json"), "w") as f:
        json.dump({"n_events": n, "n_files": n_files, "evolution_boundary": boundary}, f)
    return {"paths": paths, "evolution_boundary": boundary}


def write_change_log_json(
    events: pd.DataFrame,
    out_dir: str,
    n_files: int = 8,
    evolution_boundary: int | None = None,
) -> dict:
    """JSON-lines twin of write_change_log — the Kafka/Debezium wire format
    (timestamps as ISO-8601 strings, schema-evolution files omit the
    ``tool`` key entirely). Readers parse with CHANGE_EVENT_SCHEMA via
    sources.changelog.read_change_log_json / stream_change_log_json."""
    os.makedirs(out_dir, exist_ok=True)
    n = len(events)
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    boundary = n if evolution_boundary is None else evolution_boundary
    paths = []
    for i in range(n_files):
        chunk = events.iloc[bounds[i] : bounds[i + 1]]
        if bounds[i + 1] <= boundary:
            assert chunk["tool"].isna().all()
            chunk = chunk.drop(columns=["tool"])
        p = os.path.join(out_dir, f"chunk-{i:05d}.jsonl")
        chunk.to_json(p, orient="records", lines=True, date_format="iso", date_unit="us")
        t = 1_700_000_000 + i * 10
        os.utime(p, (t, t))
        paths.append(p)
    with open(os.path.join(out_dir, "_gen_meta.json"), "w") as f:
        json.dump({"n_events": n, "n_files": n_files, "evolution_boundary": boundary}, f)
    return {"paths": paths, "evolution_boundary": boundary}


#: The flagship fixture used by __spark_entry__ (queries + oracle twin).
FLAGSHIP_CONFIG = dict(seed=42, n_convs=400, n_hot_convs=4, hot_turns=200, n_partitions=32)


def materialize_flagship_log(path: str | None = None) -> str:
    """Write the deterministic flagship change log as ONE parquet file and
    return its path. Idempotent + atomic (tmp file, os.replace), so both the
    Spark query and the DuckDB oracle — in either order, even in different
    processes — see the identical fixture. Avoids driver-side
    createDataFrame entirely (round-1 lesson: pandas nullable Int32 degrades
    to float64 under a non-Arrow session and IntegerType rejects it)."""
    import tempfile

    if path is None:
        tag = "_".join(f"{k}{v}" for k, v in sorted(FLAGSHIP_CONFIG.items()))
        fname = f"gdks_flagship_log_{tag}.parquet"
        # repo-local cache first: the Spark-query and DuckDB-oracle sides may
        # run with different TMPDIRs; a path anchored to this package is the
        # same in both. Fall back to the system tempdir if not writable.
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
        try:
            os.makedirs(cache, exist_ok=True)
            path = os.path.join(cache, fname)
        except OSError:
            path = os.path.join(tempfile.gettempdir(), fname)
    if os.path.exists(path):
        return path
    res = generate_change_events(GenConfig(**FLAGSHIP_CONFIG))
    tmp = f"{path}.tmp.{os.getpid()}"
    res.events.to_parquet(tmp, index=False)
    os.replace(tmp, path)
    return path


#: Fixture for the schema-evolution driver query: mid-stream ``tool`` column
#: arrival (M4's headline feature) exercised through the multi-file log
#: where early files PHYSICALLY lack the column.
EVOLVED_CONFIG = dict(seed=77, n_convs=250, n_hot_convs=2, hot_turns=120, n_partitions=16)
EVOLVED_N_FILES = 6


def materialize_evolved_log(path: str | None = None) -> str:
    """Write the deterministic schema-evolution change log as a DIRECTORY of
    parquet files where files before the evolution boundary omit ``tool``
    entirely (write_change_log's fixture behavior). Idempotent + atomic
    (tmp dir, os.replace) so the Spark query and the DuckDB oracle
    (read_parquet(..., union_by_name=true)) see the identical fixture."""
    import tempfile

    if path is None:
        tag = "_".join(f"{k}{v}" for k, v in sorted(EVOLVED_CONFIG.items()))
        dname = f"gdks_evolved_log_{tag}"
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
        try:
            os.makedirs(cache, exist_ok=True)
            path = os.path.join(cache, dname)
        except OSError:
            path = os.path.join(tempfile.gettempdir(), dname)
    if os.path.exists(os.path.join(path, "_gen_meta.json")):
        return path
    res = generate_change_events(GenConfig(**EVOLVED_CONFIG))
    tmp = f"{path}.tmp.{os.getpid()}"
    write_change_log(
        res.events, tmp, n_files=EVOLVED_N_FILES,
        evolution_boundary=res.meta["evolution_boundary"],
    )
    try:
        os.replace(tmp, path)
    except OSError:
        # another process won the race; its fixture is byte-identical
        import shutil as _sh

        _sh.rmtree(tmp, ignore_errors=True)
    return path


def materialize_widening_log(path: str | None = None) -> str:
    """Fixture for the TYPE-WIDENING driver query: a directory with two
    parquet change files over key ``k`` where the early file writes
    ``x:int32`` / ``f:float32`` and the late file re-writes a subset of keys
    as ``x:int64`` (values past 2^31) / ``f:float64`` — the Iceberg
    int->long / float->double promotion mid-stream. Idempotent + atomic so
    the Spark query and the DuckDB oracle (read_parquet union_by_name,
    which widens the same way) see the identical fixture. ``f`` values are
    halves (exactly representable in float32) so the upcast is bit-exact."""
    import tempfile

    import numpy as np

    if path is None:
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
        try:
            os.makedirs(cache, exist_ok=True)
            path = os.path.join(cache, "gdks_widening_log_v1")
        except OSError:
            path = os.path.join(tempfile.gettempdir(), "gdks_widening_log_v1")
    if os.path.exists(os.path.join(path, "part-1.parquet")):
        return path
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    k = np.arange(50, dtype=np.int64)
    early = pd.DataFrame(
        {
            "k": k,
            "seqno": np.ones(50, dtype=np.int64),
            "x": (k * 3).astype(np.int32),
            "f": (k.astype(np.float32) / 2.0).astype(np.float32),
        }
    )
    late_k = k[k % 5 == 0]
    late = pd.DataFrame(
        {
            "k": late_k,
            "seqno": np.full(len(late_k), 2, dtype=np.int64),
            "x": (late_k + 5_000_000_000).astype(np.int64),
            "f": (late_k.astype(np.float64) + 0.5),
        }
    )
    early.to_parquet(os.path.join(tmp, "part-0.parquet"), index=False)
    late.to_parquet(os.path.join(tmp, "part-1.parquet"), index=False)
    try:
        os.replace(tmp, path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def materialize_changes_fixture(path: str | None = None) -> str:
    """Fixture for the INCREMENTAL-CHANGELOG driver query
    (q:cdc_read_changes): ``part-0.parquet`` is the initial table state over
    key ``k``; ``part-1.parquet`` is one CDC epoch of ops against it —
    value-changing updates (k%10==0), NO-OP updates rewriting identical
    values (k%10==5; a correct diff reports NOTHING for these), inserts
    (k 200..219) and deletes (k%20==3). Idempotent + atomic so the Spark
    query (SnapshotTable.read_changes between the two committed versions)
    and the DuckDB oracle (full-outer diff of the folded states) see the
    identical fixture."""
    import tempfile

    import numpy as np

    if path is None:
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".cache")
        try:
            os.makedirs(cache, exist_ok=True)
            path = os.path.join(cache, "gdks_changes_fixture_v1")
        except OSError:
            path = os.path.join(tempfile.gettempdir(), "gdks_changes_fixture_v1")
    if os.path.exists(os.path.join(path, "part-1.parquet")):
        return path
    tmp = f"{path}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    k = np.arange(200, dtype=np.int64)
    base = pd.DataFrame({"k": k, "v": [f"v{i}" for i in k], "n": k * 7})
    upd_k = k[k % 10 == 0]
    noop_k = k[k % 10 == 5]
    ins_k = np.arange(200, 220, dtype=np.int64)
    del_k = k[k % 20 == 3]
    ops = pd.concat(
        [
            pd.DataFrame({"k": upd_k, "op": "mutation", "v": [f"u{i}" for i in upd_k], "n": upd_k * 7 + 1}),
            pd.DataFrame({"k": noop_k, "op": "mutation", "v": [f"v{i}" for i in noop_k], "n": noop_k * 7}),
            pd.DataFrame({"k": ins_k, "op": "mutation", "v": [f"new{i}" for i in ins_k], "n": ins_k * 7}),
            pd.DataFrame({"k": del_k, "op": "deletion", "v": None, "n": np.int64(0)}),
        ],
        ignore_index=True,
    )
    ops["n"] = ops["n"].astype("int64")
    base.to_parquet(os.path.join(tmp, "part-0.parquet"), index=False)
    ops.to_parquet(os.path.join(tmp, "part-1.parquet"), index=False)
    try:
        os.replace(tmp, path)
    except OSError:
        import shutil

        shutil.rmtree(tmp, ignore_errors=True)
    return path


def fold_oracle(events: pd.DataFrame) -> pd.DataFrame:
    """Sequential reference fold: the semantics the distributed engine must
    reproduce exactly. Applies events in delivery order with per-partition
    HWM dedup, rollback truncation, and LWW upsert/delete per key —
    the behavior of replaying the reference connector into a keyed table."""
    state: dict = {}
    hwm: dict = {}
    df = events.sort_values("delivery_seq")
    cols = ["partition_id", "seqno", "op", "conv_id", "turn_idx", "role", "text", "tool", "ts", "rollback_point"]
    for p_id, seqno, op, conv, turn, role, text, tool, ts, rbp in df[cols].itertuples(index=False, name=None):
        if op == "rollback":
            hwm[p_id] = min(hwm.get(p_id, -1), int(rbp))
            continue
        if seqno <= hwm.get(p_id, -1):
            continue
        hwm[p_id] = seqno
        key = (conv, int(turn))
        if op == "mutation":
            state[key] = (role, text, tool if tool is not None and tool is not pd.NA else None, ts)
        else:
            state.pop(key, None)
    rows = [
        {"conv_id": k[0], "turn_idx": k[1], "role": v[0], "text": v[1], "tool": v[2], "ts": v[3]}
        for k, v in state.items()
    ]
    res = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])
    return res.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
