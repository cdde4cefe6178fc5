"""Per-partition high-watermark checkpoint store.

The analog of the reference's metadata backend: a tiny keyed table of
``partition_id -> (hwm_seqno, commit_epoch)`` saved **dirty-only** (only
partitions touched in the epoch are rewritten — write elision,
/root/reference/kafka/metadata/kafka_metadata.go:29-31), loaded
**last-write-wins** with **empty-document backfill** for unseen partitions
(kafka_metadata.go:104-126).

The reference stores these as JSON docs in a compacted Kafka topic — O(live
keys) state, not O(history). Ours is a single parquet file swapped atomically
(the table is at most #partitions rows: 1024 at Couchbase scale — driver-side
pandas, never a Spark job; spending a distributed job on a 1 KB table would
be the wrong side of the driver/executor split)."""

from __future__ import annotations

import json
import os

import pandas as pd

from go_dcp_kafka_spark.table.snapshot import _epoch_num

_STATE = "checkpoints.parquet"
_META = "_ckpt_meta.json"


class CheckpointStore:
    #: Retained epoch ids in the meta file; older numeric epochs are covered
    #: by the per-stream watermark (same bounded-metadata treatment as
    #: SnapshotTable — a long stream must not serialize O(total-epochs) JSON
    #: per commit).
    EPOCH_RETENTION = 64

    def __init__(self, path: str, epoch_retention: int = EPOCH_RETENTION) -> None:
        self.path = path
        self.epoch_retention = max(int(epoch_retention), 1)
        os.makedirs(path, exist_ok=True)

    def _state_path(self) -> str:
        return os.path.join(self.path, _STATE)

    def load(self) -> pd.DataFrame:
        """Current HWM per partition (LWW state). Columns:
        partition_id:int32, hwm_seqno:int64, commit_epoch:int64."""
        p = self._state_path()
        if not os.path.exists(p):
            return pd.DataFrame(
                {"partition_id": pd.Series(dtype="int32"),
                 "hwm_seqno": pd.Series(dtype="int64"),
                 "commit_epoch": pd.Series(dtype="int64")}
            )
        return pd.read_parquet(p)

    def load_backfilled(self, all_partitions: list[int]) -> pd.DataFrame:
        """LWW load + empty-checkpoint backfill: partitions never seen get
        hwm=-1 (NewEmptyCheckpointDocument analog, kafka_metadata.go:121-126)."""
        cur = self.load()
        missing = sorted(set(all_partitions) - set(cur["partition_id"].tolist()))
        if missing:
            fill = pd.DataFrame(
                {"partition_id": pd.array(missing, dtype="int32"),
                 "hwm_seqno": pd.array([-1] * len(missing), dtype="int64"),
                 "commit_epoch": pd.array([-1] * len(missing), dtype="int64")}
            )
            cur = pd.concat([cur, fill], ignore_index=True)
        return cur.sort_values("partition_id").reset_index(drop=True)

    def hwm_map(self) -> dict[int, int]:
        cur = self.load()
        return dict(zip(cur["partition_id"].astype(int), cur["hwm_seqno"].astype(int)))

    def _meta(self) -> dict:
        p = os.path.join(self.path, _META)
        if not os.path.exists(p):
            return {"committed_epochs": [], "watermarks": {}}
        with open(p) as f:
            meta = json.load(f)
        meta.setdefault("watermarks", {})
        return meta

    def committed_epochs(self) -> set[str]:
        """Epoch ids in the retained window (recent commits). Use
        ``is_committed`` for the exactly-once check — it also consults the
        per-stream watermark covering evicted entries."""
        return set(self._meta()["committed_epochs"])

    def is_committed(self, epoch_id: str) -> bool:
        meta = self._meta()
        epoch_id = str(epoch_id)
        if epoch_id in meta["committed_epochs"]:
            return True
        stream, n = _epoch_num(epoch_id)
        if stream is None:
            return False
        wm = meta["watermarks"].get(stream)
        return wm is not None and n <= int(wm)

    def commit(self, dirty: pd.DataFrame, epoch_id: str) -> None:
        """Upsert ONLY the dirty partitions (write elision) and record the
        epoch; atomic file swap. ``dirty`` columns: partition_id, hwm_seqno.

        Note hwm may move DOWN for a partition that saw a rollback marker —
        truncation must persist so later-delivered replay-branch events
        (seqno <= old hwm) are not misclassified as duplicates."""
        epoch_id = str(epoch_id)
        if self.is_committed(epoch_id):
            return
        cur = self.load()
        dirty = dirty[["partition_id", "hwm_seqno"]].copy()
        dirty["partition_id"] = dirty["partition_id"].astype("int32")
        dirty["hwm_seqno"] = dirty["hwm_seqno"].astype("int64")
        dirty["commit_epoch"] = pd.array([int(epoch_id.rsplit(":", 1)[-1]) if epoch_id.rsplit(":", 1)[-1].lstrip("-").isdigit() else -1] * len(dirty), dtype="int64")
        kept = cur[~cur["partition_id"].isin(dirty["partition_id"])]
        merged = pd.concat([kept, dirty], ignore_index=True).sort_values("partition_id")
        tmp = self._state_path() + ".tmp"
        merged.to_parquet(tmp, index=False)
        os.replace(tmp, self._state_path())
        meta = self._meta()
        epochs = meta["committed_epochs"]
        epochs.append(epoch_id)
        stream, n = _epoch_num(epoch_id)
        if stream is not None:
            wm = meta["watermarks"].get(stream)
            meta["watermarks"][stream] = n if wm is None else max(int(wm), n)
        # bounded window: evict oldest numeric entries (watermark covers
        # them); non-numeric one-shot ids stay pinned
        if len(epochs) > self.epoch_retention:
            keep_tail, pinned = [], []
            for e in epochs:
                (pinned if _epoch_num(e)[0] is None else keep_tail).append(e)
            n_tail = max(self.epoch_retention - len(pinned), 0)
            meta["committed_epochs"] = pinned + (keep_tail[-n_tail:] if n_tail else [])
        mtmp = os.path.join(self.path, _META + ".tmp")
        with open(mtmp, "w") as f:
            json.dump(meta, f)
        os.replace(mtmp, os.path.join(self.path, _META))
