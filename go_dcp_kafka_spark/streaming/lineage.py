"""Lineage / metrics table — the reference's Prometheus collector re-imagined
as an append-only table (/root/reference/metric/collector.go:38-56: connector
latency + batch produce latency gauges; plus the DCP totals the Grafana
dashboard tracks). One row per (partition_id, commit_epoch):

first_seqno / last_seqno, event counts by op, duplicates dropped, rows
merged, and batch latency ms.

Invariants (tested): sum of op counts = non-discarded events delivered;
max(last_seqno) per partition = checkpoint HWM (absent rollback truncation).

Append-only => each epoch writes one new parquet file; no swap needed (an
epoch re-delivery overwrites the same file name => idempotent)."""

from __future__ import annotations

import glob
import os

import pandas as pd


class LineageLog:
    def __init__(self, path: str) -> None:
        self.path = path
        os.makedirs(path, exist_ok=True)

    def append(self, rows: pd.DataFrame, epoch_id: str) -> None:
        safe = str(epoch_id).replace(":", "_").replace("/", "_")
        p = os.path.join(self.path, f"epoch-{safe}.parquet")
        tmp = p + ".tmp"
        rows.to_parquet(tmp, index=False)
        os.replace(tmp, p)

    def read(self) -> pd.DataFrame:
        files = sorted(glob.glob(os.path.join(self.path, "epoch-*.parquet")))
        if not files:
            return pd.DataFrame()
        return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
