"""Live metrics surface — the reference's Prometheus collector re-imagined.

The reference exposes gauges while the connector runs
(/root/reference/metric/collector.go:38-56: ``kafka_connector_latency_ms``,
``batch_produce_latency_ms``; README.md:136-142 lists them as the API). Ours
are a process-local registry updated from two directions:

- a ``StreamingQueryListener`` (``ConnectorQueryListener``) fed by Spark's
  own per-micro-batch progress events — trigger latency, input rows,
  rows/sec, and source backlog (lag);
- the pipeline itself (``CdcPipeline.apply_batch``) publishing the merge
  ("produce") latency it measures around the durable table write.

Gauge names mirror the reference's (``*_latency_ms_current``). Post-hoc
history remains in the lineage table (``batch_latency_ms`` per epoch); the
registry is the LIVE view a user polls while the stream runs.
"""

from __future__ import annotations

import json
import threading

from pyspark.sql.streaming import StreamingQueryListener

#: Gauge names, mirroring /root/reference/metric/collector.go:38-56.
CONNECTOR_LATENCY_MS = "kafka_connector_latency_ms_current"
BATCH_PRODUCE_LATENCY_MS = "batch_produce_latency_ms_current"
INPUT_ROWS = "connector_input_rows_current"
ROWS_PER_SEC = "connector_processed_rows_per_second_current"
#: Backlog in the source's file unit; bytes published separately — mixing
#: the two units into one gauge made the number meaningless (ADVICE r2).
LAG_FILES = "connector_lag_files_current"
LAG_BYTES = "connector_lag_bytes_current"
#: Legacy name: mirrors LAG_FILES when the source reports files, else
#: LAG_BYTES — single-unit, never a files+bytes sum.
LAG_BATCHES = "connector_lag_batches_current"
#: Rejection (DLQ) pressure — the reference logs each rejection through its
#: sink handler (rejection_log_sink_response_handler.go); a 100×-scale
#: operator needs the rate on the dashboard, not in per-epoch dicts
#: (r5 verdict item 7). `_current` = last epoch's row count across stages;
#: `_total` = monotone counter since pipeline start.
REJECTED_ROWS = "connector_rejected_rows_current"
REJECTED_ROWS_TOTAL = "connector_rejected_rows_total"
#: IVM maintenance cost — recomputed_groups from apply_agg_deltas /
#: maintain_exact_dedup (the bounded extremum-recompute scans). With the r6
#: extrema reserve this should sit at 0 on healthy feeds; a climbing total
#: is the observable signal that reserves are exhausting (deletion storm or
#: undersized reserve_r).
IVM_RECOMPUTED_GROUPS = "ivm_recomputed_groups_current"
IVM_RECOMPUTED_GROUPS_TOTAL = "ivm_recomputed_groups_total"


class MetricsRegistry:
    """Thread-safe gauge registry (listener callbacks arrive on a JVM
    callback thread while the driver thread reads)."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._gauges: dict[str, float] = {}

    def set(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def inc(self, name: str, delta: float = 1.0) -> None:
        """Monotone counter update (the ``*_total`` convention)."""
        with self._lock:
            self._gauges[name] = self._gauges.get(name, 0.0) + delta

    def get(self, name: str, default: float | None = None) -> float | None:
        with self._lock:
            return self._gauges.get(name, default)

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            return dict(self._gauges)

    def prometheus_text(self, namespace: str = "cbgo") -> str:
        """Prometheus text exposition of the current gauges — what the
        reference serves on its /metrics endpoint (collector.go builds
        FQNames under the helpers.Name namespace). Serve this from any HTTP
        handler; names match the reference's `<ns>_<gauge>` convention."""
        lines = []
        for name, value in sorted(self.snapshot().items()):
            fq = f"{namespace}_{name}"
            kind = "counter" if name.endswith("_total") else "gauge"
            lines.append(f"# TYPE {fq} {kind}")
            lines.append(f"{fq} {value}")
        return "\n".join(lines) + ("\n" if lines else "")


class ConnectorQueryListener(StreamingQueryListener):
    """Publishes live per-micro-batch gauges from Spark's progress events.

    Attach with ``spark.streams.addListener(listener)``; scope to one
    pipeline's queries via ``name_prefix`` (CdcPipeline names its queries
    ``cdc-{run_id}``). Detach with ``spark.streams.removeListener``.
    """

    def __init__(self, registry: MetricsRegistry, name_prefix: str = "cdc-") -> None:
        self.registry = registry
        self.name_prefix = name_prefix

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        if not (p.get("name") or "").startswith(self.name_prefix):
            return
        dur = p.get("durationMs", {})
        if "triggerExecution" in dur:
            self.registry.set(CONNECTOR_LATENCY_MS, float(dur["triggerExecution"]))
        self.registry.set(INPUT_ROWS, float(p.get("numInputRows", 0)))
        if p.get("processedRowsPerSecond") is not None:
            self.registry.set(ROWS_PER_SEC, float(p["processedRowsPerSecond"]))
        # lag: unconsumed backlog reported by the (file/kafka) source —
        # files and bytes are DIFFERENT units, published as separate gauges
        lag_files = lag_bytes = None
        for src in p.get("sources", []):
            m = src.get("metrics") or {}
            if "numFilesOutstanding" in m:
                lag_files = (lag_files or 0.0) + float(m["numFilesOutstanding"])
            if "numBytesOutstanding" in m:
                lag_bytes = (lag_bytes or 0.0) + float(m["numBytesOutstanding"])
        if lag_files is not None:
            self.registry.set(LAG_FILES, lag_files)
        if lag_bytes is not None:
            self.registry.set(LAG_BYTES, lag_bytes)
        legacy = lag_files if lag_files is not None else lag_bytes
        if legacy is not None:
            self.registry.set(LAG_BATCHES, legacy)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass
