"""Skew handling for hot conversation keys.

The skew axis in this workload is ``conv_id``: a few hot conversations carry
thousands of turns (Zipf). The reference sidesteps skew by hash-balancing
*messages* across Kafka partitions (/root/reference/config/config.go:47-66,
kafka/client.go:205); a keyed table sink cannot — a shuffle keyed on bare
``conv_id`` would put a hot conversation's entire history in one task.

Strategy (in priority order):

1. **Widen the key**: every shuffle in the merge path keys on the *full*
   document key ``(conv_id, turn_idx)`` — a hot conversation's turns spread
   uniformly across all tasks. This is the degenerate-perfect salt (salt =
   turn_idx) and costs nothing. The table's bucket function does the same.
2. **Explicit salt** for operations that must group by bare ``conv_id``
   (e.g. per-conversation rollups): ``salted_repartition`` /
   ``two_phase_agg`` below — classic salt + two-phase aggregation.
3. **AQE skew-join splitting** as the runtime backstop
   (``spark.sql.adaptive.skewJoin.enabled=true`` in session.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(key: Column | str, buckets: int) -> Column:
    """Deterministic salt derived from the row, not random — keeps replays
    and retries idempotent (a random salt would break exactly-once)."""
    return F.pmod(F.xxhash64(key), F.lit(buckets)).cast("int")


def salted_repartition(df: DataFrame, key: str, salt_key: str, buckets: int, n_partitions: int | None = None) -> DataFrame:
    """Repartition by (key, salt(salt_key)) so one hot `key` value spreads
    over `buckets` tasks. Used before per-key heavy work (merge shuffle)."""
    salted = df.withColumn("_salt", salt_col(salt_key, buckets))
    n = n_partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    return salted.repartition(int(n), F.col(key), F.col("_salt")).drop("_salt")


def two_phase_agg(
    df: DataFrame,
    key: str | Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_key: str = "turn_idx",
    buckets: int = 16,
) -> DataFrame:
    """Skew-proof aggregation by a possibly-hot key.

    Phase 1 groups by (key, salt) — hot keys split across `buckets` partial
    groups; phase 2 re-aggregates the partials. ``aggs`` maps output column
    -> (input column, fn) with fn in {sum, count, min, max}.

    (groupBy already does map-side partial aggregation, which usually makes
    this unnecessary; it matters when per-group *state* is large, e.g.
    collect-type aggs or high-cardinality distinct within a group.)
    """
    keys = [key] if isinstance(key, str) else list(key)
    phase1_exprs, phase2_exprs = [], []
    for out, (col, fn) in aggs.items():
        if fn == "count":
            phase1_exprs.append(F.count(col).alias(out))
            phase2_exprs.append(F.sum(out).alias(out))
        elif fn in ("sum", "min", "max"):
            phase1_exprs.append(getattr(F, fn)(col).alias(out))
            phase2_exprs.append(getattr(F, fn)(out).alias(out))
        else:
            raise ValueError(f"unsupported agg fn: {fn}")
    salted = df.withColumn("_salt", salt_col(salt_key, buckets))
    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)
