"""Incremental view maintenance (IVM) over the table changelog.

A 100-TB CDC consumer that keeps a downstream aggregate (a per-group
profile / rollup table) must NOT recompute it from the base table per
epoch — the aggregate-side version of the full-table-poll disease
``read_changes`` cures on the read side. The reference's consumers get
this for free at the row level (they apply only the appended log segment,
/root/reference/kafka/client.go:220-233); this module extends the same
cost model to DISTRIBUTIVE aggregates (COUNT(*), SUM(col); AVG derives as
sum/count) maintained in a keyed :class:`SnapshotTable`:

1. ``read_changes(from_version, include_old=True)`` supplies before/after
   row images — O(changed rows), manifest-pruned.
2. :func:`agg_deltas` turns each change into at most two GROUP
   CONTRIBUTION rows — a retraction against the before-image's group and
   an application to the after-image's group — then sums them per group.
   One shuffle, map-side combinable (sums of ±1 / ±value), so a Zipf-hot
   group combines locally instead of routing every contribution to one
   task. Updates that MIGRATE a row between groups are handled naturally
   (retract from old group, apply to new).
3. :func:`apply_agg_deltas` folds the per-group deltas into the aggregate
   table: existing group rows are fetched with the bucket/row-group-pruned
   ``read_keys`` probe (O(changed groups), not O(groups)), new totals are
   old + delta, groups whose row count reaches zero are deleted, and the
   result lands as a normal keyed ``merge`` (touched buckets only).

MIN/MAX are deliberately out of scope: they are not incrementally
maintainable under deletion without per-group recompute (retracting the
current extremum requires the runner-up); a consumer needing them should
recompute affected groups from ``read_keys`` on the base table.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["agg_deltas", "apply_agg_deltas", "maintain_agg"]


def agg_deltas(
    changes: DataFrame,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    before_col: str = "_before",
    change_col: str = "_change",
) -> DataFrame:
    """Per-group aggregate deltas from a before/after change feed.

    ``changes``: the output of ``read_changes(..., include_old=True)`` —
    current payload columns (null for deletes), ``change_col`` in
    ('insert', 'update', 'delete'), and ``before_col`` as the old payload
    struct (null for inserts).

    Returns one row per affected group: ``group_cols`` + ``_d_count``
    (net row-count delta) + ``_d_<c>`` (net SUM(c) delta, SQL null
    semantics: a null value contributes nothing) for each ``c`` in
    ``sum_cols``. Plan shape: union of two projections -> ONE partial-agg
    shuffle on the group key.
    """
    group_cols = list(group_cols)
    sum_cols = list(sum_cols)
    w = F.col("_w")
    # after-image contribution (+) for rows that exist at to_version
    after = changes.filter(F.col(change_col) != "delete").select(
        *group_cols, F.lit(1).alias("_w"), *sum_cols
    )
    # before-image retraction (-) for rows that existed at from_version;
    # its group is the BEFORE group — a group-migrating update retracts
    # from the old group and applies to the new one
    before = changes.filter(F.col(change_col) != "insert").select(
        *[F.col(f"{before_col}.{g}").alias(g) for g in group_cols],
        F.lit(-1).alias("_w"),
        *[F.col(f"{before_col}.{c}").alias(c) for c in sum_cols],
    )
    return (
        after.unionByName(before)
        .groupBy(*group_cols)
        .agg(
            F.sum(w).cast("long").alias("_d_count"),
            *[F.coalesce(F.sum(F.col(c) * w), F.lit(0)).alias(f"_d_{c}") for c in sum_cols],
        )
    )


def apply_agg_deltas(
    agg_table,
    deltas: DataFrame,
    count_col: str = "n_rows",
    sum_map: dict[str, str] | None = None,
    epoch_id: str = "ivm-0",
) -> dict:
    """Fold :func:`agg_deltas` output into an aggregate ``SnapshotTable``
    keyed by the group columns.

    ``count_col``: the table's COUNT(*) column; ``sum_map``: base column ->
    aggregate-table column (e.g. ``{'n': 'sum_n'}``). Existing group rows
    come from the pruned ``read_keys`` probe; groups whose new count is 0
    are deleted (an aggregate table never holds empty groups — matching a
    from-scratch GROUP BY, which has no row for them). Idempotent per
    ``epoch_id`` like any other merge.
    """
    sum_map = dict(sum_map or {})
    gcols = list(agg_table.key_cols)
    # O(changed groups) rows: materialize once so the read_keys probe, the
    # join, and the merge's own passes don't re-run the changelog diff +
    # delta shuffle behind it
    deltas = deltas.localCheckpoint(eager=True)
    # both sides are O(changed groups): the probe reads only matching
    # buckets/row groups and returns at most one row per changed group, so
    # it broadcasts; every delta row must survive the join (its group may
    # not exist yet), hence deltas-left
    existing = agg_table.read_keys(deltas.select(*gcols))
    j = deltas.join(F.broadcast(existing), on=gcols, how="left")
    new_count = (F.coalesce(F.col(count_col), F.lit(0)) + F.col("_d_count")).cast("long")
    new_sums = [
        (F.coalesce(F.col(agg_c), F.lit(0)) + F.col(f"_d_{base_c}")).alias(agg_c)
        for base_c, agg_c in sum_map.items()
    ]
    updated = j.select(*gcols, new_count.alias(count_col), *new_sums)
    upserts = updated.filter(F.col(count_col) > 0)
    deletes = updated.filter(F.col(count_col) <= 0).select(*gcols)
    return agg_table.merge(upserts, deletes, epoch_id=epoch_id)


def maintain_agg(
    base_table,
    agg_table,
    from_version: int,
    group_cols: Sequence[str],
    sum_cols: Sequence[str] = (),
    count_col: str = "n_rows",
    sum_prefix: str = "sum_",
    epoch_id: str | None = None,
) -> dict:
    """One maintenance cycle: apply everything that happened to
    ``base_table`` since ``from_version`` to the aggregate table.
    Aggregate columns are ``count_col`` + ``{sum_prefix}<c>`` per sum
    column. Total cost is O(changed): changelog read (manifest-pruned) ->
    one partial-agg shuffle -> pruned probe + keyed merge."""
    ch = base_table.read_changes(from_version=from_version, include_old=True)
    d = agg_deltas(ch, group_cols, sum_cols)
    return apply_agg_deltas(
        agg_table,
        d,
        count_col=count_col,
        sum_map={c: f"{sum_prefix}{c}" for c in sum_cols},
        epoch_id=epoch_id if epoch_id is not None else f"ivm-{base_table.version()}",
    )
