"""Gold-layer query: current inventory per (store_id, item_id).

Re-expresses the reference's ``inventory_current`` DLT SQL
(`04_Silver-to-Gold ETL.sql:76-103`):

    SELECT a.store_id, a.item_id,
           FIRST(a.quantity) AS snapshot_quantity,
           COALESCE(SUM(b.quantity), 0) AS change_quantity,
           FIRST(a.quantity) + COALESCE(SUM(b.quantity), 0) AS current_inventory,
           GREATEST(FIRST(a.date_time), MAX(b.date_time)) AS date_time
    FROM latest_inventory_snapshot a
    LEFT OUTER JOIN (changes joined to dims, filtered) b
      ON a.store_id = b.store_id AND a.item_id = b.item_id
         AND a.date_time <= b.date_time
    GROUP BY a.store_id, a.item_id

Semantics preserved (SURVEY.md §5):
- outer-join retention: a snapshot key with zero post-snapshot changes keeps
  its row with ``change_quantity = 0`` (reference `04:59,80`);
- range predicate: changes strictly before the snapshot time are excluded;
- ``FIRST`` is replaced by ``MAX`` — legal because snapshot quantity and
  date_time are functionally dependent on the (store, item) key (the CDC
  target holds one row per key, reference `03:382`), and MAX is
  deterministic where FIRST is not.

Scale notes (100 TB): the equi part of the join key (store_id, item_id) is
hashable, so Catalyst plans a shuffled sort-merge/hash join with the
``date_time <=`` residual as a post-join filter — NOT a nested loop. The
snapshot side is one row per key (bounded by |stores|x|items|); the change
side is the large stream. Both shuffle on the same (store_id, item_id) key
the aggregation needs, so the groupBy reuses the join's partitioning and adds
no extra exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def current_inventory(latest_snapshot: DataFrame, changes: DataFrame) -> DataFrame:
    """Compute current inventory from a one-row-per-key snapshot table and a
    change-event table.

    ``latest_snapshot`` columns: store_id, item_id, quantity, date_time
    ``changes`` columns:         store_id, item_id, quantity, date_time
    """
    a = latest_snapshot.alias("a")
    b = changes.alias("b")
    cond = (
        (F.col("a.store_id") == F.col("b.store_id"))
        & (F.col("a.item_id") == F.col("b.item_id"))
        & (F.col("a.date_time") <= F.col("b.date_time"))
    )
    joined = a.join(b, on=cond, how="left_outer")
    snap_qty = F.max(F.col("a.quantity")).alias("snapshot_quantity")
    change_qty = F.coalesce(
        F.sum(F.col("b.quantity").cast("bigint")), F.lit(0).cast("bigint")
    ).alias("change_quantity")
    snap_dt = F.max(F.col("a.date_time"))
    max_b_dt = F.max(F.col("b.date_time"))
    return (
        joined.groupBy(F.col("a.store_id").alias("store_id"), F.col("a.item_id").alias("item_id"))
        .agg(
            snap_qty,
            change_qty,
            # null-safe GREATEST: express max(b.date_time) IS NULL -> snapshot
            # time explicitly so batch oracles need no engine-specific NULL
            # semantics for GREATEST.
            F.greatest(snap_dt, F.coalesce(max_b_dt, snap_dt)).alias("date_time"),
        )
        .withColumn(
            "current_inventory",
            (F.col("snapshot_quantity").cast("bigint") + F.col("change_quantity")).alias(
                "current_inventory"
            ),
        )
        .select(
            "store_id",
            "item_id",
            "snapshot_quantity",
            "change_quantity",
            "current_inventory",
            "date_time",
        )
    )
