"""Time-series regularization: resample irregular observations onto a
fixed grid with forward-fill and linear interpolation.

The classic time-series-store operation (gap-fill / LOCF / interpolate)
expressed as pure DataFrame ops, no UDFs:

1. slot each observation (`unix_micros(ts) div step`), keep the LAST
   observation per (key, slot) — deterministic via explicit tiebreakers;
2. build each key's grid with `sequence(min_slot, max_slot)` + explode —
   fan-out is proportional to the OUTPUT size, never a cross join;
3. left-join observations onto the grid (co-partitioned equi-join on
   (key, slot));
4. fill with `last(value, ignorenulls=True)` over the per-key slot order,
   and interpolate between the surrounding anchors with
   `first/last(..., ignorenulls=True)` window lookups.

Scale: one shuffle for the per-slot reduction, a tiny per-key range agg,
one join shuffle, and the fill windows sort within key partitions — state
is bounded by grid width per key. Skewed keys (one key spanning years at
second resolution) should be range-chunked upstream; the grid explode
makes that cost visible rather than hiding a pair blow-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_ffill(
    df: DataFrame,
    keys: list[str],
    ts_col: str,
    value_col: str,
    step_us: int,
    tiebreakers: list[str] | None = None,
    interpolate: bool = True,
) -> DataFrame:
    """Resample ``df`` to a regular ``step_us``-microsecond grid per key.

    Returns one row per (keys, slot) between each key's first and last
    observation with columns: ``slot``, ``slot_start`` (timestamp),
    ``value`` (observed, null in gaps), ``value_ffill`` (last observation
    carried forward), and ``value_interp`` (linear between the
    surrounding observations; equals ``value`` on observed slots).
    """
    tiebreakers = list(tiebreakers or [])
    slot = F.expr(f"unix_micros({ts_col}) div {step_us}").alias("slot")
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    w_latest = Window.partitionBy(*keys, "slot").orderBy(*order)
    obs = (
        df.select(*keys, slot, F.col(value_col).alias("value"), ts_col, *tiebreakers)
        .withColumn("__rn", F.row_number().over(w_latest))
        .filter(F.col("__rn") == 1)
        .select(*keys, "slot", "value")
    )
    # Each observation emits itself plus the gap slots up to (not
    # including) the key's next observation: exactly one row per slot in
    # [first, last] per key, value non-null only on observed slots — the
    # same rows the old grid + left join produced, without them. The old
    # shape paid the obs subtree TWICE (the per-key range aggregate and
    # the join side are differently-aliased subtrees Catalyst cannot
    # share) and attached observations back with a join that broadcast
    # the whole observation set — O(observed slots) on the driver at
    # scale. Now: one obs pass, one exchange to per-key ordering (which
    # the fill windows below then reuse), no join, no broadcast.
    wk = Window.partitionBy(*keys).orderBy("slot")
    j = (
        obs.withColumn("__next", F.lead("slot").over(wk))
        .select(
            *keys,
            "slot",
            "value",
            F.explode(
                F.sequence(
                    "slot", F.coalesce(F.col("__next") - F.lit(1), F.col("slot"))
                )
            ).alias("__gslot"),
        )
        .select(
            *keys,
            F.col("__gslot").alias("slot"),
            F.when(F.col("__gslot") == F.col("slot"), F.col("value")).alias("value"),
        )
    )
    w_prev = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_next = wk.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    anchor_slot = F.when(F.col("value").isNotNull(), F.col("slot"))
    out = j.select(
        *keys,
        "slot",
        F.timestamp_micros(F.col("slot") * step_us).alias("slot_start"),
        "value",
        F.last("value", ignorenulls=True).over(w_prev).alias("value_ffill"),
        F.last(anchor_slot, ignorenulls=True).over(w_prev).alias("__prev_slot"),
        F.first("value", ignorenulls=True).over(w_next).alias("__next_value"),
        F.first(anchor_slot, ignorenulls=True).over(w_next).alias("__next_slot"),
    )
    if not interpolate:
        return out.drop("__prev_slot", "__next_value", "__next_slot")
    # interior gaps always have both anchors (the grid spans first..last
    # observation); the coalesce arm only matters for custom grids
    interp = (
        F.when(F.col("value").isNotNull(), F.col("value"))
        .when(
            F.col("__prev_slot").isNotNull() & F.col("__next_slot").isNotNull(),
            F.col("value_ffill")
            + (F.col("__next_value") - F.col("value_ffill"))
            * (F.col("slot") - F.col("__prev_slot")).cast("double")
            / (F.col("__next_slot") - F.col("__prev_slot")).cast("double"),
        )
        .otherwise(F.coalesce(F.col("value_ffill"), F.col("__next_value")))
    )
    return out.withColumn("value_interp", interp).drop(
        "__prev_slot", "__next_value", "__next_slot"
    )
