"""As-of (point-in-time) join — an operator Spark lacks natively.

For each left ("probe") row, attach columns from the right ("quote") row
with the greatest right-time <= left-time (or strictly <) within the same
key group — the classic time-series / feature-store lookup (pandas
``merge_asof``, DuckDB/kdb ``ASOF JOIN``).

The reference repo has no as-of join (SURVEY.md §2.4: "No semi/anti/
cross/as-of joins exist"); this is one of the training-data-pipeline
extensions (point-in-time-correct feature joins).

Scale design — why NOT a range join: expressing this as
``left.join(right, keys & (r.ts <= l.ts)) + max-per-probe`` makes Spark
build every (probe, earlier-quote) pair before reducing — O(n·m) per key,
catastrophic at 100 TB. Instead we:

1. tag both sides and ``unionByName`` them (column-pruned),
2. hash-shuffle ONCE on the join keys and sort each partition by
   ``(time, side, tiebreakers)``,
3. forward-fill the latest quote row with
   ``last(struct(...), ignorenulls=True)`` over
   ``rowsBetween(unboundedPreceding, currentRow)``,
4. keep probe rows and unpack the struct.

One shuffle, linear scan, state = one struct per partition row — the same
sort-merge-scan an engine-native ASOF JOIN performs. Quote values ride in
a single struct so a quote row whose value columns are NULL still
occludes older quotes (row-level, not column-level, fill semantics —
matching DuckDB/pandas).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TIME = "__asof_t"
_SIDE = "__asof_side"
_VALS = "__asof_vals"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    right_values: Sequence[str] | None = None,
    *,
    allow_exact: bool = True,
    right_tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every ``left`` row survives; ``right_values``
    columns are taken from the latest matching ``right`` row, else NULL.

    on               equi-join key columns (same names both sides).
    left_time /      event-time columns (need not share a name; must be
    right_time       mutually order-comparable, e.g. both timestamps).
    right_values     right columns to attach (default: all non-key,
                     non-time right columns). Names must not collide with
                     left's columns.
    allow_exact      if True (default), a quote at exactly the probe time
                     matches (``<=``); else strictly earlier (``<``).
    right_tiebreakers  extra right columns ordering equal-time quotes —
                     the LAST row in this order wins, making the pick
                     deterministic when (keys, right_time) is not unique.
    """
    on = list(on)
    if right_values is None:
        right_values = [c for c in right.columns if c not in on and c != right_time]
    right_values = list(right_values)
    clash = set(right_values) & set(left.columns)
    if clash:
        raise ValueError(f"right_values collide with left columns: {sorted(clash)}")

    # Quotes first at equal time when exact matches are allowed, else after.
    quote_rank, probe_rank = (0, 1) if allow_exact else (1, 0)

    struct_fields = right_values + [t for t in right_tiebreakers if t not in right_values]
    quotes = right.select(
        *on,
        F.col(right_time).alias(_TIME),
        F.lit(quote_rank).alias(_SIDE),
        F.struct(*[F.col(c) for c in struct_fields]).alias(_VALS),
    )
    probes = left.select(
        "*", F.col(left_time).alias(_TIME), F.lit(probe_rank).alias(_SIDE)
    )
    unioned = probes.unionByName(quotes, allowMissingColumns=True)

    order = [F.col(_TIME), F.col(_SIDE)] + [F.col(f"{_VALS}.{t}") for t in right_tiebreakers]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(_VALS, F.last(_VALS, ignorenulls=True).over(w))
    out = filled.filter(F.col(_SIDE) == probe_rank)
    for c in right_values:
        out = out.withColumn(c, F.col(f"{_VALS}.{c}"))
    return out.drop(_TIME, _SIDE, _VALS)
