"""Skew-resistant aggregation patterns.

For algebraic aggregates (sum/count/min/max) Spark's partial aggregation
already collapses hot keys map-side, and AQE splits skewed join
partitions — no salting needed. Salting earns its keep where map-side
combine CANNOT shrink the data: exact distinct-counting, where every
distinct value must reach the reducer for its group.

``salted_count_distinct`` shards each group's value set by a hash of the
VALUE into ``buckets`` sub-groups: the buckets partition the value space,
so per-bucket exact distinct counts sum to the group's exact distinct
count, and a hot group's state is spread over ``buckets`` reducers
instead of melting one. This is the standard two-phase exact
count-distinct for skewed/high-cardinality groups at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Sequence[str],
    value: str | Column,
    buckets: int = 16,
    out_col: str = "n_distinct",
) -> DataFrame:
    """Exact COUNT(DISTINCT value) per key group, two-phase:

    phase 1: groupBy(keys + hash(value) % buckets) -> count_distinct
             (each bucket holds a disjoint slice of the value space);
    phase 2: groupBy(keys) -> sum of the per-bucket counts.

    Identical result to a direct count_distinct; the shuffle key gains
    entropy so no single reducer owns a hot group's whole value set.
    ``F.hash`` (murmur3) is fine here: the salt only routes values, it
    never appears in the result, so engine-portability of the hash does
    not matter.
    """
    v = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.hash(v), F.lit(buckets)).alias("__salt")
    phase1 = (
        df.select(*keys, v.alias("__v"), salt)
        .groupBy(*keys, "__salt")
        .agg(F.count_distinct(F.col("__v")).alias("__partial"))
    )
    return phase1.groupBy(*keys).agg(F.sum("__partial").alias(out_col))


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resistant to hot keys on the LEFT (big/skewed) side.

    Standard replicate-and-salt: every left row gains a deterministic salt
    ``pmod(xxhash64(whole row), salt)`` appended to the join key; every
    right row is replicated ``salt`` times (explode of a literal range),
    once per salt value. The join key becomes (keys..., salt), so
    a key owning 30% of the left table spreads over ``salt`` reducers
    instead of melting one.

    Result is row-identical to ``left.join(right, on, how)`` for inner and
    left joins (each left row still meets each matching right row exactly
    once — on exactly one salt). Right/full joins would need null-extension
    handling per salt replica and are rejected.

    When to use: only when the hot keys are NOT known in advance (else
    split-broadcast just those keys) and AQE's skew-join splitting cannot
    kick in (e.g. the skew appears after upstream operators, or the
    runtime is below AQE's thresholds). Costs: right side inflated x
    ``salt`` through the shuffle. AQE handles most skew for free —
    this operator is the explicit fallback, and its plan keeps both
    scans + one shuffle each, nothing else.
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    lsalt = F.pmod(F.xxhash64(*left.columns), F.lit(salt)).cast("int").alias("__salt")
    l2 = left.select("*", lsalt)
    r2 = right.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    )
    return l2.join(r2, [*on, "__salt"], how).drop("__salt")
