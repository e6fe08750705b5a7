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
