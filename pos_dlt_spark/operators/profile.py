"""Single-scan data profiling: per-column row/null/distinct counts and
min/max — the "what is in this table" primitive every ingestion pipeline
runs before trusting a new source.

Scale design: the naive profiler (one COUNT(DISTINCT c) per column in one
agg) triggers Catalyst's Expand — each input row is replicated once per
distinct-aggregate, an n_cols x data multiply. Instead the table is
MELTED once (one array-of-struct projection, one scan) to
(column, value) rows and the distinct count is a two-level hash
aggregate on (column, value) — partial combine collapses repeats
map-side, the shuffle carries only distinct pairs, and adding columns
widens neither the scan nor the shuffle key. Null counts and min/max
ride the same melted stream. ANSI-safe: value casts use try_cast (the
profiler must not fail on a junk column — finding junk is its job).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _melt(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """One array-of-struct projection + explode: (column, vs, vn) rows —
    the single scan both profiler variants fold their statistics from."""
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("vs"),
                        F.col(c).cast("string").try_cast("double").alias("vn"),
                    )
                    for c in cols
                ]
            )
        ).alias("m")
    ).select("m.column", "m.vs", "m.vn")


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_num, max_num, min_str,
    max_str) for each named column. Numeric min/max via try_cast to
    double (null for non-numeric columns); string min/max over the
    rendered value (binary collation — engine-portable for ASCII).

    Distinct semantics: ``n_distinct`` counts distinct over the STRING
    RENDERING of values, not the native column — identical for integer
    and char columns, but a double or timestamp column whose engine
    rendering collapses or splits values (-0.0 vs 0.0, scientific
    notation, timestamp formats) can diverge from ``COUNT(DISTINCT
    native)``. The rendering is what makes a heterogeneous melt possible
    in one scan; callers needing native distinct on such columns should
    run a per-column ``approx_count_distinct`` (see the ``approx`` path)
    or an exact count on the raw column."""
    melted = _melt(df, cols)
    # every statistic folds out of the (column, value, count) table, so
    # ONE scan and one two-level aggregate serve all of them — no second
    # pass, no join of a base-stats branch against a distinct branch.
    # (vn is functionally dependent on vs; grouping by both is free.)
    counts = melted.groupBy("column", "vs", "vn").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy("column").agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("vs").isNull(), F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count(F.when(F.col("vs").isNotNull(), 1)).cast("bigint").alias("n_distinct"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
        F.min("vs").alias("min_str"),
        F.max("vs").alias("max_str"),
    )


def profile_table_approx(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.01
) -> DataFrame:
    """The 100 TB first-look profiler: same single-scan melt, but
    ``n_distinct_approx`` is one HyperLogLog++ sketch per column
    (``approx_count_distinct`` at ``rsd``) — the shuffle carries one
    fixed-size sketch per (map partition, column) instead of EVERY
    distinct (column, value) pair, which is what the exact profiler pays
    on a high-cardinality column (an id column shuffles ~n rows). All
    other statistics are still exact and ride the same aggregate.

    Still Expand-free: a single hash aggregate with declarative sketch
    aggs, no distinct-aggregate expansion. ``rsd`` defaults to 0.01, not
    Spark's 0.05 — the measured lesson from events_user_approx_distinct:
    default-rsd HLL drifted 6.7% on a 5%-claim query at 10x data, and
    HLL error is deterministic per dataset (a permanent failure, not a
    flake)."""
    melted = _melt(df, cols)
    return melted.groupBy("column").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("vs").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.approx_count_distinct("vs", rsd=rsd).cast("bigint").alias("n_distinct_approx"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
        F.min("vs").alias("min_str"),
        F.max("vs").alias("max_str"),
    )


def profile_table_with_sketch(
    df: DataFrame, cols: Sequence[str], rsd: float = 0.01
) -> DataFrame:
    """Exact profile PLUS the HLL distinct sketch in ONE melt and one
    two-level aggregate — for gates/users that want the sketch validated
    against the exact count. A join of :func:`profile_table` with
    :func:`profile_table_approx` pays the n_cols x row melt TWICE
    (Catalyst shares no subtrees across join branches); here the sketch
    aggregates over the DISTINCT (column, value) pairs the exact path
    already produces, which is bit-identical to sketching the raw rows —
    HyperLogLog registers are max-of-hashes, duplicate-insensitive.
    Output = :func:`profile_table` columns + ``n_distinct_approx``.

    Shape note (r12): the FIRST-level aggregate (the one that sees every
    melted row) must stay sketch-free — one imperative aggregate (HLL) in
    that agg list downgrades the whole 3.6M-row operator off whole-stage
    codegen (+40% measured). But the SECOND level only sees the deduped
    (column, value) pairs, so carrying the sketch there next to the
    min/max/sum chain costs a SortAggregate over ~0.2M rows — cheaper
    than the previous checkpoint-then-two-aggregates-then-join shape
    (one plan, no materialization, no join; measured 2.85 -> 1.92 s at
    sf0.1). HLL registers are max-of-hashes, so sketching the deduped
    pairs is bit-identical to sketching the raw rows."""
    melted = _melt(df, cols)
    counts = melted.groupBy("column", "vs", "vn").agg(F.count(F.lit(1)).alias("__c"))
    return counts.groupBy("column").agg(
        F.sum("__c").cast("bigint").alias("n_rows"),
        F.sum(F.when(F.col("vs").isNull(), F.col("__c")).otherwise(0))
        .cast("bigint")
        .alias("n_nulls"),
        F.count(F.when(F.col("vs").isNotNull(), 1)).cast("bigint").alias("n_distinct"),
        F.approx_count_distinct("vs", rsd=rsd).cast("bigint").alias("n_distinct_approx"),
        F.min("vn").alias("min_num"),
        F.max("vn").alias("max_num"),
        F.min("vs").alias("min_str"),
        F.max("vs").alias("max_str"),
    ).select(
        "column",
        "n_rows",
        "n_nulls",
        "n_distinct",
        "n_distinct_approx",
        "min_num",
        "max_num",
        "min_str",
        "max_str",
    )
