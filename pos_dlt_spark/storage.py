"""Table maintenance for the parquet-backed pipeline tables.

Streaming sinks append a file (or several) per micro-batch; at a 5-minute
cadence that is ~100k files/year/table — directory listings and scan task
scheduling degrade long before data volume does. ``compact_parquet_table``
rewrites a table directory into size-targeted files (optionally
range-sorted so downstream key scans cluster), with the same
write-then-swap protocol as the CDC target: readers always see either the
old or the new complete directory.

On a real cluster this is Delta/Iceberg ``OPTIMIZE``; the operator here
keeps v1 dependency-free with identical semantics for a quiesced table.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def parquet_file_count(path: str) -> int:
    return sum(
        1
        for _root, _dirs, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def compact_parquet_table(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite ``path`` into ceil(size/target) files; returns the new file
    count. With ``sort_by``, data is range-partitioned on those columns so
    each output file covers a contiguous key range (min/max footer stats
    then let scans skip files — poor man's data clustering)."""
    df = spark.read.parquet(path)
    n_files = max(1, -(-_dir_bytes(path) // target_file_bytes))
    out = (
        df.repartitionByRange(n_files, *sort_by)
        if sort_by
        else df.coalesce(n_files)
    )
    tmp = path + ".__compact"
    out.write.mode("overwrite").parquet(tmp)
    old = path + ".__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)


def write_bucketed_table(
    df,
    spark: SparkSession,
    name: str,
    bucket_cols: list[str],
    n_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a bucketed + sorted managed table.

    Bucketing is THE shuffle-elimination lever for repeated big-table
    equi-joins and aggregations: two tables bucketed (and sorted) the same
    way on the join key sort-merge-join with **zero Exchange and zero
    Sort** in the plan — each task zips bucket i with bucket i. At 100 TB
    that turns every recurring fact-to-fact join from a full network
    shuffle into a local merge. The cost is paid once at write time
    (one shuffle into n_buckets) and amortized over every downstream join,
    exactly like the reference pre-partitions its silver tables by store.

    Spark only persists bucket metadata through the catalog
    (``saveAsTable``); plain ``parquet(path)`` writes lose it. Tables land
    in the session's warehouse dir.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.saveAsTable(name)


def zorder_key(cols: list[str], bits: int = 16) -> "Column":
    """Morton (Z-order) interleave of integer columns -> one sortable key.

    Range-clustering on ONE column (``compact_parquet_table(sort_by=...)``)
    gives perfect file skipping on that column and none on any other;
    Z-ordering interleaves the bits of several columns so every
    participating column's value range maps to a bounded set of key ranges
    — min/max footer stats then skip files for predicates on ANY of the
    columns (the multi-dimensional clustering behind Delta ``OPTIMIZE
    ZORDER BY``).

    Columns must already be non-negative ints in [0, 2^bits) — callers
    rank/bucketize first (e.g. ``F.floor(col / width)`` or an ntile rank;
    clamping here would silently co-locate outliers). The expression is
    rendered as ONE SQL string (see similarity._centroid_sims for why) of
    shiftleft/bitand terms — exact integer math, engine-portable.
    """
    from pyspark.sql import functions as F

    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            # bit b of col i lands at interleaved position b*len(cols)+i
            src, dst = b, b * len(cols) + i
            terms.append(f"shiftleft(shiftright(CAST({c} AS BIGINT), {src}) & 1, {dst})")
    return F.expr(" + ".join(terms))


def compact_parquet_table_zorder(
    spark: SparkSession,
    path: str,
    zorder_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits: int = 16,
) -> int:
    """``compact_parquet_table`` variant that range-partitions AND sorts by
    the Morton key of ``zorder_by`` (pre-bucketized to ``bits`` bits via
    each column's value floor-divided into 2^bits buckets over its min/max
    span — one tiny stats pass), so file-level min/max stats prune scans
    filtered on any of the z-columns."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in zorder_by],
        *[F.max(c).alias(f"mx_{c}") for c in zorder_by],
    ).collect()[0]
    bucketized = []
    for c in zorder_by:
        lo, hi = stats[f"mn_{c}"], stats[f"mx_{c}"]
        span = max(int(hi) - int(lo), 0) + 1
        width = max(-(-span // (1 << bits)), 1)
        bucketized.append(f"((CAST({c} AS BIGINT) - {int(lo)}) div {width})")
    key = zorder_key(bucketized, bits=bits)
    n_files = max(1, -(-_dir_bytes(path) // target_file_bytes))
    out = (
        df.withColumn("__z", key)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    tmp = path + ".__compact"
    out.write.mode("overwrite").parquet(tmp)
    old = path + ".__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return parquet_file_count(path)
