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
