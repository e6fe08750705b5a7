"""Compaction: many small streaming-appended files collapse into few,
contents identical, swap is atomic (old dir fully replaced)."""

import os

from pyspark.sql import functions as F

from pos_dlt_spark.storage import compact_parquet_table, parquet_file_count


def test_compact_preserves_data_and_reduces_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # simulate per-micro-batch appends: 20 tiny files
    for i in range(20):
        spark.range(i * 10, (i + 1) * 10).withColumn("v", F.col("id") * 2).coalesce(
            1
        ).write.mode("append").parquet(path)
    assert parquet_file_count(path) >= 20
    before = {(r.id, r.v) for r in spark.read.parquet(path).collect()}

    n = compact_parquet_table(spark, path, target_file_bytes=10**9)
    assert n == 1
    assert parquet_file_count(path) == 1
    assert {(r.id, r.v) for r in spark.read.parquet(path).collect()} == before
    assert not os.path.exists(path + ".__old") and not os.path.exists(path + ".__compact")


def test_compact_range_sorted_clusters_keys(spark, tmp_path):
    path = str(tmp_path / "t2")
    spark.range(0, 10000).withColumn("k", F.pmod(F.col("id"), F.lit(100))).write.mode(
        "overwrite"
    ).parquet(path)
    compact_parquet_table(spark, path, target_file_bytes=1, sort_by=["k"])
    # every output file covers a disjoint key range
    files = sorted(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert len(files) >= 2
    ranges = []
    for f in files:
        stats = spark.read.parquet(f).agg(F.min("k"), F.max("k")).collect()[0]
        ranges.append((stats[0], stats[1]))
    ranges.sort()
    for (lo1, hi1), (lo2, _hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2
