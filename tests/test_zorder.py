"""Z-order compaction (storage.compact_parquet_table_zorder): file-level
min/max pruning must work on EITHER z-column; single-column range
clustering is the control that prunes only its own column."""

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.storage import (
    compact_parquet_table,
    compact_parquet_table_zorder,
    parquet_file_count,
    zorder_key,
)


def _files_scanned(spark, path, predicate) -> int:
    df = spark.read.parquet(path).filter(predicate)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # count the files the scan actually reads via the input file name column
    return (
        spark.read.parquet(path)
        .filter(predicate)
        .select(F.input_file_name().alias("f"))
        .distinct()
        .count()
    )


@pytest.fixture(scope="module")
def grid(spark, tmp_path_factory):
    # 100x100 uniform grid on (a, b): any small a- or b-slice holds 1% of rows
    root = tmp_path_factory.mktemp("zorder")
    df = spark.range(100 * 100).select(
        (F.col("id") % 100).alias("a"),
        (F.col("id") / 100).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    zpath, rpath = str(root / "z"), str(root / "r")
    df.write.parquet(zpath)
    df.write.parquet(rpath)
    compact_parquet_table_zorder(spark, zpath, ["a", "b"], target_file_bytes=4096, bits=8)
    compact_parquet_table(spark, rpath, target_file_bytes=4096, sort_by=["a"])
    return zpath, rpath


def test_zorder_key_interleaves(spark):
    rows = spark.range(4 * 4).select(
        (F.col("id") % 4).alias("x"), (F.col("id") / 4).cast("long").alias("y")
    ).withColumn("z", zorder_key(["x", "y"], bits=2)).collect()

    def morton(x, y, bits=2):
        out = 0
        for b in range(bits):
            out |= ((x >> b) & 1) << (2 * b)
            out |= ((y >> b) & 1) << (2 * b + 1)
        return out
    assert morton(0b11, 0b00) == 0b0101
    assert morton(0b00, 0b11) == 0b1010
    for r in rows:
        assert r["z"] == morton(r["x"], r["y"]), (r["x"], r["y"], r["z"])


def test_zorder_prunes_both_columns(spark, grid):
    zpath, rpath = grid
    nz = parquet_file_count(zpath)
    nr = parquet_file_count(rpath)
    assert nz > 4 and nr > 4  # enough files for pruning to show
    za = _files_scanned(spark, zpath, F.col("a") < 5)
    zb = _files_scanned(spark, zpath, F.col("b") < 5)
    ra = _files_scanned(spark, rpath, F.col("a") < 5)
    rb = _files_scanned(spark, rpath, F.col("b") < 5)
    # range clustering: perfect on its column, useless on the other
    assert ra <= max(1, nr // 4)
    assert rb == nr
    # z-order: strictly better than full scan on BOTH columns
    assert za < nz and zb < nz
    assert za <= nz // 2 and zb <= nz // 2


def test_zorder_preserves_rows(spark, grid):
    zpath, _ = grid
    got = spark.read.parquet(zpath).agg(
        F.count(F.lit(1)).alias("n"), F.sum("payload").alias("s")
    ).collect()[0]
    assert got["n"] == 10000 and got["s"] == sum(range(10000))
