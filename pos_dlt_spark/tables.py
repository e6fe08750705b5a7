"""Loaders for the driver-generated TESTDATA parquet tables.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet file each under
``/root/testdata/sf{0.001,0.01,0.1}/``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ensure_session_confs(spark: SparkSession) -> None:
    """Make any SparkSession able to run our queries, whoever built it.

    Both confs are RUNTIME-settable, so setting them here (rather than only
    in session.get_spark's builder) means a vanilla
    ``SparkSession.builder.getOrCreate()`` — e.g. the correctness driver's —
    works identically to our tuned session:

    - session TZ pins event-time semantics (window/date_trunc boundaries,
      DuckDB-oracle timestamp parity).
    - ``nanosAsLong``: events.parquet stores ts as TIMESTAMP(NANOS), which
      Spark's vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL)
      unless this legacy conf surfaces it as an epoch-nanos long; callers
      then truncate to micros exactly like DuckDB does on read.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")


def load_table(spark: SparkSession, sf_dir: str, name: str, spread: bool = False) -> DataFrame:
    """Load a TESTDATA table.

    ``spread=True`` round-robins the scan across all cores WHEN the file
    yields fewer input splits than the cluster has parallelism — the local
    testdata is one single-row-group parquet file per table, which Spark
    cannot split, so every downstream per-row operator would otherwise run
    in ONE task. On a real lake (thousands of files/row groups) the
    condition is false and this is a no-op; pay the tiny shuffle only for
    compute-heavy per-row operators (minhash, text features, matmuls)."""
    ensure_session_confs(spark)
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # events.ts is TIMESTAMP(NANOS) in parquet; with
    # spark.sql.legacy.parquet.nanosAsLong it surfaces as a long of epoch
    # nanoseconds. Truncate to microseconds exactly like DuckDB does on read.
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if spread:
        cores = spark.sparkContext.defaultParallelism
        # file count bounds the scan's split count for these single-row-group
        # files; checking it avoids df.rdd's plan->RDD conversion per call
        if len(df.inputFiles()) < cores:
            df = df.repartition(cores)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in names}


def register_views(spark: SparkSession, sf_dir: str, names=TESTDATA_TABLES) -> None:
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
