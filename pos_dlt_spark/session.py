"""SparkSession factory.

Local test runs use ``local[$SPARK_GRAFT_CPUS]`` (default all cores) with a
shuffle-partition count matched to cores — the reference relies on Databricks
cluster defaults (RUNME.py:113-118); on a real cluster the same builder is
used with ``master`` unset and the documented conf below.

Cluster-scale notes (100 TB target):
- AQE on: runtime coalescing, skew-join splitting, dynamic broadcast.
- ``spark.sql.shuffle.partitions`` should be ~2-3x total executor cores on a
  real cluster; AQE coalesces down, so err high (e.g. 4000 on 1000 cores).
- ``spark.sql.files.maxPartitionBytes`` at the default 128m keeps scan tasks
  memory-safe; with 100 TB input that is ~800k scan tasks — fine, they are
  cheap and stream through executors.
- Arrow enabled for every pandas-interop path (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# executor python workers inherit the DRIVER's env, not its sys.path:
# make the package importable on workers even when the caller sits in a
# foreign cwd (closures shipped via applyInPandas/mapInPandas reference
# pos_dlt_spark by module name). Must run before the JVM starts.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in os.environ.get("PYTHONPATH", "").split(os.pathsep):
    os.environ["PYTHONPATH"] = (
        _REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]
        if os.environ.get("PYTHONPATH")
        else _REPO_ROOT
    )


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(app_name: str = "pos_dlt_spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    Timezone is pinned to UTC so event-time semantics are stable and results
    compare bit-for-bit against external oracles (DuckDB is UTC-naive).
    """
    cpus = default_parallelism()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches: the 10k default doubles per-batch Python
        # call overhead on vectorized paths (measured: a noop pandas-UDF
        # filter over 24M rows fell 11.3 -> 6.5 s); 64k keeps per-batch
        # pandas frames far below executor memory at any sane row width
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # testdata events.parquet carries TIMESTAMP(NANOS) which the vectorized
        # reader rejects; read as long and convert in the loader (ns -> us,
        # same truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # cap the explicit-path listing job width (default = one task per
        # path; see tables.ensure_session_confs for the measurement)
        .config("spark.sql.sources.parallelPartitionDiscovery.parallelism", "64")
        .config("spark.ui.enabled", "false")
        # managed tables (bucketed layouts) land in tmp, not the repo cwd
        .config(
            "spark.sql.warehouse.dir",
            os.environ.get(
                "SPARK_GRAFT_WAREHOUSE",
                os.path.join(tempfile.gettempdir(), "pos_dlt_warehouse"),
            ),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    if not os.environ.get("SPARK_GRAFT_ON_CLUSTER"):
        builder = builder.master(f"local[{cpus}]")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
