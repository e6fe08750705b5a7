"""Benchmark harness — runs the engine's headline queries at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized through the ``noop`` sink so the entire
physical plan executes (a bare ``count()`` would let Catalyst prune
aggregate expressions).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pos_dlt_spark.queries import REGISTRY  # noqa: E402
import pos_dlt_spark.queries_analytics  # noqa: E402,F401  (registers analytics queries)
import pos_dlt_spark.queries_corpus  # noqa: E402,F401  (registers corpus-assembly queries)
import pos_dlt_spark.queries_ml  # noqa: E402,F401  (registers ML queries)
import pos_dlt_spark.queries_streaming  # noqa: E402,F401  (registers streaming queries)
import pos_dlt_spark.queries_tpch  # noqa: E402,F401  (registers TPC-H batch-2 queries)
from pos_dlt_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # JVM warmup so the first measured query doesn't pay session startup:
    # a trivial action plus one pass through the parquet-reader / join /
    # window codegen paths using the two smallest dims. Each measured query
    # still compiles and executes its own full plan.
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pos_dlt_spark.tables import load_table

    spark.range(1000).selectExpr("sum(id)").collect()
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    (
        nation.join(region, nation.n_regionkey == region.r_regionkey)
        .withColumn("rn", F.row_number().over(Window.partitionBy("r_regionkey").orderBy("n_nationkey")))
        .write.format("noop").mode("overwrite").save()
    )

    times: dict[str, float] = {}
    for name, q in REGISTRY.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {times[name]:.3f}s", file=sys.stderr)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
