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
import pos_dlt_spark.queries_ml  # noqa: E402,F401  (registers ML queries)
import pos_dlt_spark.queries_streaming  # noqa: E402,F401  (registers streaming queries)
from pos_dlt_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    spark = get_spark("bench")

    # JVM/codegen warmup on a trivial action so the first measured query
    # doesn't pay session startup.
    spark.range(1000).selectExpr("sum(id)").collect()

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
