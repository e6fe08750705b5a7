"""Skewed-key join stress (VERDICT r03 #7): measure plain vs salted join
under REAL skew — one key owning 50% of a large fact side — and record
wall time AND max-task time (the cluster-health number: one melted
reducer stalls the stage even when total work is fine).

AQE's skew-join splitting handles sort-merge skew when post-shuffle
partition sizes trip its thresholds, so the harness measures THREE
configurations:

  plain+AQE   — what the engine's default session does;
  plain-AQE   — the melted-reducer baseline (what a misconfigured or
                pre-3.0 cluster sees, and what AQE cannot fix when the
                skew appears mid-pipeline after its stats are stale);
  salted      — operators/skew.py:salted_join with AQE off, proving the
                operator itself (not AQE) spreads the hot key.

Equality of results is asserted (count + keyed checksum) — a salted join
that is fast but wrong is worthless.

Usage: python tools/skew_stress.py [n_rows_millions]   (default 50)
Appends nothing; prints a JSON line + markdown row for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

UI_PORT = 4056


def rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=20
    ) as r:
        return json.loads(r.read())


def max_task_ms(app: str, before_stages: set[tuple[int, int]]) -> int:
    """Max single-task duration over stages completed since the snapshot."""
    stages = rest(f"applications/{app}/stages?status=complete")
    worst = 0
    for s in stages:
        key = (s["stageId"], s.get("attemptId", 0))
        if key in before_stages:
            continue
        try:
            summ = rest(
                f"applications/{app}/stages/{s['stageId']}/{s.get('attemptId', 0)}"
                f"/taskSummary?quantiles=1.0"
            )
            worst = max(worst, int(summ["executorRunTime"][0]))
        except Exception:
            # stage summaries evict; fall back to stage-level proxy
            worst = max(worst, int(s.get("executorRunTime", 0)))
    return worst


def completed_stages(app: str) -> set[tuple[int, int]]:
    return {
        (s["stageId"], s.get("attemptId", 0))
        for s in rest(f"applications/{app}/stages?status=complete")
    }


def main() -> None:
    n_m = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    n = n_m * 1_000_000
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pos_dlt_spark.operators.skew import salted_join

    spark = (
        SparkSession.builder.appName("skew_stress")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", str(UI_PORT))
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    # fact: 50% of rows on key 0, the rest uniform over 100k keys;
    # dim: 100k + 1 keys with an attribute. Materialized to parquet so
    # the joins read real files (range() unions would constant-fold).
    fact_dir, dim_dir = "/tmp/skew_fact", "/tmp/skew_dim"
    if not os.path.exists(fact_dir):
        (
            spark.range(n)
            .select(
                F.when(F.col("id") % 2 == 0, F.lit(0))
                .otherwise(F.pmod(F.hash(F.col("id")), F.lit(100_000)) + 1)
                .cast("long")
                .alias("k"),
                (F.col("id") % 997).cast("long").alias("v"),
            )
            .write.mode("overwrite")
            .parquet(fact_dir)
        )
        (
            spark.range(100_001)
            .select(F.col("id").alias("k"), (F.col("id") * 7 % 1009).alias("w"))
            .write.mode("overwrite")
            .parquet(dim_dir)
        )

    fact = spark.read.parquet(fact_dir)
    # dim must NOT broadcast for this experiment: the whole point is the
    # shuffled-join reducer path (broadcast joins don't shuffle and are
    # the first fix for small dims; salting is for when the right side
    # is too big to broadcast — simulated here via a no-broadcast pin).
    dim = spark.read.parquet(dim_dir).hint("shuffle_merge")

    def run(label: str, aqe: bool, salted: bool, skew_threshold: str | None = None) -> dict:
        spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE's skew detection thresholds apply to COMPRESSED map-output
        # sizes; snappy on regular long columns compresses far enough
        # that a 25M-row melted partition can hide under the 256 MB
        # default. The tuned config drops both thresholds to show the
        # detection boundary, not a capability gap.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            skew_threshold or "256MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "8MB" if skew_threshold else "64MB",
        )
        app = rest("applications")[0]["id"]
        before = completed_stages(app)
        t0 = time.perf_counter()
        j = (
            salted_join(fact, dim, on=["k"], salt=32)
            if salted
            else fact.join(dim, on=["k"])
        )
        agg = j.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * F.col("w")).alias("checksum"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        worst = max_task_ms(app, before)
        out = {
            "config": label,
            "wall_sec": round(wall, 1),
            "max_task_sec": round(worst / 1000, 1),
            "rows": int(agg["n"]),
            "checksum": int(agg["checksum"]),
        }
        print(f"# {out}", file=sys.stderr, flush=True)
        return out

    results = [
        run("plain_aqe", aqe=True, salted=False),
        run("plain_aqe_tuned", aqe=True, salted=False, skew_threshold="16MB"),
        run("plain_noaqe", aqe=False, salted=False),
        run("salted_noaqe", aqe=False, salted=True),
        run("salted_aqe", aqe=True, salted=True),
    ]
    counts = {r["rows"] for r in results}
    sums = {r["checksum"] for r in results}
    assert len(counts) == 1 and len(sums) == 1, f"result mismatch: {results}"
    print(json.dumps({"n_rows": n, "hot_key_share": 0.5, "results": results}))


if __name__ == "__main__":
    main()
