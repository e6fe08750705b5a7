"""Incremental-gold decade (VERDICT r11 #1 "done" measurement).

The r11 decade measured the flagship's day-pruned FULL gold recompute at
25.6 s per 5-minute tick over 20M events. This harness replays the same
distributed fixture through the INCREMENTAL pipeline mode
(`build_pos_pipeline(gold_authoring="incremental")`: store-bucketed CDC
silver + `IncrementalJoinedView` gold) and measures what a 5-minute tick
actually costs as a function of CHANGED-STORE SPREAD:

- initial build: full pipeline pass (all 16 buckets stale — the one-time
  O(everything) seed, equal in work to one full recompute)
- tick(k): land a small late-event batch touching exactly k stores,
  ingest it into silver, then time `run_table("inventory_current")` —
  the incremental refresh. Repeated for k in (1, 4, 16=all-buckets-hit)
  plus k=0 (a no-change tick: pure staleness check, no recompute).
- the full-recompute baseline (same day-pruned GOLD_INVENTORY_SQL the
  python mode runs) timed on the same final state for comparison.

Correctness is asserted inline: after every tick the view must equal the
full recompute exactly (collected and compared on the driver for the
1M-key gold — row-for-row).

Usage: python tools/pos_decade_incremental.py [n_events_millions]  (default 20)
Prints a markdown section for SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.pos_decade import N_ITEMS, N_STORES, START_EPOCH, build_fixture, rss_mb


def main() -> None:
    n_events = int(float(sys.argv[1]) * 1e6) if len(sys.argv) > 1 else 20_000_000
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from pos_dlt_spark.pipeline import PipelineRunner
    from pos_dlt_spark.pos_pipeline import GOLD_INVENTORY_SQL, build_pos_pipeline
    from pos_dlt_spark.schemas import TIMESTAMP_FORMAT

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .appName("pos_decade_incremental")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="pos_decade_inc_", dir="/tmp")
    input_root = os.path.join(root, "input")
    storage = os.path.join(root, "storage")
    timings: dict[str, float] = {}
    try:
        n_keys = build_fixture(spark, input_root, n_events, timings)
        rss_before = rss_mb()

        pipe = build_pos_pipeline(
            storage, input_root, gold_authoring="incremental"
        )
        runner = PipelineRunner(pipe)
        t0 = time.time()
        for name in pipe.topo_order():
            ts = time.time()
            runner.run_table(spark, name)
            timings[f"stage:{name}"] = time.time() - ts
        timings["initial_build"] = time.time() - t0

        # full-recompute baseline on the SAME state (day-pruned, the
        # python mode's exact plan)
        for name in ("latest_inventory_snapshot", "inventory_change", "store",
                     "inventory_change_type"):
            pipe.read(spark, name).createOrReplaceTempView(name)
        min_day = spark.sql(
            "SELECT CAST(MIN(date_time) AS DATE) AS d FROM latest_inventory_snapshot"
        ).collect()[0]["d"]

        def full_gold_df():
            chg = pipe.read(spark, "inventory_change").filter(
                F.col("date_day") >= F.lit(min_day)
            )
            chg.createOrReplaceTempView("inventory_change")
            return spark.sql(GOLD_INVENTORY_SQL)

        t0 = time.time()
        full_gold_df().write.format("noop").mode("overwrite").save()
        timings["full_recompute"] = time.time() - t0

        def land_tick(k_stores: int, tick_id: int) -> None:
            """Append a small event batch touching exactly k stores (200
            events per store). Timestamps are NEWER than every prior
            event (day 30+tick): silver's stateful dedup keeps a
            watermark in its checkpoint, so a tick stamped older than
            max_seen - 1h would be dropped as late data."""
            stores = [(s % N_STORES) + 1 for s in range(k_stores)]
            rows = spark.createDataFrame(
                [(s, i) for s in stores for i in range(200)],
                "store_id int, n int",
            )
            payload = rows.select(
                F.to_json(
                    F.struct(
                        F.format_string(
                            f"{{tick{tick_id}-%03d-%06d}}", "store_id", "n"
                        ).alias("trans_id"),
                        "store_id",
                        F.date_format(
                            F.timestamp_seconds(
                                F.lit(START_EPOCH + (30 + tick_id) * 86400)
                                + F.col("n")
                            ),
                            TIMESTAMP_FORMAT,
                        ).alias("date_time"),
                        (F.col("n") % 4 + 1).alias("change_type_id"),
                        F.array(
                            F.struct(
                                (F.col("n") % N_ITEMS + 1).alias("item_id"),
                                (F.col("n") % 9 - 4).alias("quantity"),
                            )
                        ).alias("items"),
                    )
                ).alias("value")
            )
            payload.coalesce(1).write.mode("append").text(
                os.path.join(input_root, "events")
            )
            ts = time.time()
            runner.run_table(spark, "raw_inventory_change")
            runner.run_table(spark, "inventory_change")
            timings[f"tick{tick_id}_ingest"] = time.time() - ts

        def time_refresh(tag: str) -> float:
            ts = time.time()
            runner.run_table(spark, "inventory_current")
            dt = time.time() - ts
            timings[tag] = dt
            return dt

        # k=0: no-change tick (staleness check only)
        time_refresh("tick_k0_refresh")

        ticks = [(1, 1), (4, 2), (16, 3)]
        for k, tid in ticks:
            land_tick(k, tid)
            time_refresh(f"tick_k{k}_refresh")

        # correctness: view == full recompute, row for row
        view_rows = {
            tuple(r) for r in pipe.read(spark, "inventory_current")
            .select("store_id", "item_id", "snapshot_quantity",
                    "change_quantity", "current_inventory", "date_time")
            .collect()
        }
        full_rows = {
            tuple(r) for r in full_gold_df()
            .select("store_id", "item_id", "snapshot_quantity",
                    "change_quantity", "current_inventory", "date_time")
            .collect()
        }
        assert view_rows == full_rows, (
            f"incremental view diverged: {len(view_rows ^ full_rows)} rows differ"
        )
        n_gold = len(view_rows)
        rss_after = rss_mb()

        # actual per-refresh bucket counts from the pipeline's event log
        import json as _json

        bucket_counts = [
            _json.loads(r["details"]).get("num_buckets_refreshed")
            for r in pipe.event_log(spark)
            .filter("event_type = 'flow_progress' AND table_name = 'inventory_current'")
            .orderBy("update_id", "seq")
            .collect()
        ]

        print("\n## Round 12: incremental flagship gold decade "
              f"({n_events/1e6:g}M events + {n_keys/1e6:g}M keys, parquet mode, "
              f"16 store-buckets)\n")
        print(f"- fixture build (distributed): {timings['fixture_build']:.1f} s; "
              f"initial pipeline build {timings['initial_build']:.1f} s "
              f"(silver {timings['stage:inventory_change']:.1f} s, "
              f"CDC {timings['stage:latest_inventory_snapshot']:.1f} s, "
              f"first gold {timings['stage:inventory_current']:.1f} s)")
        print(f"- gold rows: {n_gold}; view == full recompute row-for-row: PASS\n")
        # bucket_counts: [initial(16), k0(0), k1, k4, k16] in run order
        bc = bucket_counts + [None] * 5
        print("| tick | stores touched | buckets refreshed (of 16) | wall s |")
        print("|---|---|---|---|")
        print(f"| no-change | 0 | {bc[1]} | {timings['tick_k0_refresh']:.2f} |")
        for i, (k, tid) in enumerate(ticks):
            print(f"| new events | {k} | {bc[2 + i]} | "
                  f"{timings[f'tick_k{k}_refresh']:.2f} "
                  f"(ingest {timings[f'tick{tid}_ingest']:.2f}) |")
        print(f"| FULL recompute (day-pruned python mode) | all | — | "
              f"{timings['full_recompute']:.2f} |")
        print(f"\n- driver maxrss: {rss_before:.0f} MB before, {rss_after:.0f} MB after")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
