"""Stateful-streaming state-store stress (VERDICT r03 #5).

SCALE.md's batch decades deliberately excluded stateful streaming; this
harness answers the 100x-cluster question for it with the RocksDB
state-store provider (the spill-capable provider a real cluster runs,
vs the default in-heap HDFS-backed maps):

1. Does per-batch latency depend on RESIDENT state size? The honest
   experiment holds TOUCHED groups per batch constant (a fixed key
   window) while resident state scales a decade per case — seeded by
   extra micro-batches that are excluded from the measured stats. If the
   measured batches stay flat while resident state is 10x/100x bigger,
   per-batch cost is O(touched), which is what survives a 1000-executor
   scale-up (state shards further; touched-per-partition stays bounded).

2. Does state grow linearly in keys, and (for sessionization) does the
   watermark actually EVICT closed sessions so state tracks open
   sessions, not stream length?

Operators, same shapes as the registry queries:
  running_stats — applyInPandasWithState per-user aggregates
                  (streaming_user_running_stats). The Python stateful
                  path pays ~per-touched-group overhead (measured
                  separately: 10x touched groups => ~7x batch time at
                  constant rows), so the resident-decade cases keep
                  touched groups fixed.
  sessionized   — native session_window gap sessions
                  (streaming_sessionized_native), JVM-side.

Usage: python tools/state_stress.py
Prints one JSON line; stderr carries per-case progress.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)

TOUCHED = 20_000  # keys touched by every measured batch (and its row count)
N_MEASURE = 5


def build_session():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName("state_stress")
        .master("local[32]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.streaming.stateStore.providerClass", ROCKSDB)
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _write_batch(spark, root: str, key_lo: int, key_hi: int, hour: int):
    """One micro-batch file: keys [key_lo, key_hi), one row per key,
    event time in hour `hour` (distinct mtime => ordered delivery)."""
    from pyspark.sql import functions as F

    (
        spark.range(key_hi - key_lo)
        .select(
            (F.col("id") + key_lo).alias("user_id"),
            F.timestamp_micros(
                (F.lit(hour * 3600) + F.col("id") % 600) * 1_000_000
            ).alias("ts"),
            (F.col("id") % 100).cast("double").alias("value"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(root)
    )
    time.sleep(0.05)


def run_case(spark, kind: str, resident_keys: int, seed_chunk: int) -> dict:
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    work = tempfile.mkdtemp(prefix=f"state_{kind}_{resident_keys}_", dir="/dev/shm")
    land = os.path.join(work, "landing")
    os.makedirs(land, exist_ok=True)

    # seed files: distinct key ranges up to resident_keys (hour 0)
    n_seed = 0
    lo = TOUCHED  # keys [0, TOUCHED) belong to the measured window
    while lo < resident_keys:
        hi = min(lo + seed_chunk, resident_keys)
        _write_batch(spark, land, lo, hi, hour=0)
        lo = hi
        n_seed += 1
    # measured files: always keys [0, TOUCHED), advancing event time so
    # rows are new events on EXISTING keys
    for b in range(N_MEASURE):
        _write_batch(spark, land, 0, TOUCHED, hour=b)

    schema = spark.read.parquet(land).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(land)
    )

    if kind == "running_stats":

        def fn(key, pdfs, state: GroupState):
            n, s = state.get if state.exists else (0, 0.0)
            for p in pdfs:
                n += len(p)
                s += float(p["value"].sum())
            state.update((n, s))
            yield pd.DataFrame({"user_id": [key[0]], "n": [n], "s": [s]})

        out = stream.groupBy("user_id").applyInPandasWithState(
            fn,
            outputStructType="user_id long, n long, s double",
            stateStructType="n long, s double",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        mode = "update"
    elif kind == "sessionized":
        # 48 h watermark delay: nothing evicts during the run, so resident
        # session state == seeded keys (the eviction property is measured
        # by the separate 'eviction' case below)
        out = (
            stream.withWatermark("ts", "48 hours")
            .groupBy(
                F.session_window("ts", "30 minutes").alias("w"), F.col("user_id")
            )
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        )
        mode = "append"
    else:
        raise ValueError(kind)

    q = (
        out.writeStream.format("noop")
        .outputMode(mode)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    shutil.rmtree(work, ignore_errors=True)

    measured = prog[n_seed:]  # drop seeding batches from the stats
    add_ms = [p["durationMs"].get("addBatch", 0) for p in measured]
    st_last = (prog[-1].get("stateOperators") or [{}])[0]
    mem = st_last.get("stateMemory") or st_last.get("memoryUsedBytes") or 0
    custom = st_last.get("customMetrics") or {}
    sst = custom.get("rocksdbSstFileSize", custom.get("rocksdbTotalSSTFilesBytes", 0))
    return {
        "op": kind,
        "resident_keys": resident_keys,
        "touched_per_batch": TOUCHED,
        "n_seed_batches": n_seed,
        "n_measured_batches": len(measured),
        "median_addBatch_ms": int(statistics.median(add_ms)) if add_ms else -1,
        "max_addBatch_ms": max(add_ms) if add_ms else -1,
        "state_rows": st_last.get("numRowsTotal", -1),
        "state_memory_mb": round(mem / 1e6, 1),
        "rocksdb_sst_mb": round((sst or 0) / 1e6, 1),
    }


def run_eviction_case(spark) -> dict:
    """Sessionization with a tight watermark: 12 batches, each touching
    the SAME 20k users but 2 h apart (> the 30 min gap + 10 min delay),
    so every batch closes the previous sessions. State must stay flat
    (~open sessions) while cumulative input grows 12x — the eviction
    property that bounds session state at 100 TB/day."""
    from pyspark.sql import functions as F

    work = tempfile.mkdtemp(prefix="state_evict_", dir="/dev/shm")
    land = os.path.join(work, "landing")
    os.makedirs(land, exist_ok=True)
    for b in range(12):
        _write_batch(spark, land, 0, TOUCHED, hour=2 * b)
    schema = spark.read.parquet(land).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(land)
    )
    out = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    prog = [p for p in q.recentProgress if p.get("numInputRows", 0) > 0]
    shutil.rmtree(work, ignore_errors=True)
    rows = [
        (p["stateOperators"][0].get("numRowsTotal", -1)) for p in prog if p.get("stateOperators")
    ]
    removed = sum(
        p["stateOperators"][0].get("numRowsRemoved", 0)
        for p in prog
        if p.get("stateOperators")
    )
    return {
        "op": "sessionized_eviction",
        "touched_per_batch": TOUCHED,
        "n_batches": len(prog),
        "state_rows_per_batch": rows,
        "total_rows_removed": removed,
        "max_state_rows": max(rows) if rows else -1,
    }


def main() -> None:
    spark = build_session()
    results = []
    # Python stateful path: two decades (seeding cost is per-touched-group
    # on this path, so the 1M decade would spend minutes seeding; the JVM
    # path below carries the 100x decade)
    for resident in (20_000, 200_000):
        r = run_case(spark, "running_stats", resident, seed_chunk=60_000)
        print(f"# {r}", file=sys.stderr, flush=True)
        results.append(r)
    # JVM session_window path: three decades incl. 100x
    for resident in (20_000, 200_000, 2_000_000):
        r = run_case(spark, "sessionized", resident, seed_chunk=200_000)
        print(f"# {r}", file=sys.stderr, flush=True)
        results.append(r)
    r = run_eviction_case(spark)
    print(f"# {r}", file=sys.stderr, flush=True)
    results.append(r)
    print(json.dumps({"touched_per_batch": TOUCHED, "results": results}))


if __name__ == "__main__":
    main()
