"""Stateful-streaming state-store stress (VERDICT r03 #5).

SCALE.md's batch decades deliberately excluded stateful streaming; this
harness answers the 100x-cluster question for it: does state grow
linearly in keys and does PER-BATCH latency stay flat when the key
cardinality grows 100x, with the RocksDB state-store provider (the
spill-to-disk provider a real cluster runs, vs the default
HDFS-backed in-JVM-heap maps that would OOM first)?

Two operators, the same shapes as the registry queries:
  running_stats — applyInPandasWithState per-user aggregates
                  (streaming_user_running_stats's operator);
  sessionized   — native session_window gap sessions
                  (streaming_sessionized_native's operator).

For each: replay a fixed number of micro-batches (maxFilesPerTrigger)
over a corpus with K unique keys, K in {base, 10x, 100x}, holding ROWS
PER BATCH constant — so a flat per-batch latency curve means the state
store's cost is O(touched rows), not O(total state), which is the
property that survives a 1000-executor scale-up (state partitions only
shard further).

Records per run: median/max addBatch ms across batches, final
stateOperators numRowsTotal, stateMemory bytes (RocksDB's
memoryUsedBytes + the provider's on-disk SST footprint via
customMetrics).

Usage: python tools/state_stress.py [rows_per_batch] [n_batches]
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
    spark.sparkContext.setLogLevel("WARN")
    return spark


def gen_batches(spark, root: str, n_keys: int, rows_per_batch: int, n_batches: int):
    """One parquet file per micro-batch; keys round-robin over n_keys so
    every batch touches ~rows_per_batch distinct-ish keys and total state
    converges to n_keys rows. Timestamps advance batch over batch."""
    from pyspark.sql import functions as F

    for b in range(n_batches):
        (
            spark.range(rows_per_batch)
            .select(
                F.pmod(F.col("id") * 2654435761 + b, F.lit(n_keys)).alias("user_id"),
                F.timestamp_micros(
                    (F.lit(b * 3600) + F.col("id") % 3000) * 1_000_000
                ).alias("ts"),
                (F.col("id") % 100).cast("double").alias("value"),
            )
            .coalesce(1)
            .write.mode("append")
            .parquet(root)
        )
        # distinct mtimes => file-stream delivers in batch order
        time.sleep(0.05)


def drain(q) -> list[dict]:
    q.awaitTermination()
    return [p.asDict(recursive=True) if hasattr(p, "asDict") else p for p in q.recentProgress]


def run_case(spark, kind: str, n_keys: int, rows_per_batch: int, n_batches: int) -> dict:
    import pandas as pd

    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    work = tempfile.mkdtemp(prefix=f"state_{kind}_{n_keys}_")
    land = os.path.join(work, "landing")
    gen_batches(spark, land, n_keys, rows_per_batch, n_batches)
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
        out = (
            stream.withWatermark("ts", "30 minutes")
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
    prog = drain(q)
    shutil.rmtree(work, ignore_errors=True)

    batches = [p for p in prog if p.get("numInputRows", 0) > 0]
    add_ms = [p["durationMs"].get("addBatch", 0) for p in batches]
    st = [p["stateOperators"][0] for p in batches if p.get("stateOperators")]
    last = st[-1] if st else {}
    mem = last.get("stateMemory") or last.get("memoryUsedBytes") or 0
    custom = last.get("customMetrics") or {}
    sst = custom.get("rocksdbSstFileSize", custom.get("rocksdbTotalSSTFilesBytes", 0))
    return {
        "op": kind,
        "n_keys": n_keys,
        "n_batches": len(batches),
        "median_addBatch_ms": int(statistics.median(add_ms)) if add_ms else -1,
        "max_addBatch_ms": max(add_ms) if add_ms else -1,
        "state_rows": last.get("numRowsTotal", -1),
        "state_memory_mb": round(mem / 1e6, 1),
        "rocksdb_sst_mb": round((sst or 0) / 1e6, 1),
    }


def main() -> None:
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_session()
    base = 10_000
    results = []
    for kind in ("running_stats", "sessionized"):
        for mult in (1, 10, 100):
            r = run_case(spark, kind, base * mult, rows_per_batch, n_batches)
            print(f"# {r}", file=sys.stderr, flush=True)
            results.append(r)
    print(json.dumps({"rows_per_batch": rows_per_batch, "results": results}))


if __name__ == "__main__":
    main()
