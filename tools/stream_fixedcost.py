"""Streaming-family fixed-cost breakdown (VERDICT r07 #5 evidence).

For each heavy streaming gate, measures side by side at sf0.1:

- the GATE itself (steady pass: fixtures pre-warmed by a first run), and
- a FLOOR stream over the SAME landing directory with the same
  micro-batching (maxFilesPerTrigger / availableNow / fresh checkpoint /
  memory sink) but a trivial stateless aggregate — i.e. pure Structured
  Streaming machinery: query start/plan, per-batch addBatch scheduling,
  offset/commit log writes, sink, stop.

gate - floor = the semantic work the gate's operator actually adds
(stateful processing, joins, watermark eviction). If the floor dominates,
the family's wall is the machinery's price, not a fixable plan problem.

Usage: python tools/stream_fixedcost.py [sf_dir]
Transfer numbers to SCALE.md by hand (host-dependent).
"""

from __future__ import annotations

import atexit
import os
import shutil
import sys
import time
import uuid

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def floor_run(spark, land: str, schema, max_files: str | None) -> tuple[float, int]:
    """One trivial-agg stream over the gate's own landing dir; returns
    (wall seconds, micro-batch count)."""
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("floor_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    name = f"floor_{uuid.uuid4().hex[:8]}"
    rs = spark.readStream.schema(schema)
    if max_files:
        rs = rs.option("maxFilesPerTrigger", max_files)
    stream = rs.parquet(land)
    t0 = time.perf_counter()
    q = (
        stream.groupBy().count()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = len([p for p in q.recentProgress if p["numInputRows"] is not None])
    spark.catalog.dropTempView(name)
    return wall, batches


def stateful_floor_run(
    spark, land: str, schema, max_files: str | None, key_col: str
) -> tuple[float, int]:
    """Minimal applyInPandasWithState stream over the same landing: one
    int of state per key, emit one row per key per batch — the pandas
    state-store machinery (JVM<->Arrow round trips, state snapshots,
    16 state partitions) with near-zero user logic."""
    from pyspark.sql.streaming.state import GroupStateTimeout
    from pos_dlt_spark.tables import scratch_dir
    from pos_dlt_spark import queries_streaming as qs

    work = scratch_dir("sfloor_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    name = f"sfloor_{uuid.uuid4().hex[:8]}"
    rs = spark.readStream.schema(schema)
    if max_files:
        rs = rs.option("maxFilesPerTrigger", max_files)
    stream = rs.parquet(land)

    def fn(key, pdfs, state):
        import pandas as pd

        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"k": [key[0]], "n": [n]})

    out = stream.groupBy(key_col).applyInPandasWithState(
        fn, "k long, n long", "n long",
        "append", GroupStateTimeout.NoTimeout,
    )
    t0 = time.perf_counter()
    with qs._stream_state_partitions(spark, n=16):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", os.path.join(work, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    wall = time.perf_counter() - t0
    batches = len(q.recentProgress)
    spark.catalog.dropTempView(name)
    return wall, batches


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pos_dlt_spark.session import get_spark
    import __spark_entry__ as entry  # noqa: F401  (registry import)
    from pos_dlt_spark import queries_streaming as qs
    from pos_dlt_spark.queries import REGISTRY

    spark = get_spark("stream_fixedcost")
    gates = [
        # (gate, landing cache key, maxFilesPerTrigger of the gate)
        ("streaming_user_running_stats", "tws_stats", "2"),
        ("streaming_update_mode_rollup", "upd_rollup", None),
        ("streaming_cdc_latest_state", "cdc_stream", None),
        ("streaming_cdc_bucketed_state", "cdc_bucketed", None),
        ("streaming_corpus_ingest", "corpus_stream", None),
        ("streaming_incremental_gold", "inc_gold", None),
        ("streaming_ann_index_build", "ann_ingest", None),
    ]
    print(f"[fixedcost] sf_dir={sf_dir}")
    for gate, key, max_files in gates:
        fn = REGISTRY[gate].fn
        # warm pass builds landings/fixtures; steady pass is the measure
        fn(spark, sf_dir).collect()
        t0 = time.perf_counter()
        n_rows = fn(spark, sf_dir).count()
        gate_wall = time.perf_counter() - t0
        k = (os.path.abspath(sf_dir), key)
        land = qs._LANDING_CACHE.get(k)
        if land is None:
            # gate uses per-call scratch; fall back to any cached landing
            cands = [v for (sfd, kk), v in qs._LANDING_CACHE.items() if sfd == os.path.abspath(sf_dir)]
            land = cands[0] if cands else None
        if land is None:
            print(f"[fixedcost] {gate}: gate={gate_wall:.2f}s rows={n_rows} (no landing; floor skipped)")
            continue
        schema = spark.read.parquet(land).schema
        floor_wall, batches = floor_run(spark, land, schema, max_files)
        key_col = next(
            (c for c in ("user_id", "doc_id", "store_id", "emb_id", "id")
             if c in schema.fieldNames()),
            schema.fieldNames()[0],
        )
        sfloor_wall, sbatches = stateful_floor_run(
            spark, land, schema, max_files, key_col
        )
        print(
            f"[fixedcost] {gate}: gate={gate_wall:.2f}s "
            f"floor={floor_wall:.2f}s sfloor={sfloor_wall:.2f}s "
            f"({batches}/{sbatches} batches) "
            f"semantic_delta={gate_wall - sfloor_wall:.2f}s rows={n_rows}"
        )


if __name__ == "__main__":
    main()
