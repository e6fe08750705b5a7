"""Tests for the applyInPandasWithState sessionizer: state must carry
open sessions across micro-batches and emit a session only once it is
closed by a later event."""

import datetime as dt

import pandas as pd
import pytest

from pos_dlt_spark.streaming.sessions import sessionize_with_state


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute)


@pytest.fixture()
def run_stream(spark, tmp_path):
    """Feed batches of rows through sessionize_with_state one micro-batch
    each and return every emitted (closed) session row."""

    def run(batches):
        src = tmp_path / "src"
        src.mkdir()
        schema = "user_id long, event_id long, ts timestamp, value double"
        for i, rows in enumerate(batches):
            spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(
                str(src / f"b{i}")
            )
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/*")
        )
        out = sessionize_with_state(stream, gap_seconds=1800)
        q = (
            out.writeStream.format("memory")
            .queryName("sessions_out")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.table("sessions_out").toPandas()

    return run


def test_sessions_close_across_batches(run_stream):
    batches = [
        # batch 1: user 1 events at 12:00, 12:10 (one open session)
        [(1, 1, _ts(0), 1.0), (1, 2, _ts(10), 2.0)],
        # batch 2: 13:30 event closes the first session (gap > 30 min),
        # opens a new one; user 2 appears with a single open session
        [(1, 3, dt.datetime(2024, 1, 1, 13, 30), 5.0), (2, 4, _ts(5), 7.0)],
    ]
    got = run_stream(batches)
    # only user 1's first session is closed; both trailing sessions stay open
    assert len(got) == 1
    row = got.iloc[0]
    assert row.user_id == 1
    assert row.session_start == pd.Timestamp(2024, 1, 1, 12, 0)
    assert row.session_end == pd.Timestamp(2024, 1, 1, 12, 10)
    assert row.n_events == 2
    assert row.sum_value == 3.0


def test_gap_within_batch_emits_immediately(run_stream):
    batches = [
        [(7, 1, _ts(0), 1.0), (7, 2, dt.datetime(2024, 1, 1, 14, 0), 1.0)],
    ]
    got = run_stream(batches)
    assert len(got) == 1
    assert got.iloc[0].n_events == 1
    assert got.iloc[0].session_start == pd.Timestamp(2024, 1, 1, 12, 0)


# ---------------------------------------------------------------------------
# twstate: running per-user stats (GroupState) + transformWithState twin
# ---------------------------------------------------------------------------


def _has_protobuf() -> bool:
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def test_running_stats_batches_accumulate(spark, tmp_path):
    """Two forced micro-batches; the max-seq row per pair must equal the
    union's GROUP BY."""
    import pandas as pd
    from pyspark.sql import functions as F

    from pos_dlt_spark.streaming.twstate import running_user_stats

    land = str(tmp_path / "land")
    rows = [
        (1, "view", 10, 100), (1, "view", 20, 200), (2, "click", 5, 50),
        (1, "view", 30, 300), (2, "click", 7, 400), (2, "view", 1, 500),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, value_u long, ts_us long"
    )
    df.repartition(2).write.parquet(land)
    stream = (
        spark.readStream.schema(df.schema).option("maxFilesPerTrigger", "1").parquet(land)
    )
    name = "tws_test_acc"
    q = (
        running_user_stats(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).toPandas()
    assert out["update_seq"].max() >= 2  # state really crossed batches
    final = (
        out.sort_values("update_seq")
        .groupby(["user_id", "event_type"])
        .last()
        .reset_index()
    )
    want = pd.DataFrame(
        [(1, "view", 3, 60, 300), (2, "click", 2, 12, 400), (2, "view", 1, 1, 500)],
        columns=["user_id", "event_type", "n_events", "sum_value_u", "last_ts_us"],
    )
    got = final[["user_id", "event_type", "n_events", "sum_value_u", "last_ts_us"]]
    got = got.sort_values(["user_id", "event_type"]).reset_index(drop=True)
    assert got.astype({"user_id": "int64"}).equals(want.astype(got.dtypes.to_dict()))


def test_transform_with_state_twin_contract(spark):
    """The StatefulProcessor twin must BUILD against the real API (plan
    construction needs no protobuf); execution runs only where
    google.protobuf exists (absent in this container — documented waiver
    in streaming/twstate.py)."""
    import pytest
    from pos_dlt_spark.streaming.twstate import OUTPUT_SCHEMA, RunningUserStats

    assert RunningUserStats is not None
    df = spark.createDataFrame(
        [(1, "view", 10, 100)],
        "user_id long, event_type string, value_u long, ts_us long",
    )
    plan = df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningUserStats(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
    assert [f.name for f in plan.schema.fields] == [
        "user_id", "event_type", "n_events", "sum_value_u", "last_ts_us", "update_seq",
    ]
    if not _has_protobuf():
        pytest.skip(
            "google.protobuf absent: transformWithState execution PERMANENTLY "
            "waived in this container (r10 adjudication: offline, no wheel "
            "reachable; the generated StateMessage_pb2 needs the full "
            "protobuf runtime — descriptor pool, internal builder, wire "
            "format — which cannot be responsibly re-implemented as a shim). "
            "Auto-unskips wherever protobuf exists; semantics pinned by the "
            "executable GroupState twin + oracle gate."
        )
    assert plan.count() >= 0


# ---------------------------------------------------------------------------
# watermark late-data semantics (SURVEY W1/W6): rows older than the
# watermark are dropped from stateful aggregation, and the drop is
# observable in the query's progress metrics
# ---------------------------------------------------------------------------


def test_watermark_drops_late_rows_in_append_agg(spark, tmp_path):
    import json as _json

    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    land = str(tmp_path / "late_land")
    schema = "user_id long, ts timestamp, value long"
    # batch 1: events at minute 0 and minute 30 -> watermark advances to 30m-10m=20m
    b1 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 0), 1), (1, dt.datetime(2024, 1, 1, 12, 30), 1)],
        schema,
    )
    # batch 2: a LATE event at minute 1 (window [0,10) closed: watermark 20m) and
    # a fresh one at minute 40
    b2 = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 12, 1), 100), (1, dt.datetime(2024, 1, 1, 12, 40), 1)],
        schema,
    )
    import os as _os

    _os.makedirs(land)
    b1.coalesce(1).write.mode("append").parquet(land)
    stream = (
        spark.readStream.schema(b1.schema).option("maxFilesPerTrigger", "100").parquet(land)
    )
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"))
        .agg(F.sum("value").alias("s"))
    )
    q = (
        agg.writeStream.format("memory").queryName("late_agg")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.processAllAvailable()
    b2.coalesce(1).write.mode("append").parquet(land)
    q.processAllAvailable()
    q.stop()
    rows = {
        (r["window"]["start"].minute, r["s"])
        for r in spark.table("late_agg").collect()
    }
    # the late value=100 must NOT appear in any emitted window; the
    # [0,10) window closed with s=1
    assert (0, 1) in rows
    assert not any(s >= 100 for _, s in rows), rows
    # and the drop is observable: some progress reported a dropped row
    dropped = 0
    for p in q.recentProgress:
        for op in _json.loads(p.json).get("stateOperators", []):
            dropped += op.get("numRowsDroppedByWatermark", 0)
    assert dropped >= 1
