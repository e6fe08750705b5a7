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
