"""Pipeline event log (VERDICT r10 #2): a persistent, queryable run
ledger — update lifecycle, per-flow row counts, per-constraint
expectation metrics, CDC upsert/delete counts — readable via
``Pipeline.event_log(spark)``. DLT's event log surface (the one the
reference's job UI renders, `05_DLT Job Scheduling.py:32-36`)."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.pipeline import ExpectationFailed, Pipeline, PipelineRunner


def _events(spark, pipe):
    rows = pipe.event_log(spark).collect()
    return [
        (r["update_id"], r["seq"], r["event_type"], r["table_name"],
         json.loads(r["details"]))
        for r in sorted(rows, key=lambda r: (r["update_id"], r["seq"]))
    ]


def _mk_pipe(tmp_path, with_fail=False):
    pipe = Pipeline("evt", str(tmp_path / "storage"))

    @pipe.table(kind="live")
    def src(spark_):
        return spark_.range(0, 100).select(
            "id", (F.col("id") % 5).alias("grp"), (F.col("id") * 2).alias("qty")
        )

    @pipe.table(kind="live")
    @pipe.expect_or_drop("big_qty", "qty >= 40")
    def clean(spark_):
        return pipe.read(spark_, "src")

    if with_fail:
        @pipe.table(kind="live")
        @pipe.expect_or_fail("no_nulls", "id < 50")
        def strict(spark_):
            return pipe.read(spark_, "clean")

    return pipe


def test_event_log_two_updates_exact_entries(spark, tmp_path):
    """Two run_once passes -> two ledgered updates with exact per-flow
    rows_written and per-constraint passed/failed counts, each verified
    against an independent recomputation."""
    pipe = _mk_pipe(tmp_path)
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    runner.run_once(spark)
    ev = _events(spark, pipe)
    assert {e[0] for e in ev} == {0, 1}
    for uid in (0, 1):
        upd = [e for e in ev if e[0] == uid]
        # seq is gapless and starts at 0 within the update
        assert [e[1] for e in upd] == list(range(len(upd)))
        assert upd[0][2] == "update_start"
        assert upd[-1][2] == "update_complete"
        assert upd[-1][4]["status"] == "COMPLETED"
        assert upd[-1][4]["tables"] == ["src", "clean"]
        # flow rows: src writes 100; clean drops qty < 40 (ids 0..19)
        fc = {e[3]: e[4] for e in upd if e[2] == "flow_complete"}
        assert fc["src"]["rows_written"] == 100
        assert fc["clean"]["rows_written"] == 80
        exp = [e for e in upd if e[2] == "expectation"]
        assert len(exp) == 1 and exp[0][3] == "clean"
        assert exp[0][4] == {
            "name": "big_qty", "action": "drop", "passed": 80, "failed": 20,
        }


def test_event_log_failed_update_recorded_and_parseable(spark, tmp_path):
    """A FAIL UPDATE mid-run: the update closes with status FAILED, all
    events flushed before the failure stay readable (append atomicity),
    and the next update gets a fresh id."""
    pipe = _mk_pipe(tmp_path, with_fail=True)
    runner = PipelineRunner(pipe)
    with pytest.raises(ExpectationFailed):
        runner.run_once(spark)
    ev = _events(spark, pipe)
    upd0 = [e for e in ev if e[0] == 0]
    assert upd0[-1][2] == "update_complete"
    assert upd0[-1][4]["status"] == "FAILED"
    # the successful upstream flows were ledgered before the failure
    fc = {e[3] for e in upd0 if e[2] == "flow_complete"}
    assert fc == {"src", "clean"}
    # the failing constraint's expectation event IS in the ledger
    exp = {e[3]: e[4] for e in upd0 if e[2] == "expectation"}
    assert exp["strict"]["failed"] == 50 and exp["strict"]["action"] == "fail"
    # raw file: every line is complete JSON (single-write append)
    log_dir = os.path.join(pipe.storage, "_event_log")
    for n in os.listdir(log_dir):
        with open(os.path.join(log_dir, n)) as fh:
            for line in fh:
                json.loads(line)
    # next update starts fresh
    pipe2 = _mk_pipe(tmp_path)  # same storage, no failing table
    PipelineRunner(pipe2).run_once(spark)
    ev2 = _events(spark, pipe2)
    assert max(e[0] for e in ev2) == 1


def test_event_log_standalone_run_table_is_an_update(spark, tmp_path):
    pipe = _mk_pipe(tmp_path)
    runner = PipelineRunner(pipe)
    runner.run_table(spark, "src")
    ev = _events(spark, pipe)
    assert [e[2] for e in ev] == [
        "update_start", "flow_start", "flow_complete", "update_complete",
    ]
    assert ev[-1][4]["tables"] == ["src"]


def test_event_log_cdc_flow_counts(spark, tmp_path):
    """apply_changes flows ledger per-batch flow_progress and a summed
    flow_complete with the documented source-side upsert/delete
    contract, for SCD1 and SCD2 alike."""
    in_dir = str(tmp_path / "land")
    os.makedirs(in_dir)
    pipe = Pipeline("evtcdc", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        return spark_.readStream.schema(
            "k BIGINT, v STRING, seq BIGINT, op STRING"
        ).json(in_dir)

    pipe.apply_changes(
        target="latest", source="feed", keys=["k"], sequence_by="seq",
        apply_as_deletes="op = 'D'", except_column_list=["op"],
    )
    runner = PipelineRunner(pipe)
    rows = [
        {"k": 1, "v": "a", "seq": 1, "op": "U"},
        {"k": 1, "v": "a2", "seq": 2, "op": "U"},  # same key: one winner
        {"k": 2, "v": "b", "seq": 1, "op": "U"},
        {"k": 3, "v": "c", "seq": 1, "op": "D"},   # tombstone
    ]
    with open(os.path.join(in_dir, "b1.json"), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))
    runner.run_once(spark)
    ev = _events(spark, pipe)
    fc = next(e for e in ev if e[2] == "flow_complete" and e[3] == "latest")
    assert fc[4] == {
        "num_source_rows": 4, "num_upserted_rows": 2,
        "num_deleted_rows": 1, "num_batches": 1,
    }
    prog = [e for e in ev if e[2] == "flow_progress"]
    assert len(prog) == 1 and prog[0][4]["num_source_rows"] == 4


def test_event_log_empty_before_first_update(spark, tmp_path):
    pipe = _mk_pipe(tmp_path)
    df = pipe.event_log(spark)
    assert df.count() == 0
    assert set(df.columns) == {
        "update_id", "seq", "ts", "event_type", "table_name", "details"
    }
