"""Full refresh / ``pipelines.reset.allowed`` (VERDICT r11 #3): a full
refresh drops stored state + checkpoints and recomputes from scratch,
reproducing the incremental result exactly — except tables that forbid
reset, whose data must survive."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.pipeline import Pipeline, PipelineRunner


def _land(d, name, rows):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, name), "w") as fh:
        fh.write("\n".join(json.dumps(r) for r in rows))


def test_full_refresh_reproduces_incremental_pos_gold(
    spark, pos_fixtures, tmp_path
):
    """The POS pipeline: two incremental updates, then a FULL refresh —
    the recomputed gold must equal the incremental gold row for row,
    and the event log must carry the update_mode + per-table resets."""
    from pos_dlt_spark.pos_pipeline import build_pos_pipeline

    pipe = build_pos_pipeline(str(tmp_path / "storage"), pos_fixtures.root)
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    runner.run_once(spark)
    before = sorted(
        tuple(r) for r in pipe.read(spark, "inventory_current").collect()
    )
    runner.run_once(spark, full_refresh=True)
    after = sorted(
        tuple(r) for r in pipe.read(spark, "inventory_current").collect()
    )
    assert after == before
    ev = pipe.event_log(spark).orderBy("update_id", "seq").collect()
    modes = [
        json.loads(e["details"]).get("update_mode")
        for e in ev if e["event_type"] == "update_start"
    ]
    assert modes == ["INCREMENTAL", "INCREMENTAL", "FULL_REFRESH"]
    resets = {e["table_name"] for e in ev if e["event_type"] == "reset"}
    assert "inventory_change" in resets and "latest_inventory_snapshot" in resets


def test_reset_allowed_false_table_survives(spark, tmp_path):
    """A stream table with pipelines.reset.allowed=false keeps its data
    across a full refresh even when its source files are GONE (DLT's
    limited-retention-source protection); an unprotected sibling loses
    the vanished rows."""
    src_a = str(tmp_path / "in_a")
    src_b = str(tmp_path / "in_b")
    _land(src_a, "f1.json", [{"k": 1}, {"k": 2}])
    _land(src_b, "f1.json", [{"k": 10}, {"k": 20}])
    pipe = Pipeline("fr", str(tmp_path / "storage"))

    @pipe.table(kind="stream",
                table_properties={"pipelines.reset.allowed": "false"})
    def protected(spark_):
        return spark_.readStream.schema("k BIGINT").json(src_a)

    @pipe.table(kind="stream")
    def unprotected(spark_):
        return spark_.readStream.schema("k BIGINT").json(src_b)

    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    # retention expires the first files; new data lands
    os.remove(os.path.join(src_a, "f1.json"))
    os.remove(os.path.join(src_b, "f1.json"))
    _land(src_a, "f2.json", [{"k": 3}])
    _land(src_b, "f2.json", [{"k": 30}])
    runner.run_once(spark, full_refresh=True)
    got_p = sorted(r["k"] for r in pipe.read(spark, "protected").collect())
    got_u = sorted(r["k"] for r in pipe.read(spark, "unprotected").collect())
    # protected: old rows survive, new rows appended incrementally
    assert got_p == [1, 2, 3], got_p
    # unprotected: rebuilt from what is still on disk
    assert got_u == [30], got_u
    skipped = [
        e["table_name"] for e in pipe.event_log(spark).collect()
        if e["event_type"] == "reset_skipped"
    ]
    assert skipped == ["protected"]


def test_cdc_flow_reset_allowed_false(spark, tmp_path):
    """apply_changes(reset_allowed=False): the CDC target's merged state
    survives a full refresh even though its source stream was reset."""
    src = str(tmp_path / "in")
    _land(src, "b1.json", [{"k": 1, "v": "a", "seq": 1},
                           {"k": 2, "v": "b", "seq": 1}])
    pipe = Pipeline("frc", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def feed(spark_):
        return spark_.readStream.schema("k BIGINT, v STRING, seq BIGINT").json(src)

    pipe.apply_changes(target="cur", source="feed", keys=["k"],
                       sequence_by="seq", reset_allowed=False)
    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    os.remove(os.path.join(src, "b1.json"))  # source retention expired
    _land(src, "b2.json", [{"k": 1, "v": "a2", "seq": 2}])
    runner.run_once(spark, full_refresh=True)
    got = sorted((r["k"], r["v"]) for r in pipe.read(spark, "cur").collect())
    # k=2 came only from the expired file: it survives because the CDC
    # target refused the reset; k=1 still advances to seq 2
    assert got == [(1, "a2"), (2, "b")], got


def test_partial_full_refresh_selection(spark, tmp_path):
    """full_refresh=[names]: only the selection is reset."""
    src = str(tmp_path / "in")
    _land(src, "f1.json", [{"k": 1}])
    pipe = Pipeline("frp", str(tmp_path / "storage"))

    @pipe.table(kind="stream")
    def a(spark_):
        return spark_.readStream.schema("k BIGINT").json(src)

    @pipe.table(kind="stream")
    def b(spark_):
        return spark_.readStream.schema("k BIGINT").json(src)

    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    os.remove(os.path.join(src, "f1.json"))
    _land(src, "f2.json", [{"k": 2}])
    runner.run_once(spark, full_refresh=["a"])
    got_a = sorted(r["k"] for r in pipe.read(spark, "a").collect())
    got_b = sorted(r["k"] for r in pipe.read(spark, "b").collect())
    assert got_a == [2], got_a          # reset: rebuilt from surviving files
    assert got_b == [1, 2], got_b       # untouched: keeps old + ingests new
    ev = pipe.event_log(spark).orderBy("update_id", "seq").collect()
    modes = [json.loads(e["details"]).get("update_mode")
             for e in ev if e["event_type"] == "update_start"]
    assert modes[-1] == "PARTIAL_FULL_REFRESH"


def test_full_refresh_rearms_once_flow(spark, tmp_path):
    """A once=True backfill flow re-runs after a full refresh (DLT's
    documented re-arm) — and the rebuilt target matches the original."""
    live = str(tmp_path / "live")
    hist = str(tmp_path / "hist")
    _land(live, "l1.json", [{"k": 1}])
    _land(hist, "h1.json", [{"k": 100}])
    pipe = Pipeline("fro", str(tmp_path / "storage"))
    pipe.create_streaming_table("bronze")

    @pipe.append_flow(target="bronze", name="liveflow")
    def liveflow(spark_):
        return spark_.readStream.schema("k BIGINT").json(live)

    @pipe.append_flow(target="bronze", name="backfill", once=True)
    def backfill(spark_):
        return spark_.readStream.schema("k BIGINT").json(hist)

    runner = PipelineRunner(pipe)
    runner.run_once(spark)
    runner.run_once(spark)  # once-flow skipped here
    before = sorted(r["k"] for r in pipe.read(spark, "bronze").collect())
    assert before == [1, 100]
    runner.run_once(spark, full_refresh=True)
    after = sorted(r["k"] for r in pipe.read(spark, "bronze").collect())
    assert after == before  # backfill re-ran exactly once into the empty table
