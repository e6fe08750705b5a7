"""Pipeline registry / DAG semantics (the DLT-equivalent layer)."""

import pytest

from pos_dlt_spark.pipeline import CycleError, Pipeline


def test_topo_order_respects_deps(tmp_path):
    pipe = Pipeline("t", str(tmp_path))

    @pipe.table(deps=["b"])
    def c(spark):
        raise NotImplementedError

    @pipe.table(deps=["a"])
    def b(spark):
        raise NotImplementedError

    @pipe.table()
    def a(spark):
        raise NotImplementedError

    order = pipe.topo_order()
    assert order.index("a") < order.index("b") < order.index("c")


def test_cdc_target_ordered_after_source(tmp_path):
    pipe = Pipeline("t", str(tmp_path))

    @pipe.table(deps=["latest"])
    def gold(spark):
        raise NotImplementedError

    @pipe.table()
    def src(spark):
        raise NotImplementedError

    pipe.apply_changes(target="latest", source="src", keys=["k"], sequence_by="ts")
    order = pipe.topo_order()
    assert order.index("src") < order.index("latest") < order.index("gold")


def test_cycle_detection(tmp_path):
    pipe = Pipeline("t", str(tmp_path))

    @pipe.table(deps=["b"])
    def a(spark):
        raise NotImplementedError

    @pipe.table(deps=["a"])
    def b(spark):
        raise NotImplementedError

    with pytest.raises(CycleError):
        pipe.topo_order()


def test_scheduler_honors_intervals(spark, tmp_path):
    """Fake-clock scheduling: a 24 h dim refreshes once until a day has
    passed; the 5-minute gold refreshes each due tick (reference W5)."""
    from pos_dlt_spark.pipeline import PipelineRunner, PipelineScheduler

    pipe = Pipeline("sched", str(tmp_path))
    runs = {"dim": 0, "gold": 0}

    @pipe.table(kind="live", interval="24 hours")
    def dim(spark):
        runs["dim"] += 1
        return spark.range(3).toDF("k")

    @pipe.table(kind="live", interval="5 minutes", deps=["dim"])
    def gold(spark):
        runs["gold"] += 1
        return pipe.read(spark, "dim")

    now = [0.0]
    sched = PipelineScheduler(PipelineRunner(pipe), clock=lambda: now[0])

    assert sched.run_due(spark) == ["dim", "gold"]     # t=0: everything
    now[0] = 600.0
    assert sched.run_due(spark) == ["gold"]            # t=10min: gold only
    now[0] = 700.0
    assert sched.run_due(spark) == []                  # t=11:40: nothing due
    now[0] = 90000.0
    assert sched.run_due(spark) == ["dim", "gold"]     # t>24h: both
    assert runs == {"dim": 2, "gold": 3}


def test_parse_interval():
    from pos_dlt_spark.pipeline import parse_interval

    assert parse_interval("24 hours") == 86400
    assert parse_interval("5 minutes") == 300
    assert parse_interval("1 hour") == 3600
    with pytest.raises(ValueError):
        parse_interval("fortnightly")


def test_table_metadata_recorded(tmp_path):
    pipe = Pipeline("t", str(tmp_path))

    @pipe.table(kind="live", interval="24 hours", comment="dim",
                table_properties={"quality": "silver"}, partition_by=["store_id"])
    def store(spark):
        raise NotImplementedError

    t = pipe.tables["store"]
    assert t.kind == "live"
    assert t.interval == "24 hours"
    assert t.table_properties["quality"] == "silver"
    assert t.partition_by == ["store_id"]


def test_incremental_view_in_pipeline(spark, tmp_path):
    """Pipeline-API wiring of IncrementalKeyedView: declare a bucketed CDC
    flow + an incremental view over it; run_once refreshes in dependency
    order; the view equals a full recompute and a second pass with no new
    data refreshes zero buckets."""
    from datetime import datetime

    from pyspark.sql import functions as F

    from pos_dlt_spark.pipeline import Pipeline, PipelineRunner

    p = Pipeline("incdemo", storage=str(tmp_path / "store"))

    @p.table(kind="live")
    def changes(spark_):
        rows = [(s, i, datetime(2021, 1, 1), s * 10 + i)
                for s in range(1, 4) for i in range(1, 4)]
        return spark_.createDataFrame(
            rows, "store_id long, item_id long, date_time timestamp, quantity long"
        )

    p.apply_changes(
        target="silver", source="changes", keys=["store_id", "item_id"],
        sequence_by="date_time", n_buckets=4, bucket_keys=["store_id"],
    )

    def rollup(df):
        return df.groupBy("store_id").agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("quantity").alias("total_qty"),
        )

    p.incremental_view(target="gold", source="silver", transform=rollup, keys=["store_id"])

    runner = PipelineRunner(p)
    order = runner.run_once(spark)
    assert order.index("changes") < order.index("silver") < order.index("gold")
    got = {tuple(r) for r in p.read(spark, "gold").collect()}
    assert got == {(s, 3, sum(s * 10 + i for i in range(1, 4))) for s in range(1, 4)}
    # idempotent second pass: no source change -> no stale buckets
    from pos_dlt_spark.operators.incremental import IncrementalKeyedView

    flow_ac = runner._flow_ac(p.cdc_flows["silver"])
    view = IncrementalKeyedView(flow_ac, p.table_path("gold"), rollup, keys=["store_id"])
    assert view.stale_buckets() == []


def test_incremental_view_requires_bucketed_source(tmp_path):
    from pos_dlt_spark.pipeline import Pipeline

    p = Pipeline("bad", storage=str(tmp_path / "s"))
    p.apply_changes(target="flat", source="x", keys=["k"], sequence_by="t")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_buckets"):
        p.incremental_view(target="v", source="flat", transform=lambda d: d)


def test_delta_mode_read_stream_rejects_cdc_targets(spark, tmp_path):
    """Delta-mode CDC targets are maintained by delta_merge, which
    removes+rewrites files: a raw file stream over the table dir would
    re-deliver every rewritten row. read_stream must fail fast (same
    rule as live tables), not silently duplicate."""
    pipe = Pipeline("t", str(tmp_path), storage_format="delta")
    pipe.apply_changes(target="latest", source="src", keys=["k"], sequence_by="ts")
    with pytest.raises(ValueError, match="not append-only"):
        pipe.read_stream(spark, "latest")
