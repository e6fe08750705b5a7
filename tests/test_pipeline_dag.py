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
