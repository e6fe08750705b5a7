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
