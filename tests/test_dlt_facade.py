"""pos_dlt_spark.dlt — the module-level DLT-compatible facade.

Pins that reference-style notebook code (`03_Bronze-to-Silver ETL.py`:
``import dlt``, 0-arg ``@dlt.table`` functions over the ambient
``spark``, ``dlt.read_stream``, ``dlt.create_target_table`` +
``dlt.apply_changes``) runs through this engine with an import swap and
an explicit pipeline scope."""

import json
import os

import pytest
from pyspark.sql import functions as F

import pos_dlt_spark.dlt as dlt
from pos_dlt_spark.pipeline import PipelineRunner


def test_reference_shape_end_to_end(spark, tmp_path):
    """The reference notebook's authoring shape, ported: a bronze text
    stream, a silver parse over dlt.read_stream, a dim with the 24-hour
    trigger interval in spark_conf, and a CDC target via
    create_target_table + apply_changes — all 0-arg functions using the
    ambient dlt.spark."""
    in_dir = str(tmp_path / "events")
    os.makedirs(in_dir)
    dim_csv = str(tmp_path / "dim.csv")
    with open(dim_csv, "w") as f:
        f.write("store_id,name\n1,cleveland\n2,online\n")

    from pos_dlt_spark.dlt import spark as ambient  # the notebook global

    with dlt.pipeline("ref_shape", str(tmp_path / "storage")) as pipe:

        @dlt.table(
            name="store",
            comment="data associated with individual store locations",
            table_properties={"quality": "silver"},
            spark_conf={"pipelines.trigger.interval": "24 hours"},
        )
        def store():
            return (
                ambient.read.csv(
                    dim_csv, header=True, schema="store_id INT, name STRING"
                )
            )

        @dlt.table(name="raw_events", table_properties={"quality": "bronze"})
        def raw_events():
            return ambient.readStream.format("text").load(in_dir)

        @dlt.table(name="parsed", table_properties={"quality": "silver"})
        def parsed():
            return (
                dlt.read_stream("raw_events")
                .withColumn(
                    "event",
                    F.from_json(
                        F.col("value").cast("string"),
                        "store_id INT, item_id INT, qty INT, seq INT",
                    ),
                )
                .select("event.store_id", "event.item_id", "event.qty", "event.seq")
            )

        dlt.create_target_table("latest_state")
        dlt.apply_changes(
            target="latest_state",
            source="parsed",
            keys=["store_id", "item_id"],
            sequence_by="seq",
        )

    assert pipe.tables["store"].interval == "24 hours"
    assert pipe.tables["store"].kind == "auto"

    with open(os.path.join(in_dir, "b1.json"), "w") as f:
        for r in [
            {"store_id": 1, "item_id": 10, "qty": 5, "seq": 1},
            {"store_id": 1, "item_id": 10, "qty": 7, "seq": 2},
            {"store_id": 2, "item_id": 20, "qty": 3, "seq": 1},
        ]:
            f.write(json.dumps(r) + "\n")
    runner = PipelineRunner(pipe)
    runner.run_once(spark)

    # auto-kind resolved from the materialized frames
    assert pipe.tables["store"].kind == "live"
    assert pipe.tables["raw_events"].kind == "stream"
    assert pipe.tables["parsed"].kind == "stream"

    got = sorted(
        (r["store_id"], r["item_id"], r["qty"])
        for r in pipe.read(spark, "latest_state").collect()
    )
    assert got == [(1, 10, 7), (2, 20, 3)], got
    assert sorted(
        r["name"] for r in pipe.read(spark, "store").collect()
    ) == ["cleveland", "online"]


def test_view_inlines_into_consumer(spark, tmp_path):
    """@dlt.view is an unmaterialized intermediate: consumers inline its
    plan; no storage appears for it."""
    with dlt.pipeline("views", str(tmp_path / "storage")) as pipe:

        @dlt.view
        def doubled():
            return dlt.spark.range(0, 5).select(
                (F.col("id") * 2).alias("v")
            )

        @dlt.table
        def summed():
            return dlt.read("doubled").agg(
                F.sum("v").cast("bigint").alias("total")
            )

    PipelineRunner(pipe).run_once(spark)
    assert pipe.read(spark, "summed").collect()[0]["total"] == 20
    assert not os.path.exists(pipe.table_path("doubled"))
    with pytest.raises(Exception):
        pipe.read(spark, "doubled")


def test_auto_cdc_new_names_and_validation(spark, tmp_path):
    """Current-DLT names create_auto_cdc_flow /
    create_auto_cdc_from_snapshot_flow register the same flows; a
    create_target_table with no arriving flow fails at scope exit; out-
    of-context calls refuse."""
    with dlt.pipeline("autocdc", str(tmp_path / "s1")) as pipe:

        @dlt.table
        def feed():
            return dlt.spark.readStream.schema(
                "k INT, v STRING, seq INT"
            ).json(str(tmp_path / "land"))

        dlt.create_target_table("t")
        dlt.create_auto_cdc_flow(
            target="t", source="feed", keys=["k"], sequence_by="seq"
        )
    assert "t" in pipe.cdc_flows

    with pytest.raises(dlt.DltContextError, match="orphan|no apply_changes"):
        with dlt.pipeline("orphan", str(tmp_path / "s2")):
            dlt.create_target_table("never_fed")

    with pytest.raises(dlt.DltContextError, match="no active pipeline"):
        dlt.create_streaming_table("x")
    with pytest.raises(dlt.DltContextError, match="only available"):
        dlt.spark.range(1)


def test_expectations_and_append_flows_through_facade(spark, tmp_path):
    """Module-level expectation decorators and @dlt.append_flow register
    against the active pipeline; two flows append into one streaming
    table."""
    a_dir = str(tmp_path / "a")
    b_dir = str(tmp_path / "b")
    os.makedirs(a_dir)
    os.makedirs(b_dir)
    for d, rows in ((a_dir, [1, 2]), (b_dir, [3, 4])):
        with open(os.path.join(d, "f.json"), "w") as f:
            for k in rows:
                f.write(json.dumps({"k": k}) + "\n")

    with dlt.pipeline("flows", str(tmp_path / "storage")) as pipe:
        dlt.create_streaming_table("merged")

        @dlt.append_flow(target="merged")
        def from_a():
            return dlt.spark.readStream.schema("k INT").json(a_dir)

        @dlt.append_flow(target="merged")
        def from_b():
            return dlt.spark.readStream.schema("k INT").json(b_dir)

        @dlt.table
        @dlt.expect_or_drop("small", "k <= 3")
        def filtered():
            return dlt.read("merged")

    PipelineRunner(pipe).run_once(spark)
    assert sorted(
        r["k"] for r in pipe.read(spark, "merged").collect()
    ) == [1, 2, 3, 4]
    assert sorted(
        r["k"] for r in pipe.read(spark, "filtered").collect()
    ) == [1, 2, 3]
