"""Storage-layout tests: the 100 TB concerns SURVEY §4 calls out —
partitioned silver tables must PRUNE on read (a 5-minute gold recompute
cannot rescan history), and co-located (bucketed) joins must not shuffle
either fact side."""

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.pipeline import Pipeline, PipelineRunner
from pos_dlt_spark.plans import count_op, formatted_plan


def test_pipeline_partitioned_table_prunes_on_read(spark, tmp_path):
    pipe = Pipeline("layout", storage=str(tmp_path / "storage"))

    @pipe.table(kind="live", partition_by=["event_type"])
    def typed_events(spark):
        return spark.createDataFrame(
            [(i, "click" if i % 2 else "view", float(i)) for i in range(100)],
            "event_id long, event_type string, value double",
        )

    PipelineRunner(pipe).run_once(spark)

    df = pipe.read(spark, "typed_events").filter(F.col("event_type") == "click")
    plan = formatted_plan(df)
    # the filter must land in PartitionFilters (directory pruning), NOT in
    # PushedFilters/post-scan Filter — and the partition column must not be
    # read from data files at all
    assert "PartitionFilters" in plan
    import re

    pf = plan.split("PartitionFilters")[1].split("]")[0]
    assert re.search(r"\(event_type#\d+ = click\)", pf), pf
    assert df.count() == 50


def test_bucketed_join_needs_no_exchange(spark, tmp_path):
    """Two tables bucketed+sorted on the join key: the sort-merge join
    reads co-located buckets directly — zero Exchange in the plan. This is
    the layout the silver tables use at 100 TB so the gold join never
    reshuffles the fact table."""
    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("va")
    )
    b = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    )
    import shutil

    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for name, df in [("bkt_a", a), ("bkt_b", b)]:
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        # a previous JVM's metastore is gone but its directory survives
        shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)
        (
            df.write.bucketBy(8, "k").sortBy("k").format("parquet")
            .mode("overwrite").saveAsTable(name)
        )
    joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    assert count_op(joined, "Exchange") == 0
    assert joined.count() == 1000


def test_unbucketed_join_does_exchange(spark):
    """Control: the same join without bucketing shuffles both sides (with
    broadcast disabled) — proving the bucketed plan above is the layout's
    doing, not an optimizer accident."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(0, 1000).select(F.col("id").alias("k"))
        b = spark.range(0, 1000).select(F.col("id").alias("k"))
        assert count_op(a.join(b, "k"), "Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
