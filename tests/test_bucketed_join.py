"""Bucketed managed tables: co-located joins and aggregations must plan
without an Exchange (storage.write_bucketed_table)."""

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.storage import write_bucketed_table


@pytest.fixture(scope="module")
def bucketed_pair(spark):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_key"), (F.col("id") % 7).alias("o_val")
    )
    items = spark.range(0, 5000).select(
        (F.col("id") % 1000).alias("i_key"), (F.col("id") % 13).alias("i_val")
    )
    write_bucketed_table(orders, spark, "b_orders", ["o_key"], n_buckets=4)
    write_bucketed_table(items, spark, "b_items", ["i_key"], n_buckets=4)
    yield "b_orders", "b_items"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-join path: at test row counts Spark prefers a
    broadcast join (which sidesteps bucketing entirely); real fact-to-fact
    joins are above the broadcast threshold, which is the case bucketing
    exists for."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_cololocated_join_has_no_exchange(spark, bucketed_pair, no_broadcast):
    a = spark.table("b_orders")
    b = spark.table("b_items")
    joined = a.join(b, a.o_key == b.i_key)
    plan = _plan(joined)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan
    assert joined.count() == 5000


def test_bucketed_aggregation_has_no_exchange(spark, bucketed_pair):
    agg = spark.table("b_items").groupBy("i_key").agg(F.sum("i_val").alias("s"))
    plan = _plan(agg)
    assert "Exchange" not in plan, plan
    assert agg.count() == 1000


def test_join_result_correct(spark, bucketed_pair):
    a = spark.table("b_orders")
    b = spark.table("b_items")
    got = (
        a.join(b, a.o_key == b.i_key)
        .agg(F.sum(F.col("o_val") * F.col("i_val")).alias("x"))
        .collect()[0]["x"]
    )
    want = sum((k % 7) * ((i) % 13) for i in range(5000) for k in [i % 1000])
    assert got == want
