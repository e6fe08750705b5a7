"""Query registry — the engine's public query surface.

Every entry pairs an idiomatic-PySpark implementation with an ANSI-SQL
oracle string (runnable by DuckDB over the same parquet tables) so the
driver's correctness gate can hash-compare results (see ``__spark_entry__``).

Determinism rules applied throughout (so Spark and the oracle hash-match):
- money/doubles are aggregated as DECIMAL (exact) and cast to DOUBLE at the
  end; averages are computed as exact-sum / count in double;
- integer-valued doubles (l_quantity) are cast to integer types before SUM;
- every FIRST()-style pick is replaced by MIN/MAX or a row_number() window
  with a total tiebreak order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_dlt_spark.operators.cdc import latest_per_key
from pos_dlt_spark.operators.gold import current_inventory
from pos_dlt_spark.tables import load_table


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = Query(name, fn, oracle)
        return fn

    return deco


# ---------------------------------------------------------------------------
# POS-parity queries (reference semantics mapped onto the TESTDATA star
# schema: l_suppkey -> store_id, l_partkey -> item_id, l_shipdate ->
# date_time, supplier/part -> the store/inventory_change_type dims).
# ---------------------------------------------------------------------------

_SNAP_SQL = """
    SELECT store_id, item_id, quantity, date_time FROM (
        SELECT l_suppkey AS store_id, l_partkey AS item_id,
               CAST(l_quantity AS INTEGER) AS quantity,
               l_shipdate AS date_time,
               row_number() OVER (
                   PARTITION BY l_suppkey, l_partkey
                   ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC
               ) AS rn
        FROM lineitem) t
    WHERE rn = 1
"""

_CHG_SQL = """
    SELECT x.l_suppkey AS store_id, x.l_partkey AS item_id,
           CAST(x.l_quantity AS BIGINT)
             * (CASE WHEN x.l_returnflag = 'R' THEN -1 ELSE 1 END) AS quantity,
           x.l_shipdate AS date_time
    FROM lineitem x
    INNER JOIN supplier y ON x.l_suppkey = y.s_suppkey
    INNER JOIN part z ON x.l_partkey = z.p_partkey
    WHERE NOT (y.s_acctbal < 0 AND z.p_size < 10)
"""


def pos_snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """latest_inventory_snapshot stand-in: latest lineitem row per
    (suppkey, partkey) — the batch form of the reference's CDC target
    (`03_Bronze-to-Silver ETL.py:379-384`)."""
    li = load_table(spark, sf_dir, "lineitem")
    snap = li.select(
        F.col("l_suppkey").alias("store_id"),
        F.col("l_partkey").alias("item_id"),
        F.col("l_quantity").cast("int").alias("quantity"),
        F.col("l_shipdate").alias("date_time"),
        "l_orderkey",
        "l_linenumber",
    )
    return latest_per_key(
        snap, ["store_id", "item_id"], "date_time", tiebreakers=["l_orderkey", "l_linenumber"]
    ).drop("l_orderkey", "l_linenumber")


def pos_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inventory_change stand-in: fact joined to both dims with the gold
    query's NOT(dim-attr AND dim-attr) exclusion (reference `04:84-94`).
    Dims are broadcast — they are tiny relative to the fact at every SF."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")
    x = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey, "inner")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .filter(~((F.col("s_acctbal") < 0) & (F.col("p_size") < 10)))
    )
    signed = F.col("l_quantity").cast("bigint") * F.when(
        F.col("l_returnflag") == "R", F.lit(-1)
    ).otherwise(F.lit(1))
    return x.select(
        F.col("l_suppkey").alias("store_id"),
        F.col("l_partkey").alias("item_id"),
        signed.alias("quantity"),
        F.col("l_shipdate").alias("date_time"),
    )


@query(
    "pos_gold_inventory_current",
    oracle=f"""
    WITH snap AS ({_SNAP_SQL}), chg AS ({_CHG_SQL})
    SELECT a.store_id, a.item_id,
           MAX(a.quantity) AS snapshot_quantity,
           CAST(COALESCE(SUM(b.quantity), 0) AS BIGINT) AS change_quantity,
           CAST(MAX(a.quantity) + COALESCE(SUM(b.quantity), 0) AS BIGINT) AS current_inventory,
           GREATEST(MAX(a.date_time),
                    COALESCE(MAX(b.date_time), MAX(a.date_time))) AS date_time
    FROM snap a
    LEFT OUTER JOIN chg b
      ON a.store_id = b.store_id AND a.item_id = b.item_id
         AND a.date_time <= b.date_time
    GROUP BY a.store_id, a.item_id
    """,
)
def pos_gold_inventory_current(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship: reference gold query `04_Silver-to-Gold ETL.sql:76-103`
    over the TESTDATA mapping."""
    return current_inventory(pos_snapshots(spark, sf_dir), pos_changes(spark, sf_dir))


@query("pos_cdc_latest_snapshot", oracle=_SNAP_SQL)
def pos_cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch oracle of DLT apply_changes (W3): one row per key, max
    sequence wins, total tiebreak."""
    return pos_snapshots(spark, sf_dir)


# ---------------------------------------------------------------------------
# TPC-H-style operator coverage
# ---------------------------------------------------------------------------


@query(
    "tpch_q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
                    * (CAST(1 AS DECIMAL(18,2)) + CAST(l_tax AS DECIMAL(18,2)))) AS DOUBLE)
               AS sum_charge,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-filter-groupBy-multi-agg. All money math in
    DECIMAL so partial-aggregation order cannot perturb the result."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,2)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    qty = F.col("l_quantity").cast("bigint")
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / n).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )
