"""Bloom-prefilter join (operators/bloomjoin.py): exactness (result equals
the plain join), no false negatives by construction, real row reduction on
the fact side, and a plan pin that the membership probe sits in the fact
scan stage below the join."""

import pytest

from pyspark.sql import functions as F

from pos_dlt_spark.operators import bloomjoin as B
from pos_dlt_spark.plans import assert_in_plan, physical_plan
from pos_dlt_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    return (
        load_table(spark, SF, "lineitem"),
        load_table(spark, SF, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        ),
    )


def test_equals_plain_join(spark, tables):
    fact, dim = tables
    dim = dim.select("o_orderkey", "o_orderdate")
    got = (
        B.bloom_prefilter_join(fact, dim, "l_orderkey", "o_orderkey")
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = (
        fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"])
        .groupBy("o_orderkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_no_false_negatives_and_reduction(spark, tables):
    fact, dim = tables
    words = B.bloom_build(dim, "o_orderkey", m_bits=1 << 14, k=5)
    kept = fact.filter(B.bloom_filter_expr("l_orderkey", words, 1 << 14, 5))
    # every genuinely joining row must survive the filter…
    joining = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"], "left_semi")
    assert kept.count() >= joining.count()
    assert (
        joining.join(kept.select("l_orderkey", "l_linenumber"),
                     ["l_orderkey", "l_linenumber"], "left_anti").count() == 0
    )
    # …and the filter must actually thin the non-joining majority
    assert kept.count() < fact.count()


def test_probe_runs_below_the_join(spark, tables):
    fact, dim = tables
    df = B.bloom_prefilter_join(
        fact, dim.select("o_orderkey", "o_orderdate"), "l_orderkey", "o_orderkey"
    )
    plan = physical_plan(df)
    join_at = min(plan.find("SortMergeJoin") % 10**9, plan.find("BroadcastHashJoin") % 10**9)
    probe_at = plan.find("xxhash64")
    assert probe_at > join_at > -1, plan  # deeper in the tree = printed later
    assert_in_plan(df, "xxhash64")


def test_bitmap_word_bounds(spark, tables):
    _, dim = tables
    m = 1 << 12
    words = B.bloom_build(dim, "o_orderkey", m_bits=m, k=3)
    assert len(words) == m // 64
    assert any(w != 0 for w in words)


def test_mixed_integral_key_widths_no_false_negatives(spark, tables):
    """xxhash64 hashes INT and BIGINT differently; the join must widen
    both sides to BIGINT so an int fact key still probes the positions a
    bigint dim key set (silent false negatives otherwise)."""
    fact, dim = tables
    dim = dim.select(F.col("o_orderkey").cast("bigint").alias("o_orderkey"))
    fact = fact.select(F.col("l_orderkey").cast("int").alias("l_orderkey"))
    got = B.bloom_prefilter_join(fact, dim, "l_orderkey", "o_orderkey").count()
    want = fact.join(dim, fact["l_orderkey"] == dim["o_orderkey"]).count()
    assert got == want and want > 0


def test_incompatible_key_types_fail_fast(spark, tables):
    fact, dim = tables
    dim = dim.select(F.col("o_orderkey").cast("string").alias("o_orderkey"))
    with pytest.raises(TypeError, match="hash identically"):
        B.bloom_prefilter_join(fact, dim, "l_orderkey", "o_orderkey")
