"""salted_join equivalence with a plain join (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.operators.skew import salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # key 0 owns ~60% of the left side; right side has multiple rows per key
    left = spark.range(0, 3000).select(
        F.when(F.col("id") < 1800, 0).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("lv"),
    )
    right = spark.range(0, 100).select(
        (F.col("id") % 50).alias("k"), F.col("id").alias("rv")
    )
    return left, right


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_inner_matches_plain_join(spark, skewed):
    left, right = skewed
    got = _rows(salted_join(left, right, ["k"], salt=8))
    want = _rows(left.join(right, ["k"]))
    assert got == want and len(got) > 0


def test_left_outer_keeps_unmatched(spark, skewed):
    left, right = skewed
    right_holes = right.filter(F.col("k") % 2 == 0)  # odd keys unmatched
    got = _rows(salted_join(left, right_holes, ["k"], salt=8, how="left"))
    want = _rows(left.join(right_holes, ["k"], "left"))
    assert got == want
    assert any(r[-1] is None for r in got)  # unmatched left rows survived


def test_rejects_right_join(spark, skewed):
    left, right = skewed
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="right")
