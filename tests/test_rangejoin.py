"""Unit tests for the bucketized interval join (operators/rangejoin.py):
boundary inclusion/exclusion, bucket-straddling matches, key isolation,
and the equi-join (not nested-loop) plan shape."""

from datetime import datetime

from pyspark.sql import functions as F

from pos_dlt_spark.operators.rangejoin import interval_join_bucketed


def _ts(s):
    return datetime.fromisoformat(s)


def _run(spark, lefts, rights, window="1 hour"):
    l = spark.createDataFrame(lefts, ["k", "lt", "lid"])
    r = spark.createDataFrame(rights, ["k", "rt", "rid"])
    out = interval_join_bucketed(l, r, on=["k"], left_time="lt", right_time="rt", window=window)
    return {(row.lid, row.rid) for row in out.collect()}


def test_boundaries_inclusive_both_ends(spark):
    lefts = [(1, _ts("2024-01-01 12:00:00"), 10)]
    rights = [
        (1, _ts("2024-01-01 11:00:00"), 20),  # exactly lt - window: in
        (1, _ts("2024-01-01 12:00:00"), 21),  # exactly lt: in
        (1, _ts("2024-01-01 10:59:59"), 22),  # just before window: out
        (1, _ts("2024-01-01 12:00:01"), 23),  # after left: out
    ]
    assert _run(spark, lefts, rights) == {(10, 20), (10, 21)}


def test_match_straddles_bucket_boundary(spark):
    # left at 12:10, right at 11:50 — different hour buckets, must match
    # via the right side's +1 replica.
    lefts = [(1, _ts("2024-01-01 12:10:00"), 10)]
    rights = [(1, _ts("2024-01-01 11:50:00"), 20)]
    assert _run(spark, lefts, rights) == {(10, 20)}


def test_same_bucket_far_apart_no_match(spark):
    # both in the same hour bucket but farther apart than the window
    lefts = [(1, _ts("2024-01-01 12:59:00"), 10)]
    rights = [(1, _ts("2024-01-01 12:00:00"), 20)]
    assert _run(spark, lefts, rights, window="30 minutes") == set()


def test_keys_isolate(spark):
    lefts = [(1, _ts("2024-01-01 12:00:00"), 10)]
    rights = [(2, _ts("2024-01-01 11:30:00"), 20)]
    assert _run(spark, lefts, rights) == set()


def test_multiple_matches_per_left(spark):
    lefts = [(1, _ts("2024-01-01 12:00:00"), 10)]
    rights = [(1, _ts("2024-01-01 11:15:00"), 20), (1, _ts("2024-01-01 11:45:00"), 21)]
    assert _run(spark, lefts, rights) == {(10, 20), (10, 21)}


def test_plans_as_equi_join_not_nested_loop(spark):
    l = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"), 10)], ["k", "lt", "lid"])
    r = spark.createDataFrame([(1, _ts("2024-01-01 11:30:00"), 20)], ["k", "rt", "rid"])
    plan = interval_join_bucketed(
        l, r, on=["k"], left_time="lt", right_time="rt", window="1 hour"
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "__rj_bucket" in plan  # join keys carry the bucket


def test_results_independent_of_session_timezone(spark):
    """Bucket width must come from a timezone-anchored epoch: on a UTC-N
    session a bare epoch literal would shrink the width (or go negative and
    drop all matches). Matches are absolute instants — same under any TZ."""
    lefts = [(1, _ts("2024-01-01 12:10:00"), 10)]
    rights = [(1, _ts("2024-01-01 11:50:00"), 20), (1, _ts("2024-01-01 10:00:00"), 21)]
    before = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("America/New_York", "Asia/Tokyo"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            assert _run(spark, lefts, rights) == {(10, 20)}, tz
    finally:
        spark.conf.set("spark.sql.session.timeZone", before)


def test_negative_window_rejected(spark):
    l = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"), 10)], ["k", "lt", "lid"])
    r = spark.createDataFrame([(1, _ts("2024-01-01 11:30:00"), 20)], ["k", "rt", "rid"])
    try:
        interval_join_bucketed(
            l, r, on=["k"], left_time="lt", right_time="rt", window="-1 hour"
        )
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_column_collision_rejected(spark):
    l = spark.createDataFrame([(1, _ts("2024-01-01 12:00:00"), "x")], ["k", "lt", "rid"])
    r = spark.createDataFrame([(1, _ts("2024-01-01 11:30:00"), "y")], ["k", "rt", "rid"])
    try:
        interval_join_bucketed(l, r, on=["k"], left_time="lt", right_time="rt", window="1 hour")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
