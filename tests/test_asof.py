"""Unit tests for the as-of join operator (operators/asof.py):
exact-match vs strict semantics, no-prior-quote nulls, row-level
occlusion by null-valued quotes, tiebreakers, multi-key grouping."""

from datetime import datetime

from pyspark.sql import functions as F

from pos_dlt_spark.operators.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def _run(spark, probes, quotes, **kw):
    p = spark.createDataFrame(probes, ["k", "pt", "pid"])
    q = spark.createDataFrame(quotes, ["k", "qt", "qv"])
    out = asof_join(p, q, on=["k"], left_time="pt", right_time="qt", **kw)
    return {r.pid: r.qv for r in out.collect()}


def test_basic_backward_pick(spark):
    probes = [(1, _ts("2024-01-05"), 100), (1, _ts("2024-01-02"), 101)]
    quotes = [
        (1, _ts("2024-01-01"), "a"),
        (1, _ts("2024-01-03"), "b"),
        (1, _ts("2024-01-04"), "c"),
    ]
    assert _run(spark, probes, quotes) == {100: "c", 101: "a"}


def test_no_prior_quote_yields_null_and_probe_survives(spark):
    probes = [(1, _ts("2024-01-01"), 100), (2, _ts("2024-01-05"), 200)]
    quotes = [(1, _ts("2024-01-02"), "late")]
    assert _run(spark, probes, quotes) == {100: None, 200: None}


def test_exact_time_match_semantics(spark):
    probes = [(1, _ts("2024-01-03"), 100)]
    quotes = [(1, _ts("2024-01-01"), "a"), (1, _ts("2024-01-03"), "b")]
    assert _run(spark, probes, quotes, allow_exact=True) == {100: "b"}
    assert _run(spark, probes, quotes, allow_exact=False) == {100: "a"}


def test_null_valued_quote_occludes_older(spark):
    # The latest quote row wins even when its value is NULL — row-level
    # fill (pandas/DuckDB semantics), not column-level last-non-null.
    probes = [(1, _ts("2024-01-05"), 100)]
    quotes = [(1, _ts("2024-01-01"), "old"), (1, _ts("2024-01-04"), None)]
    assert _run(spark, probes, quotes) == {100: None}


def test_keys_partition_matches(spark):
    probes = [(1, _ts("2024-01-05"), 100), (2, _ts("2024-01-05"), 200)]
    quotes = [(1, _ts("2024-01-02"), "k1"), (2, _ts("2024-01-03"), "k2")]
    assert _run(spark, probes, quotes) == {100: "k1", 200: "k2"}


def test_tiebreaker_on_equal_quote_times(spark):
    p = spark.createDataFrame([(1, _ts("2024-01-05"), 100)], ["k", "pt", "pid"])
    q = spark.createDataFrame(
        [(1, _ts("2024-01-02"), "lo", 1), (1, _ts("2024-01-02"), "hi", 2)],
        ["k", "qt", "qv", "seq"],
    )
    out = asof_join(
        p, q, on=["k"], left_time="pt", right_time="qt",
        right_values=["qv"], right_tiebreakers=["seq"],
    )
    assert [r.qv for r in out.collect()] == ["hi"]  # greatest seq wins


def test_right_values_collision_rejected(spark):
    p = spark.createDataFrame([(1, _ts("2024-01-05"), "x")], ["k", "pt", "qv"])
    q = spark.createDataFrame([(1, _ts("2024-01-02"), "y")], ["k", "qt", "qv"])
    try:
        asof_join(p, q, on=["k"], left_time="pt", right_time="qt", right_values=["qv"])
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_single_shuffle_plan(spark):
    """The plan must contain exactly one exchange (the window's hash
    partitioning on the key) — no join node, no second shuffle."""
    p = spark.createDataFrame([(1, _ts("2024-01-05"), 100)], ["k", "pt", "pid"])
    q = spark.createDataFrame([(1, _ts("2024-01-02"), "a")], ["k", "qt", "qv"])
    plan = asof_join(
        p, q, on=["k"], left_time="pt", right_time="qt"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
