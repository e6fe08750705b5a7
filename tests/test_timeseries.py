"""resample_ffill semantics: grid bounds, LOCF, interpolation, last-obs-
per-slot tiebreaks."""

import datetime as dt

from pyspark.sql import functions as F

from pos_dlt_spark.operators.timeseries import resample_ffill

HOUR = 3_600_000_000


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_grid_ffill_and_interp(spark):
    rows = [
        ("a", _ts(0), 10.0, 1),
        ("a", _ts(4), 30.0, 2),  # 3-slot interior gap: 1,2,3 interpolate
        ("b", _ts(1), 5.0, 3),  # single-observation key: one grid row
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid int")
    out = resample_ffill(df, ["k"], "ts", "v", HOUR, tiebreakers=["eid"])
    got = {(r["k"], r["slot"] % 24): r for r in out.collect()}

    a = [got[("a", s)] for s in range(5)]
    assert [r["value"] for r in a] == [10.0, None, None, None, 30.0]
    assert [r["value_ffill"] for r in a] == [10.0, 10.0, 10.0, 10.0, 30.0]
    assert [r["value_interp"] for r in a] == [10.0, 15.0, 20.0, 25.0, 30.0]
    # grid spans exactly first..last observation per key
    assert sum(1 for k, _ in got if k == "b") == 1
    assert got[("b", 1)]["value_interp"] == 5.0


def test_last_observation_per_slot_wins(spark):
    rows = [
        ("a", _ts(0, 10), 1.0, 1),
        ("a", _ts(0, 50), 2.0, 2),  # later ts in same slot wins
        ("a", _ts(1, 0), 9.0, 3),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double, eid int")
    out = resample_ffill(df, ["k"], "ts", "v", HOUR)
    vals = {r["slot"] % 24: r["value"] for r in out.collect()}
    assert vals == {0: 2.0, 1: 9.0}


def test_slot_start_is_grid_aligned(spark):
    df = spark.createDataFrame(
        [("a", _ts(3, 17), 1.0, 1)], "k string, ts timestamp, v double, eid int"
    )
    out = resample_ffill(df, ["k"], "ts", "v", HOUR).collect()
    assert out[0]["slot_start"] == _ts(3, 0)
