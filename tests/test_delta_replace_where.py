"""replaceWhere — predicate-scoped atomic overwrite on write_delta.

The scale-correct rendering of the reference's periodic gold recompute
(`04_Silver-to-Gold ETL.sql:68`): at 100 TB you atomically replace a
date-slice, never the table. Three physical paths, all one commit:
partition-decidable predicates remove whole files with NO scan;
stats-covered files remove whole via footer numRecords; straddling
files keep their non-matching rows behind a deletion vector."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
)
from pos_dlt_spark.sources.delta_writer import (
    DeltaConstraintViolation,
    write_delta,
)

pytestmark = pytest.mark.usefixtures("spark")


def _pdf(spark, rows):
    import pandas as pd

    return spark.createDataFrame(pd.DataFrame(rows))


def test_partition_slice_reload_no_scan_untouched_files_survive(spark, tmp_path):
    """The canonical use: reload one date partition. The predicate is
    decided from partition values alone — matching files removed whole,
    every other partition's file entries survive BYTE-IDENTICAL."""
    t = str(tmp_path / "rw_part")
    write_delta(
        _pdf(
            spark,
            {
                "ds": ["2020-01-01"] * 3 + ["2020-01-02"] * 3,
                "v": [1, 2, 3, 4, 5, 6],
            },
        ),
        t,
        partition_by=["ds"],
    )
    snap0 = delta_snapshot(spark, t)
    untouched0 = {
        rel: snap0.adds[rel]
        for rel, _ in snap0.files
        if rel.startswith("ds=2020-01-01")
    }
    assert untouched0
    write_delta(
        _pdf(spark, {"ds": ["2020-01-02"] * 2, "v": [40, 50]}),
        t,
        mode="overwrite",
        partition_by=["ds"],
        replace_where="ds = '2020-01-02'",
    )
    got = sorted((r.ds, r.v) for r in read_delta(spark, t).collect())
    assert got == [
        ("2020-01-01", 1),
        ("2020-01-01", 2),
        ("2020-01-01", 3),
        ("2020-01-02", 40),
        ("2020-01-02", 50),
    ]
    snap1 = delta_snapshot(spark, t)
    for rel, add in untouched0.items():
        assert snap1.adds.get(rel) == add, f"untouched file {rel} was disturbed"
    # no DVs minted on the partition path, and the old slice's files are gone
    assert not any(a.get("deletionVector") for a in snap1.adds.values())
    assert not any(
        rel.startswith("ds=2020-01-02") and rel in snap1.adds for rel, _ in snap0.files
    )


def test_straddling_file_gets_deletion_vector_not_rewrite(spark, tmp_path):
    """A file holding both matching and non-matching rows keeps its
    non-matching rows behind a DV — merge-on-read, kilobytes of bitmap
    instead of rewriting the file at 100 TB."""
    t = str(tmp_path / "rw_dv")
    write_delta(
        spark.range(0, 100).withColumn("v", F.col("id") * 2).coalesce(2), t
    )
    snap0 = delta_snapshot(spark, t)
    orig_rels = {rel for rel, _ in snap0.files}
    write_delta(
        spark.range(10, 20).withColumn("v", F.lit(-1).cast("bigint")),
        t,
        mode="overwrite",
        replace_where="id >= 10 AND id < 20",
    )
    out = read_delta(spark, t)
    assert out.count() == 100
    assert out.filter("id >= 10 AND id < 20").select(
        F.min("v"), F.max("v")
    ).collect()[0][:] == (-1, -1)
    assert out.filter("id = 50").collect()[0].v == 100
    snap1 = delta_snapshot(spark, t)
    dv_rels = {
        rel for rel, a in snap1.adds.items() if a.get("deletionVector")
    }
    assert dv_rels and dv_rels <= orig_rels, "straddler must be DV'd in place"
    # the straddling original file was NOT rewritten: same path survives
    assert all(
        snap1.adds[rel]["path"] == rel and snap1.adds[rel].get("dataChange") is True
        for rel in dv_rels
    )


def test_stats_covered_file_removed_whole_disjoint_file_never_touched(
    spark, tmp_path
):
    """One file entirely inside the predicate (footer numRecords ==
    matched cardinality) is removed whole — no DV, no rewrite; a file
    provably disjoint by min/max stats survives byte-identical."""
    t = str(tmp_path / "rw_stats")
    write_delta(spark.range(0, 50).withColumn("v", F.col("id")).coalesce(1), t)
    write_delta(spark.range(50, 100).withColumn("v", F.col("id")).coalesce(1), t)
    snap0 = delta_snapshot(spark, t)
    import json as _json

    low = [
        rel
        for rel, a in snap0.adds.items()
        if _json.loads(a.get("stats") or "{}").get("minValues", {}).get("id") == 0
    ]
    assert len(low) == 1
    write_delta(
        spark.range(50, 60).withColumn("v", F.lit(0).cast("bigint")).coalesce(1),
        t,
        mode="overwrite",
        replace_where="id >= 50",
    )
    snap1 = delta_snapshot(spark, t)
    assert read_delta(spark, t).count() == 60
    assert not any(a.get("deletionVector") for a in snap1.adds.values())
    assert snap1.adds.get(low[0]) == snap0.adds[low[0]]  # disjoint survivor


def test_incoming_rows_must_satisfy_predicate(spark, tmp_path):
    t = str(tmp_path / "rw_guard")
    write_delta(spark.range(0, 100).withColumn("v", F.col("id")), t)
    with pytest.raises(DeltaConstraintViolation, match="replaceWhere"):
        write_delta(
            spark.range(200, 210).withColumn("v", F.lit(0).cast("bigint")),
            t,
            mode="overwrite",
            replace_where="id < 20",
        )
    # atomic abort: nothing replaced, no stray staged files referenced
    assert read_delta(spark, t).count() == 100
    assert delta_snapshot(spark, t).version == 0


def test_replace_where_requires_overwrite_and_respects_append_only(
    spark, tmp_path
):
    t = str(tmp_path / "rw_modes")
    write_delta(spark.range(0, 10).withColumn("v", F.col("id")), t)
    with pytest.raises(ValueError, match="replace_where requires"):
        write_delta(
            spark.range(0, 5).withColumn("v", F.col("id")),
            t,
            replace_where="id < 5",
        )
    t2 = str(tmp_path / "rw_ao")
    write_delta(
        spark.range(0, 10).withColumn("v", F.col("id")),
        t2,
        configuration={"delta.appendOnly": "true"},
    )
    with pytest.raises(DeltaProtocolError, match="appendOnly"):
        write_delta(
            spark.range(0, 5).withColumn("v", F.col("id")),
            t2,
            mode="overwrite",
            replace_where="id < 5",
        )


def test_replace_where_change_feed_carries_both_halves(spark, tmp_path):
    """With CDF on, the replaceWhere commit's change files hold the
    replaced live rows as deletes AND the incoming rows as inserts —
    the protocol's cdc-actions-are-the-change-set rule."""
    from pos_dlt_spark.sources.delta_cdf import read_change_feed

    t = str(tmp_path / "rw_cdf")
    write_delta(
        _pdf(spark, {"ds": ["a"] * 2 + ["b"] * 2, "v": [1, 2, 3, 4]}),
        t,
        partition_by=["ds"],
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    write_delta(
        _pdf(spark, {"ds": ["b"], "v": [30]}),
        t,
        mode="overwrite",
        partition_by=["ds"],
        replace_where="ds = 'b'",
    )
    ch = read_change_feed(spark, t, start_version=1, end_version=1)
    rows = sorted((r["_change_type"], r.ds, r.v) for r in ch.collect())
    assert rows == [("delete", "b", 3), ("delete", "b", 4), ("insert", "b", 30)]
    got = sorted((r.ds, r.v) for r in read_delta(spark, t).collect())
    assert got == [("a", 1), ("a", 2), ("b", 30)]


def test_replace_where_dv_slice_change_feed(spark, tmp_path):
    """CDF + a straddling-file replace: deletes are exactly the matched
    LIVE rows (prior DV-dead rows are not re-deleted)."""
    from pos_dlt_spark.sources.delta_cdf import read_change_feed
    from pos_dlt_spark.sources.delta_writer import delta_delete

    t = str(tmp_path / "rw_cdf_dv")
    write_delta(
        spark.range(0, 20).withColumn("v", F.col("id")).coalesce(1),
        t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_delete(spark, t, "id = 5")  # v1: DV-kill id=5
    write_delta(
        _pdf(spark, {"id": [4], "v": [400]}),
        t,
        mode="overwrite",
        replace_where="id >= 4 AND id < 8",
    )
    ch = read_change_feed(spark, t, start_version=2, end_version=2)
    rows = sorted((r["_change_type"], r.id, r.v) for r in ch.collect())
    # 5 is already dead: only 4, 6, 7 are deleted by the replace
    assert rows == [
        ("delete", 4, 4),
        ("delete", 6, 6),
        ("delete", 7, 7),
        ("insert", 4, 400),
    ]
    assert sorted(r.id for r in read_delta(spark, t).collect()) == [
        i for i in range(20) if i not in (5, 6, 7)
    ]


def test_replace_where_empty_match_and_nonexistent_table(spark, tmp_path):
    """No live rows match: the commit is pure inserts (still one atomic
    version). On a fresh path the table is simply created."""
    t = str(tmp_path / "rw_empty")
    write_delta(
        spark.range(100, 110).withColumn("v", F.col("id")),
        t,
        mode="overwrite",
        replace_where="id >= 100",
    )
    assert read_delta(spark, t).count() == 10
    write_delta(
        spark.range(200, 205).withColumn("v", F.col("id")),
        t,
        mode="overwrite",
        replace_where="id >= 200",
    )
    assert read_delta(spark, t).count() == 15
    assert not any(
        a.get("deletionVector")
        for a in delta_snapshot(spark, t).adds.values()
    )


def test_replace_where_lost_race_rederives_fresh_snapshot(spark, tmp_path, monkeypatch):
    """A commit race is ABSORBED: the replace re-derives the slice
    against the fresh snapshot — including rows a concurrent append
    landed inside the predicate while we were staging."""
    from pos_dlt_spark.sources import delta_writer as W

    t = str(tmp_path / "rw_race")
    write_delta(spark.range(0, 50).withColumn("v", F.col("id")).coalesce(1), t)
    real_try = W._try_commit
    state = {"raced": False}

    def racing_try(log_dir, version, actions, conf=None):
        if not state["raced"]:
            state["raced"] = True
            # a competitor lands an append INSIDE the slice first
            write_delta(
                _pdf(spark, {"id": [45], "v": [4500]}), t
            )
            return real_try(log_dir, version, actions, conf=conf)
        return real_try(log_dir, version, actions, conf=conf)

    monkeypatch.setattr(W, "_try_commit", racing_try)
    write_delta(
        _pdf(spark, {"id": [40], "v": [-1]}),
        t,
        mode="overwrite",
        replace_where="id >= 40",
    )
    monkeypatch.setattr(W, "_try_commit", real_try)
    out = {r.id: r.v for r in read_delta(spark, t).collect()}
    # 40-49 and the raced-in 45 all replaced by the single incoming row
    assert sorted(out) == list(range(40)) + [40]
    assert out[40] == -1
    # no orphaned sidecars/change files from the lost attempt
    stray = [
        n
        for root, _, files in os.walk(t)
        for n in files
        if n.startswith("deletion_vector_") and n.endswith(".bin")
    ]
    snap = delta_snapshot(spark, t)
    live_dvs = sum(1 for a in snap.adds.values() if a.get("deletionVector"))
    assert len(stray) <= live_dvs + 1  # lost-attempt sidecars cleaned


def test_replace_where_on_column_mapped_table(spark, tmp_path):
    """Predicates speak LOGICAL names; cm tables stage physical files
    and DV straddlers exactly like plain ones."""
    t = str(tmp_path / "rw_cm")
    write_delta(
        spark.range(0, 100).withColumn("v", F.col("id") * 2).coalesce(2),
        t,
        configuration={"delta.columnMapping.mode": "name"},
    )
    write_delta(
        spark.range(10, 20).withColumn("v", F.lit(-1).cast("bigint")),
        t,
        mode="overwrite",
        replace_where="id >= 10 AND id < 20",
    )
    out = read_delta(spark, t)
    assert out.count() == 100
    assert out.filter("id = 15").collect()[0].v == -1
    assert out.filter("id = 50").collect()[0].v == 100
