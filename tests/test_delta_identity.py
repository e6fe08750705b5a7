"""IDENTITY columns (delta.identity.* field metadata): data-less CREATE
TABLE, writer-assigned values on append (distributed prefix-offset
assignment, high watermark advanced in the same commit), GENERATED
ALWAYS vs BY DEFAULT, stale-watermark race abort, merge/update
interplay."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
)
from pos_dlt_spark.sources.delta_writer import (
    delta_create_table,
    delta_merge,
    delta_update,
    identity_column_metadata,
    write_delta,
)


def _schema(allow_explicit=False, start=1, step=1):
    return StructType(
        [
            StructField(
                "id", LongType(), True,
                identity_column_metadata(start, step, allow_explicit),
            ),
            StructField("name", StringType(), True),
        ]
    )


def _names(spark, rows):
    return spark.createDataFrame([(n,) for n in rows], "name string")


def test_create_then_appends_assign_contiguous_unique(spark, tmp_path):
    table = str(tmp_path / "id1")
    assert delta_create_table(spark, table, _schema(start=10, step=5)) == 0
    snap = delta_snapshot(spark, table)
    assert int(snap.protocol.get("minWriterVersion")) >= 6
    assert read_delta(spark, table).count() == 0  # data-less table reads
    write_delta(_names(spark, [f"a{i}" for i in range(100)]).repartition(8), table)
    got = read_delta(spark, table).collect()
    ids = sorted(r.id for r in got)
    assert ids == list(range(10, 10 + 5 * 100, 5))  # contiguous per commit
    # the watermark rides the commit: second append continues past it
    write_delta(_names(spark, ["b0", "b1"]), table)
    ids2 = sorted(r.id for r in read_delta(spark, table).collect())
    assert len(ids2) == 102 and len(set(ids2)) == 102
    assert max(ids2) == 10 + 5 * 101


def test_generated_always_refuses_explicit_values(spark, tmp_path):
    table = str(tmp_path / "id2")
    delta_create_table(spark, table, _schema(allow_explicit=False))
    df = spark.createDataFrame([(99, "x")], "id long, name string")
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        write_delta(df, table)
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        delta_merge(spark, table, df, keys=["id"], sequence_by="id")
    write_delta(_names(spark, ["a"]), table)
    with pytest.raises(DeltaProtocolError, match="GENERATED ALWAYS"):
        delta_update(spark, table, "name = 'a'", {"id": "123"})
    # updating OTHER columns is fine; identity values are preserved
    delta_update(spark, table, "name = 'a'", {"name": "'a2'"})
    got = read_delta(spark, table).collect()
    assert [(r.id, r.name) for r in got] == [(1, "a2")]


def test_by_default_accepts_and_bumps_watermark(spark, tmp_path):
    table = str(tmp_path / "id3")
    delta_create_table(spark, table, _schema(allow_explicit=True))
    write_delta(
        spark.createDataFrame([(50, "x"), (7, "y")], "id long, name string"), table
    )
    # assigned values continue past the explicit max, never colliding
    write_delta(_names(spark, ["z0", "z1"]), table)
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [7, 50, 51, 52]
    # merge with explicit ids also advances the watermark
    delta_merge(
        spark, table,
        spark.createDataFrame([(90, "m")], "id long, name string"),
        keys=["id"], sequence_by="id",
    )
    write_delta(_names(spark, ["w"]), table)
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [7, 50, 51, 52, 90, 91]


def test_assigning_append_aborts_on_commit_race(spark, tmp_path):
    """An append that assigned identity values must NOT silently retry a
    lost commit race (its values were allocated against a stale
    watermark) — it aborts and the staged files are cleaned."""
    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources.delta_writer import DeltaCommitConflict
    import pos_dlt_spark.sources.delta_writer as dw

    table = str(tmp_path / "id4")
    delta_create_table(spark, table, _schema())
    write_delta(_names(spark, ["a"]), table)

    orig = dw._try_commit
    calls = {"n": 0}

    def race_once(log_dir, version, actions, **kw):
        if calls["n"] == 0:
            calls["n"] += 1
            # a foreign commit steals our version slot
            fx.write_commit(os.path.dirname(log_dir) or table, version,
                            [fx.commit_info_action("NOOP", {})])
        return orig(log_dir, version, actions)

    dw._try_commit = race_once
    try:
        with pytest.raises(DeltaCommitConflict, match="identity"):
            write_delta(_names(spark, ["b"]), table)
    finally:
        dw._try_commit = orig
    # no orphaned data: the table still reads exactly its committed rows
    assert [r.name for r in read_delta(spark, table).collect()] == ["a"]
    snap = delta_snapshot(spark, table)
    live = {rel for rel, _ in snap.files}
    on_disk = {
        n for n in os.listdir(table)
        if n.endswith(".parquet") and not n.startswith("_")
    }
    assert on_disk == live  # staged twin was removed
    # the re-run assigns fresh values past the watermark
    write_delta(_names(spark, ["b"]), table)
    assert sorted(r.id for r in read_delta(spark, table).collect()) == [1, 2]


def test_identity_with_partitioning_and_empty_batch(spark, tmp_path):
    table = str(tmp_path / "id5")
    schema = StructType(
        [
            StructField("id", LongType(), True, identity_column_metadata()),
            StructField("name", StringType(), True),
            StructField("b", LongType(), True),
        ]
    )
    delta_create_table(spark, table, schema, partition_by=["b"])
    df = spark.createDataFrame(
        [(f"n{i}", i % 3) for i in range(30)], "name string, b long"
    ).repartition(4)
    write_delta(df, table, partition_by=["b"])
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == list(range(1, 31))


def test_creation_with_data_by_default_identity(spark, tmp_path):
    """Creating the table WITH data and a BY DEFAULT identity column:
    provided values are accepted and the creation commit already carries
    the advanced watermark."""
    table = str(tmp_path / "id6")
    df = spark.createDataFrame([(5, "x"), (2, "y")], _schema(allow_explicit=True))
    write_delta(df, table)
    write_delta(_names(spark, ["z"]), table)  # assigns past the watermark
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [2, 5, 6]
    snap = delta_snapshot(spark, table)
    assert int(snap.protocol.get("minWriterVersion")) >= 6


def test_descending_identity_assignment_and_watermark(spark, tmp_path):
    """Negative-step identity: assignment descends; a merge rewriting
    the HIGHEST existing id must not drag the watermark back up (it
    advances on staged MIN moving downward), so later appends never
    collide with live ids."""
    table = str(tmp_path / "idneg")
    schema = StructType(
        [
            StructField(
                "id", LongType(), True, identity_column_metadata(0, -1, True)
            ),
            StructField("name", StringType(), True),
            StructField("seq", LongType(), True),
        ]
    )
    delta_create_table(spark, table, schema)
    write_delta(
        spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 1)], "name string, seq long"
        ),
        table,
    )
    assert sorted(r.id for r in read_delta(spark, table).collect()) == [-2, -1, 0]
    # merge rewrites the id=0 row with an explicit id — watermark stays -2
    delta_merge(
        spark, table,
        spark.createDataFrame([(0, "a2", 2)], "id long, name string, seq long"),
        keys=["id"], sequence_by="seq",
    )
    from pos_dlt_spark.sources.delta_writer import _identity_spec

    assert _identity_spec(delta_snapshot(spark, table).schema)["id"][
        "highWaterMark"
    ] == -2
    write_delta(
        spark.createDataFrame([("d", 1)], "name string, seq long"), table
    )
    ids = sorted(r.id for r in read_delta(spark, table).collect())
    assert ids == [-3, -2, -1, 0]  # fresh id is -3: no collision
    got = {r.id: r.name for r in read_delta(spark, table).collect()}
    assert got[0] == "a2"


def test_hwm_merge_zero_and_direction():
    """Watermark merge with a concurrent writer: 0 is a PRESENT
    watermark (not falsy-absent), and descending columns merge toward
    the MINIMUM."""
    from pos_dlt_spark.sources.delta_writer import _merge_hwms

    assert _merge_hwms({"id": -1}, {"id": {"highWaterMark": 0, "step": -1}}) == {"id": -1}
    assert _merge_hwms({"id": -1}, {"id": {"highWaterMark": -4, "step": -1}}) == {"id": -4}
    assert _merge_hwms({"id": 5}, {"id": {"highWaterMark": 0, "step": 1}}) == {"id": 5}
    assert _merge_hwms({"id": 2}, {"id": {"highWaterMark": 7, "step": 1}}) == {"id": 7}
    assert _merge_hwms({"id": 3}, {"id": {"highWaterMark": None, "step": 1}}) == {"id": 3}
    assert _merge_hwms({"id": 3}, {}) == {"id": 3}
