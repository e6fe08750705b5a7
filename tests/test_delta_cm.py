"""Column-mapping (name / id mode) READ support — protocol tables whose
parquet files carry physical column names (or field ids) decoupled from
the logical schema. Fixtures are built straight from the public protocol
shape: schema-field metadata ``delta.columnMapping.physicalName`` /
``delta.columnMapping.id``, configuration ``delta.columnMapping.mode``."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, LongType, StringType, StructField, StructType

from pos_dlt_spark.sources import delta_fixture as fx
from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
    skip_files,
)


def _logical_schema(mode: str) -> StructType:
    def md(i, phys):
        m = {"delta.columnMapping.id": i}
        if mode in ("name", "id"):
            m["delta.columnMapping.physicalName"] = phys
        return m

    return StructType(
        [
            StructField("id", LongType(), True, md(1, "col-aaaa")),
            StructField("name", StringType(), True, md(2, "col-bbbb")),
        ]
    )


def _write_physical(spark, df, dest: str, with_field_ids: bool) -> str:
    """Write one parquet file whose columns carry PHYSICAL names (and
    optionally parquet field ids)."""
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    cols = [
        F.col("id").alias("col-aaaa", metadata={"parquet.field.id": 1} if with_field_ids else {}),
        F.col("name").alias("col-bbbb", metadata={"parquet.field.id": 2} if with_field_ids else {}),
    ]
    stage = dest + "_stage"
    df.select(*cols).coalesce(1).write.mode("overwrite").parquet(stage)
    f = [n for n in os.listdir(stage) if n.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, f), dest)
    return dest


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _build_cm_table(spark, tmp_path, mode: str, with_field_ids: bool) -> str:
    table = str(tmp_path / f"cm_{mode}")
    os.makedirs(table, exist_ok=True)
    _write_physical(spark, _df(spark, 0, 10), os.path.join(table, "part-a.parquet"), with_field_ids)
    _write_physical(spark, _df(spark, 10, 20), os.path.join(table, "part-b.parquet"), with_field_ids)
    fx.write_commit(
        table,
        0,
        [
            fx.protocol_action(min_reader=2, min_writer=5),
            fx.metadata_action(
                _logical_schema(mode),
                configuration={"delta.columnMapping.mode": mode,
                               "delta.columnMapping.maxColumnId": "2"},
            ),
            fx.add_action("part-a.parquet"),
            fx.add_action("part-b.parquet"),
        ],
    )
    return table


def test_name_mode_reads_logical_columns(spark, tmp_path):
    table = _build_cm_table(spark, tmp_path, "name", with_field_ids=False)
    snap = delta_snapshot(spark, table)
    assert snap.column_mapping == "name"
    assert snap.physical_names == {"id": "col-aaaa", "name": "col-bbbb"}
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "name"]
    rows = {(r.id, r.name) for r in got.collect()}
    assert rows == {(i, f"n{i}") for i in range(20)}


def test_id_mode_resolves_by_field_id_despite_renames(spark, tmp_path):
    """id mode's whole point: physical names are irrelevant — resolution
    rides parquet field ids, surviving arbitrary renames."""
    table = _build_cm_table(spark, tmp_path, "id", with_field_ids=True)
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "name"]
    rows = {(r.id, r.name) for r in got.collect()}
    assert rows == {(i, f"n{i}") for i in range(20)}


def test_name_mode_partitioned_with_physical_dir_names(spark, tmp_path):
    """Partition dirs and partitionValues keys use PHYSICAL names; the
    fold normalizes to logical and the scan re-attaches values as typed
    literals (Hive discovery is bypassed — it would resolve the wrong
    name)."""
    table = str(tmp_path / "cmp")
    os.makedirs(table, exist_ok=True)
    schema = StructType(
        [
            StructField("id", LongType(), True,
                        {"delta.columnMapping.id": 1,
                         "delta.columnMapping.physicalName": "col-aaaa"}),
            StructField("b", IntegerType(), True,
                        {"delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName": "col-part"}),
        ]
    )
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    for b in (0, 1):
        df = spark.range(b * 10, b * 10 + 10).select(
            F.col("id").alias("col-aaaa")
        )
        stage = os.path.join(table, "_stage")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        f = [n for n in os.listdir(stage) if n.endswith(".parquet")][0]
        rel = f"col-part={b}/part-{b}.parquet"
        os.makedirs(os.path.join(table, f"col-part={b}"), exist_ok=True)
        os.replace(os.path.join(stage, f), os.path.join(table, rel))
    fx.write_commit(
        table,
        0,
        [
            fx.protocol_action(min_reader=2, min_writer=5),
            fx.metadata_action(
                schema,
                partition_columns=["b"],
                configuration={"delta.columnMapping.mode": "name"},
            ),
            fx.add_action("col-part=0/part-0.parquet", partition_values={"col-part": "0"}),
            fx.add_action("col-part=1/part-1.parquet", partition_values={"col-part": "1"}),
        ],
    )
    snap = delta_snapshot(spark, table)
    assert snap.partition_columns == ["b"]
    # partitionValues keys normalized physical -> logical at fold time
    assert all(set(pv) == {"b"} for _, pv in snap.files)
    got = read_delta(spark, table)
    rows = {(r.id, r.b) for r in got.collect()}
    assert rows == {(i, 0) for i in range(10)} | {(i, 1) for i in range(10, 20)}
    # partition pruning semantics still correct (filter post-attach)
    assert sorted(r.id for r in got.filter(F.col("b") == 1).collect()) == list(range(10, 20))


def test_cm_stats_skipping_translates_names(spark, tmp_path):
    table = _build_cm_table(spark, tmp_path, "name", with_field_ids=False)
    # stats keyed by PHYSICAL column name, as real writers emit
    import json

    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    lines = [json.loads(line) for line in open(log)]
    for a in lines:
        if "add" in a:
            lo = 0 if a["add"]["path"] == "part-a.parquet" else 10
            a["add"]["stats"] = json.dumps(
                {"numRecords": 10,
                 "minValues": {"col-aaaa": lo},
                 "maxValues": {"col-aaaa": lo + 9}}
            )
    with open(log, "w") as fh:
        for a in lines:
            fh.write(json.dumps(a) + "\n")
    snap = delta_snapshot(spark, table)
    pruned, skipped = skip_files(snap, [("id", ">=", 10)])  # LOGICAL name
    assert skipped == 1 and len(pruned.files) == 1
    got = read_delta(spark, table, prune=[("id", ">=", 10)]).filter(F.col("id") >= 10)
    assert sorted(r.id for r in got.collect()) == list(range(10, 20))


def test_name_mode_write_roundtrip(spark, tmp_path):
    """Name-mode tables are WRITABLE: appends/merges/deletes rename
    logical->physical on the way out, so the files a foreign name-mode
    reader resolves by physicalName stay correct."""
    import pyarrow.parquet as pq

    from pos_dlt_spark.sources.delta_writer import (
        delta_delete,
        delta_merge,
        delta_optimize,
        write_delta,
    )

    table = _build_cm_table(spark, tmp_path, "name", with_field_ids=False)
    # append
    write_delta(_df(spark, 20, 25), table)
    got = {(r.id, r.name) for r in read_delta(spark, table).collect()}
    assert got == {(i, f"n{i}") for i in range(25)}
    # the appended file physically carries the PHYSICAL column names
    snap = delta_snapshot(spark, table)
    new_rel = [rel for rel, _ in snap.files if rel.startswith("part-") and rel not in
               ("part-a.parquet", "part-b.parquet")]
    assert new_rel
    phys_cols = set(pq.read_schema(os.path.join(table, new_rel[0])).names)
    assert phys_cols == {"col-aaaa", "col-bbbb"}
    # ...and its stats are keyed by physical names (skipping still works)
    import json as _json

    stats = _json.loads(snap.adds[new_rel[0]]["stats"])
    assert set(stats["minValues"]) <= {"col-aaaa", "col-bbbb"}
    # read-modify-MERGE round-trip (update + insert through the window)
    upd = spark.createDataFrame([(3, "n3-upd"), (100, "n100")], "id long, name string")
    delta_merge(spark, table, upd, keys=["id"], sequence_by="id")
    got = {r.id: r.name for r in read_delta(spark, table).collect()}
    assert got[3] == "n3-upd" and got[100] == "n100" and len(got) == 26
    # DELETE (both modes) and OPTIMIZE keep resolving correctly
    delta_delete(spark, table, "id >= 24 AND id < 100", mode="rewrite")
    delta_delete(spark, table, "id < 2")  # dv mode
    delta_optimize(spark, table, target_files=1)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == list(range(2, 24)) + [100]


def test_name_mode_partitioned_write(spark, tmp_path):
    """Appends into a PARTITIONED name-mode table must render partition
    directories and partitionValues keys under physical names."""
    from pos_dlt_spark.sources.delta_writer import write_delta

    table = str(tmp_path / "cmpw")
    os.makedirs(table, exist_ok=True)
    schema = StructType(
        [
            StructField("id", LongType(), True,
                        {"delta.columnMapping.id": 1,
                         "delta.columnMapping.physicalName": "col-aaaa"}),
            StructField("b", IntegerType(), True,
                        {"delta.columnMapping.id": 2,
                         "delta.columnMapping.physicalName": "col-part"}),
        ]
    )
    fx.write_commit(
        table, 0,
        [
            fx.protocol_action(min_reader=2, min_writer=5),
            fx.metadata_action(
                schema, partition_columns=["b"],
                configuration={"delta.columnMapping.mode": "name"},
            ),
        ],
    )
    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("b")
    )
    write_delta(df, table, partition_by=["b"])
    snap = delta_snapshot(spark, table)
    assert all(rel.startswith("col-part=") for rel, _ in snap.files)
    assert all(set(a["partitionValues"]) == {"col-part"} for a in snap.adds.values())
    got = {(r.id, r.b) for r in read_delta(spark, table).collect()}
    assert got == {(i, i % 2) for i in range(10)}


def test_id_mode_write_roundtrip_stamps_field_ids(spark, tmp_path):
    """id-mode tables are WRITABLE: staged files carry physical names AND
    the mapping's parquet field ids, so a foreign id-mode reader resolves
    the new files rename-proof. Covers append / merge / delete /
    optimize on one table."""
    import pyarrow.parquet as pq

    from pos_dlt_spark.sources.delta_writer import (
        delta_delete,
        delta_merge,
        delta_optimize,
        write_delta,
    )

    table = _build_cm_table(spark, tmp_path, "id", with_field_ids=True)
    write_delta(_df(spark, 20, 25), table)
    got = {(r.id, r.name) for r in read_delta(spark, table).collect()}
    assert got == {(i, f"n{i}") for i in range(25)}
    # the appended file carries physical names + field ids in its schema
    snap = delta_snapshot(spark, table)
    new_rel = [rel for rel, _ in snap.files if rel not in
               ("part-a.parquet", "part-b.parquet")]
    assert new_rel
    sch = pq.read_schema(os.path.join(table, new_rel[0]))
    assert set(sch.names) == {"col-aaaa", "col-bbbb"}
    fids = {
        sch.field(i).name: (sch.field(i).metadata or {}).get(b"PARQUET:field_id")
        for i in range(len(sch.names))
    }
    assert fids == {"col-aaaa": b"1", "col-bbbb": b"2"}
    # a rename-proof reader still resolves: flip the PHYSICAL names in
    # the mapping (ids unchanged) and the same files read identically
    upd = spark.createDataFrame([(3, "n3-upd"), (100, "n100")], "id long, name string")
    delta_merge(spark, table, upd, keys=["id"], sequence_by="id")
    got = {r.id: r.name for r in read_delta(spark, table).collect()}
    assert got[3] == "n3-upd" and got[100] == "n100" and len(got) == 26
    delta_delete(spark, table, "id >= 24 AND id < 100", mode="rewrite")
    delta_delete(spark, table, "id < 2")  # dv mode
    delta_optimize(spark, table, target_files=1)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == list(range(2, 24)) + [100]
    # every live file in the final snapshot carries the field ids
    snap = delta_snapshot(spark, table)
    for rel, _ in snap.files:
        sch = pq.read_schema(os.path.join(table, rel))
        ids = {(f.metadata or {}).get(b"PARQUET:field_id") for f in sch}
        assert ids == {b"1", b"2"}, rel


def test_writer_refuses_incomplete_id_mapping_and_cm_creation(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import write_delta

    # id-mode table whose mapping carries NO field ids: refuse writes
    table = str(tmp_path / "cmnoids")
    os.makedirs(table, exist_ok=True)
    schema = StructType(
        [
            StructField("id", LongType(), True,
                        {"delta.columnMapping.physicalName": "col-aaaa"}),
            StructField("name", StringType(), True,
                        {"delta.columnMapping.physicalName": "col-bbbb"}),
        ]
    )
    _write_physical(spark, _df(spark, 0, 10), os.path.join(table, "part-a.parquet"), True)
    fx.write_commit(
        table,
        0,
        [
            fx.protocol_action(min_reader=2, min_writer=5),
            fx.metadata_action(
                schema,
                configuration={"delta.columnMapping.mode": "id",
                               "delta.columnMapping.maxColumnId": "2"},
            ),
            fx.add_action("part-a.parquet"),
        ],
    )
    with pytest.raises(DeltaProtocolError):
        write_delta(_df(spark, 10, 15), table)


@pytest.mark.parametrize("mode", ["name", "id"])
def test_create_cm_table_mints_mapping(spark, tmp_path, mode):
    """CREATE with delta.columnMapping.mode mints a fresh physical name
    (col-<uuid>) and field id per column; the first write's files carry
    them, and the whole DML surface works on the new table."""
    import pyarrow.parquet as pq

    from pos_dlt_spark.sources.delta_writer import delta_merge, write_delta

    table = str(tmp_path / f"cmnew_{mode}")
    write_delta(
        _df(spark, 0, 10), table,
        configuration={"delta.columnMapping.mode": mode},
    )
    snap = delta_snapshot(spark, table)
    assert snap.column_mapping == mode
    assert all(p.startswith("col-") for p in snap.physical_names.values())
    assert sorted(snap.field_ids.values()) == [1, 2]
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "2"
    rel = snap.files[0][0]
    sch = pq.read_schema(os.path.join(table, rel))
    assert set(sch.names) == set(snap.physical_names.values())
    fids = {(f.metadata or {}).get(b"PARQUET:field_id") for f in sch}
    assert fids == {b"1", b"2"}
    # append + merge keep working through logical names
    write_delta(_df(spark, 10, 15), table)
    upd = spark.createDataFrame([(3, "upd")], "id long, name string")
    delta_merge(spark, table, upd, keys=["id"], sequence_by="id")
    got = {r.id: r.name for r in read_delta(spark, table).collect()}
    assert got[3] == "upd" and len(got) == 15


def test_create_cm_partitioned_physical_dirs(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import write_delta

    table = str(tmp_path / "cmnewp")
    df = _df(spark, 0, 20).withColumn("part", (F.col("id") % 2).cast("long"))
    write_delta(
        df, table, partition_by=["part"],
        configuration={"delta.columnMapping.mode": "name"},
    )
    snap = delta_snapshot(spark, table)
    phys_part = snap.physical_names["part"]
    assert any(n.startswith(f"{phys_part}=") for n in os.listdir(table)
               if not n.startswith("_"))
    got = read_delta(spark, table).filter(F.col("part") == 1)
    assert sorted(r.id for r in got.collect()) == list(range(1, 20, 2))


@pytest.mark.parametrize("mode", ["name", "id"])
def test_cm_cdf_roundtrip(spark, tmp_path, mode):
    """CDF on column-mapping tables: change files carry PHYSICAL names
    (+ field ids under id mode) exactly like data files; table_changes
    aliases them back to logical names."""
    import pyarrow.parquet as pq

    from pos_dlt_spark.sources.delta_cdf import read_change_feed
    from pos_dlt_spark.sources.delta_writer import delta_delete, delta_merge

    table = str(tmp_path / f"cmcdf_{mode}")
    os.makedirs(table, exist_ok=True)
    _write_physical(spark, _df(spark, 0, 10),
                    os.path.join(table, "part-a.parquet"), mode == "id")
    fx.write_commit(
        table,
        0,
        [
            fx.protocol_action(min_reader=2, min_writer=5),
            fx.metadata_action(
                _logical_schema(mode),
                configuration={"delta.columnMapping.mode": mode,
                               "delta.columnMapping.maxColumnId": "2",
                               "delta.enableChangeDataFeed": "true"},
            ),
            fx.add_action("part-a.parquet"),
        ],
    )
    upd = spark.createDataFrame([(3, "n3-upd"), (100, "n100")], "id long, name string")
    v = delta_merge(spark, table, upd, keys=["id"], sequence_by="id")
    ch = read_change_feed(spark, table, start_version=v, end_version=v)
    got = {(r.id, r._change_type): r.name for r in ch.collect()}
    assert got == {
        (3, "update_preimage"): "n3",
        (3, "update_postimage"): "n3-upd",
        (100, "insert"): "n100",
    }
    # the change files themselves carry PHYSICAL column names
    cds = []
    for root, _dirs, files in os.walk(os.path.join(table, "_change_data")):
        cds += [os.path.join(root, n) for n in files if n.endswith(".parquet")]
    assert cds
    sch = pq.read_schema(cds[0])
    assert set(sch.names) == {"col-aaaa", "col-bbbb", "_change_type"}
    if mode == "id":
        fids = {f.name: (f.metadata or {}).get(b"PARQUET:field_id") for f in sch}
        assert fids["col-aaaa"] == b"1" and fids["col-bbbb"] == b"2"
    # delete via rewrite and via DV both yield logical delete changes
    v2, _n = delta_delete(spark, table, "id = 5", mode="rewrite")
    ch2 = read_change_feed(spark, table, start_version=v2, end_version=v2)
    assert {(r.id, r._change_type) for r in ch2.collect()} == {(5, "delete")}
    v3, _n = delta_delete(spark, table, "id = 6", mode="dv")
    ch3 = read_change_feed(spark, table, start_version=v3, end_version=v3)
    assert {(r.id, r._change_type) for r in ch3.collect()} == {(6, "delete")}
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [0, 1, 2, 3, 4, 7, 8, 9, 100]


def test_unknown_cm_mode_fails(spark, tmp_path):
    table = str(tmp_path / "cmbad")
    os.makedirs(table, exist_ok=True)
    fx.write_commit(
        table,
        0,
        [
            fx.protocol_action(),
            fx.metadata_action(
                _logical_schema("name"),
                configuration={"delta.columnMapping.mode": "weird"},
            ),
        ],
    )
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        delta_snapshot(spark, table)


def test_id_mode_restore_is_allowed_metadata_only(spark, tmp_path):
    """RESTORE writes no data files, so it works even on id-mode tables
    the writer otherwise refuses."""
    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources.delta_writer import delta_restore

    table = _build_cm_table(spark, tmp_path, "id", with_field_ids=True)
    # v1: drop one file (a foreign writer's delete)
    fx.write_commit(table, 1, [fx.remove_action("part-b.parquet")])
    assert read_delta(spark, table).count() == 10
    v = delta_restore(spark, table, version=0)
    assert v == 2
    assert read_delta(spark, table).count() == 20
