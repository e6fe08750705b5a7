"""ALTER TABLE surface: ADD COLUMN (metadata-only schema evolution,
old files read NULL), ENABLE COLUMN MAPPING (upgrade path: physical
names pinned to current names), RENAME COLUMN / DROP COLUMN (require
the mapping; data files untouched), and the refusal matrix
(referenced / partition / last columns)."""

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
    delta_alter_add_column,
    delta_alter_drop_column,
    delta_alter_rename_column,
    delta_enable_column_mapping,
    delta_merge,
    delta_update,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 10).alias("bucket"),
        F.concat(F.lit("n"), F.col("id")).alias("name"),
    )


def test_add_column_reads_null_from_old_files(spark, tmp_path):
    table = str(tmp_path / "a1")
    write_delta(_df(spark, 0, 10), table)
    v = delta_alter_add_column(spark, table, "score", "double")
    assert v == 1
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "name", "score"]
    assert all(r.score is None for r in got.collect())
    # appends now carry the column; old files still read NULL
    write_delta(
        _df(spark, 10, 12).withColumn("score", F.lit(1.5)), table
    )
    by_id = {r.id: r.score for r in read_delta(spark, table).collect()}
    assert by_id[3] is None and by_id[10] == 1.5


def test_add_column_under_column_mapping_mints_fresh_identity(spark, tmp_path):
    table = str(tmp_path / "a2")
    write_delta(_df(spark, 0, 5), table)
    delta_enable_column_mapping(spark, table)
    delta_alter_add_column(spark, table, "score", "double", comment="why not")
    snap = delta_snapshot(spark, table)
    assert snap.column_mapping == "name"
    assert snap.field_ids["score"] == 4
    assert snap.physical_names["score"].startswith("col-")
    assert snap.configuration["delta.columnMapping.maxColumnId"] == "4"
    # a write lands the column under its physical name
    write_delta(
        _df(spark, 5, 6).withColumn("score", F.lit(2.0)), table
    )
    got = {r.id: r.score for r in read_delta(spark, table).collect()}
    assert got[5] == 2.0 and got[0] is None


def test_rename_requires_mapping_then_roundtrips(spark, tmp_path):
    table = str(tmp_path / "a3")
    write_delta(_df(spark, 0, 10), table)
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        delta_alter_rename_column(spark, table, "name", "label")
    delta_enable_column_mapping(spark, table)
    delta_alter_rename_column(spark, table, "name", "label")
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "label"]
    # old files resolve through the pinned physical name
    assert {r.label for r in got.collect()} == {f"n{i}" for i in range(10)}
    # the rename survives DML: update through the NEW logical name
    delta_update(spark, table, "id = 3", {"label": "'renamed'"})
    got = {r.id: r.label for r in read_delta(spark, table).collect()}
    assert got[3] == "renamed" and got[4] == "n4"
    # merges speak the new name too
    upd = spark.createDataFrame(
        [(4, 4, "merged")], "id long, bucket long, label string"
    )
    delta_merge(spark, table, upd, keys=["id"], sequence_by="id")
    got = {r.id: r.label for r in read_delta(spark, table).collect()}
    assert got[4] == "merged"


def test_rename_partition_column_updates_partition_list(spark, tmp_path):
    table = str(tmp_path / "a4")
    write_delta(_df(spark, 0, 20), table, partition_by=["bucket"])
    delta_enable_column_mapping(spark, table)
    delta_alter_rename_column(spark, table, "bucket", "band")
    snap = delta_snapshot(spark, table)
    assert snap.partition_columns == ["band"]
    got = read_delta(spark, table).filter(F.col("band") == 3)
    assert sorted(r.id for r in got.collect()) == [3, 13]


def test_drop_column_hides_data_and_readd_mints_fresh(spark, tmp_path):
    table = str(tmp_path / "a5")
    write_delta(_df(spark, 0, 10), table)
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        delta_alter_drop_column(spark, table, "name")
    delta_enable_column_mapping(spark, table)
    delta_alter_drop_column(spark, table, "name")
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket"]
    # re-adding the same logical name must NOT resurrect the old bytes
    delta_alter_add_column(spark, table, "name", "string")
    got = read_delta(spark, table)
    assert all(r.name is None for r in got.collect())
    snap = delta_snapshot(spark, table)
    assert snap.physical_names["name"] != "name"  # fresh physical identity


def test_alter_refusal_matrix(spark, tmp_path):
    table = str(tmp_path / "a6")
    write_delta(
        _df(spark, 0, 10), table, partition_by=["bucket"],
        configuration={"delta.constraints.namelen": "length(name) > 0"},
    )
    delta_enable_column_mapping(spark, table)
    with pytest.raises(ValueError, match="already exists"):
        delta_alter_add_column(spark, table, "name", "string")
    with pytest.raises(ValueError, match="referenced"):
        delta_alter_rename_column(spark, table, "name", "label")
    with pytest.raises(ValueError, match="referenced"):
        delta_alter_drop_column(spark, table, "name")
    with pytest.raises(ValueError, match="partition column"):
        delta_alter_drop_column(spark, table, "bucket")
    with pytest.raises(ValueError, match="does not exist"):
        delta_alter_rename_column(spark, table, "ghost", "x")
    # enable is idempotent
    v = delta_snapshot(spark, table).version
    assert delta_enable_column_mapping(spark, table) == v


def test_add_column_on_id_mode_reads_null_not_error(spark, tmp_path):
    """id-mode resolution of a field id absent from old files must
    surface NULL (ignoreMissing), not fail the scan."""
    from tests.test_delta_cm import _build_cm_table

    table = _build_cm_table(spark, tmp_path, "id", with_field_ids=True)
    delta_alter_add_column(spark, table, "extra", "bigint")
    snap = delta_snapshot(spark, table)
    assert snap.field_ids["extra"] == 3
    got = read_delta(spark, table)
    assert got.count() == 20 and all(r.extra is None for r in got.collect())


def test_add_drop_constraint_and_properties(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import (
        DeltaConstraintViolation,
        delta_add_constraint,
        delta_drop_constraint,
        delta_set_properties,
        delta_unset_properties,
    )

    table = str(tmp_path / "c1")
    write_delta(_df(spark, 0, 10), table)
    # a constraint existing rows violate must not land
    with pytest.raises(DeltaConstraintViolation):
        delta_add_constraint(spark, table, "pos", "id >= 5")
    assert "delta.constraints.pos" not in delta_snapshot(spark, table).configuration
    # a satisfiable one lands and is ENFORCED on the next write
    delta_add_constraint(spark, table, "pos", "id >= 0")
    with pytest.raises(DeltaConstraintViolation):
        write_delta(
            spark.createDataFrame([(-1, 0, "x")], "id long, bucket long, name string"),
            table,
        )
    with pytest.raises(ValueError, match="already exists"):
        delta_add_constraint(spark, table, "pos", "id >= 0")
    delta_drop_constraint(spark, table, "pos")
    write_delta(
        spark.createDataFrame([(-1, 0, "x")], "id long, bucket long, name string"),
        table,
    )  # now legal
    with pytest.raises(ValueError, match="does not exist"):
        delta_drop_constraint(spark, table, "pos")

    # properties: merge / remove, structural keys refused
    delta_set_properties(spark, table, {"delta.appendOnly": "false", "team": "x"})
    conf = delta_snapshot(spark, table).configuration
    assert conf["team"] == "x"
    with pytest.raises(ValueError, match="structural"):
        delta_set_properties(spark, table, {"delta.columnMapping.mode": "name"})
    with pytest.raises(ValueError, match="delta_add_constraint"):
        delta_set_properties(spark, table, {"delta.constraints.c": "id > 0"})
    delta_unset_properties(spark, table, ["team", "ghost"])
    assert "team" not in delta_snapshot(spark, table).configuration


def test_restore_undoes_alters(spark, tmp_path):
    """RESTORE re-commits the target snapshot's metadata, so the ALTER
    family (upgrade/rename/add) rolls back cleanly."""
    from pos_dlt_spark.sources.delta_writer import delta_restore

    table = str(tmp_path / "ra")
    write_delta(_df(spark, 0, 10), table)  # v0
    delta_enable_column_mapping(spark, table)  # v1
    delta_alter_rename_column(spark, table, "name", "label")  # v2
    delta_alter_add_column(spark, table, "extra", "bigint")  # v3
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "label", "extra"]
    delta_restore(spark, table, version=0)
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "bucket", "name"]
    snap = delta_snapshot(spark, table)
    assert snap.column_mapping == "none"
    assert {r.name for r in got.collect()} == {f"n{i}" for i in range(10)}


# --- TYPE WIDENING (protocol typeWidening feature) -----------------------


def _narrow(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").cast("int").alias("k"),
        (F.col("id") / 4).cast("float").alias("x"),
        F.concat(F.lit("n"), F.col("id")).alias("s"),
    )


def test_widen_int_to_long_mixed_files(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_type

    t = str(tmp_path / "w")
    write_delta(_narrow(spark, 0, 10).coalesce(1), t)
    files_before = {rel for rel, _ in delta_snapshot(spark, t).files}
    delta_alter_column_type(spark, t, "k", "long")
    delta_alter_column_type(spark, t, "x", "double")
    snap = delta_snapshot(spark, t)
    # metadata-only: no rewrite; feature in BOTH lists; typeChanges kept
    assert {rel for rel, _ in snap.files} == files_before
    assert "typeWidening" in set(snap.protocol.get("readerFeatures") or ())
    assert "typeWidening" in set(snap.protocol.get("writerFeatures") or ())
    kf = next(f for f in snap.schema.fields if f.name == "k")
    assert kf.dataType.typeName() == "long"
    tc = kf.metadata["delta.typeChanges"]
    assert tc[0]["fromType"] == "integer" and tc[0]["toType"] == "long"
    # append at the wide types; both widths coexist and upcast at scan
    wide = spark.range(10, 15).select(
        F.col("id").alias("k"),
        (F.col("id") / 4.0).alias("x"),
        F.concat(F.lit("n"), F.col("id")).alias("s"),
    )
    write_delta(wide.coalesce(1), t)
    got = {r.k: r.x for r in read_delta(spark, t).collect()}
    assert sorted(got) == list(range(15))
    import numpy as np

    for k, x in got.items():
        want = np.float32(k / 4) if k < 10 else k / 4.0
        assert x == float(want), (k, x)


def test_widen_then_dml_and_checkpoint(spark, tmp_path):
    """UPDATE after widening rewrites its hit files at the wide type
    while untouched narrow files keep upcasting; the widened schema and
    typeChanges survive a checkpoint crossing."""
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_type

    t = str(tmp_path / "w")
    write_delta(_narrow(spark, 0, 8).repartition(2), t)
    delta_alter_column_type(spark, t, "k", "long")
    delta_update(spark, t, "k = 3", {"s": "'patched'"})
    for _ in range(10):  # cross the checkpoint cadence
        write_delta(
            spark.range(100, 101).selectExpr(
                "id AS k", "CAST(id AS FLOAT) x", "'z' AS s"
            ),
            t,
        )
    snap = delta_snapshot(spark, t)
    kf = next(f for f in snap.schema.fields if f.name == "k")
    assert kf.dataType.typeName() == "long"
    assert kf.metadata["delta.typeChanges"][0]["toType"] == "long"
    assert read_delta(spark, t).filter("s = 'patched'").count() == 1
    assert read_delta(spark, t).count() == 18


def test_widen_refusal_matrix(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_type

    t = str(tmp_path / "w")
    df = spark.range(4).selectExpr(
        "CAST(id AS INT) k", "CAST(id AS STRING) p", "CAST(id AS LONG) big"
    )
    write_delta(df, t, partition_by=["p"])
    with pytest.raises(ValueError, match="not a widening"):
        delta_alter_column_type(spark, t, "big", "int")  # narrowing
    with pytest.raises(ValueError, match="not a widening"):
        delta_alter_column_type(spark, t, "k", "string")
    with pytest.raises(ValueError, match="partition column"):
        delta_alter_column_type(spark, t, "p", "string")
    with pytest.raises(ValueError, match="does not exist"):
        delta_alter_column_type(spark, t, "nope", "long")


def test_widen_stats_skipping_mixed_widths(spark, tmp_path):
    """skip_files prunes on a widened column across files whose footer
    stats were written at different widths."""
    from pos_dlt_spark.sources.delta import skip_files
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_type

    t = str(tmp_path / "w")
    write_delta(_narrow(spark, 0, 100).coalesce(1), t)
    delta_alter_column_type(spark, t, "k", "long")
    write_delta(
        spark.range(1000, 1100).selectExpr(
            "id AS k", "CAST(id AS FLOAT) x", "'w' AS s"
        ).coalesce(1),
        t,
    )
    snap = delta_snapshot(spark, t)
    pruned, skipped = skip_files(snap, [("k", "<", 50)])
    assert skipped == 1 and len(pruned.files) == 1
    assert read_delta(spark, t, prune=[("k", "<", 50)]).filter(
        "k < 50"
    ).count() == 50


def test_widen_cdf_and_streaming_replay_across_commit(spark, tmp_path):
    """table_changes and the streaming replay must read files written
    BEFORE a widening commit under the latest (wider) schema — one
    uniform output type, old pages upcast."""
    from pos_dlt_spark.sources.delta_cdf import read_change_feed
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_type

    t = str(tmp_path / "w")
    write_delta(
        spark.range(0, 4).selectExpr("CAST(id AS INT) k", "'a' s").coalesce(1),
        t, configuration={"delta.enableChangeDataFeed": "true"},
    )
    delta_alter_column_type(spark, t, "k", "long")
    write_delta(
        spark.range(4, 6).selectExpr("id AS k", "'b' s").coalesce(1), t
    )
    cf = read_change_feed(spark, t, start_version=0)
    assert dict(cf.dtypes)["k"] == "bigint"
    got = sorted(
        (r.k, r._change_type, r._commit_version) for r in cf.collect()
    )
    assert got == [(i, "insert", 0) for i in range(4)] + [
        (4, "insert", 2), (5, "insert", 2),
    ]
    # streaming replay: the plan's pre-widening files read correctly
    # under the LATEST (wider) schema, exactly as the stream consumer
    # reads them
    from pos_dlt_spark.sources.delta import delta_snapshot, replay_adds

    snap = delta_snapshot(spark, t)
    plan = replay_adds(spark, t)
    total = 0
    for _v, files in plan:
        df = spark.read.schema(snap.data_schema).parquet(*files)
        assert dict(df.dtypes)["k"] == "bigint"
        total += df.count()
    assert total == 6


def test_widen_refuses_referenced_column(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import (
        delta_add_constraint,
        delta_alter_column_type,
    )

    t = str(tmp_path / "w")
    write_delta(
        spark.range(4).selectExpr("CAST(id AS INT) k", "CAST(id AS INT) b"), t
    )
    delta_add_constraint(spark, t, "kpos", "k >= 0")
    with pytest.raises(ValueError, match="referenced by"):
        delta_alter_column_type(spark, t, "k", "long")
    delta_alter_column_type(spark, t, "b", "double")  # unreferenced: fine


# --- COLUMN DEFAULTS (allowColumnDefaults writer feature) -----------------


def test_column_defaults_fill_on_append(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_alter_column_default

    t = str(tmp_path / "d")
    write_delta(spark.range(3).selectExpr("id", "'x' AS tag"), t)
    delta_alter_column_default(spark, t, "tag", "'unspecified'")
    snap = delta_snapshot(spark, t)
    assert "allowColumnDefaults" in set(snap.protocol.get("writerFeatures") or ())
    # append WITHOUT the column: default materializes
    write_delta(spark.range(3, 5).selectExpr("id"), t)
    # append WITH the column: provided value wins
    write_delta(spark.range(5, 6).selectExpr("id", "'explicit' AS tag"), t)
    got = {r.id: r.tag for r in read_delta(spark, t).collect()}
    assert got == {0: "x", 1: "x", 2: "x", 3: "unspecified",
                   4: "unspecified", 5: "explicit"}
    # existing rows were never backfilled (0-2 keep 'x') — and dropping
    # the default makes a column-less append refuse again
    delta_alter_column_default(spark, t, "tag", None)
    with pytest.raises(ValueError, match="schema drift"):
        write_delta(spark.range(6, 7).selectExpr("id"), t)


def test_column_default_validation_matrix(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import (
        delta_alter_column_default,
        delta_create_table,
    )

    t = str(tmp_path / "d")
    write_delta(spark.range(3).selectExpr("id", "'x' AS tag"), t)
    with pytest.raises(ValueError, match="does not exist"):
        delta_alter_column_default(spark, t, "nope", "'v'")
    with pytest.raises(ValueError, match="self-contained"):
        delta_alter_column_default(spark, t, "tag", "id || '!'")  # col ref
    # identity/generated refusals
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t2 = str(tmp_path / "ident")
    schema = StructType([
        StructField("pk", LongType(), True,
                    {"delta.identity.start": 1, "delta.identity.step": 1,
                     "delta.identity.allowExplicitInsert": False}),
        StructField("s", StringType()),
    ])
    delta_create_table(spark, t2, schema)
    with pytest.raises(ValueError, match="identity"):
        delta_alter_column_default(spark, t2, "pk", "7")


def test_column_defaults_at_creation_and_checkpoint(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_create_table

    from pyspark.sql.types import LongType, StringType, StructField, StructType

    t = str(tmp_path / "d")
    schema = StructType([
        StructField("k", LongType()),
        StructField("flag", StringType(), True, {"CURRENT_DEFAULT": "'new'"}),
    ])
    delta_create_table(spark, t, schema)
    snap = delta_snapshot(spark, t)
    assert "allowColumnDefaults" in set(snap.protocol.get("writerFeatures") or ())
    for i in range(11):  # crosses the interval-10 checkpoint
        write_delta(spark.range(i, i + 1).selectExpr("id AS k"), t)
    assert read_delta(spark, t).filter("flag = 'new'").count() == 11
    # default survives the checkpoint fold (schemaString metadata)
    snap = delta_snapshot(spark, t)
    f = next(f for f in snap.schema.fields if f.name == "flag")
    assert f.metadata["CURRENT_DEFAULT"] == "'new'"


def test_column_defaults_apply_to_merge(spark, tmp_path):
    """A merge frame omitting a defaulted column behaves as if every
    supplied row carried the default (this merge is whole-row CDC:
    supplied rows replace matched rows entirely)."""
    from pos_dlt_spark.sources.delta_writer import (
        delta_alter_column_default,
        delta_merge,
    )

    t = str(tmp_path / "d")
    write_delta(
        spark.range(3).selectExpr("id", "id AS seq", "'old' AS tag"), t
    )
    delta_alter_column_default(spark, t, "tag", "'fresh'")
    delta_merge(
        spark, t,
        spark.range(2, 5).selectExpr("id", "id + 10 AS seq"),
        keys=["id"], sequence_by="seq",
    )
    got = {r.id: r.tag for r in read_delta(spark, t).collect()}
    assert got == {0: "old", 1: "old", 2: "fresh", 3: "fresh", 4: "fresh"}
