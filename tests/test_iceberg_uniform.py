"""UniForm (Iceberg) metadata emission: hand-rolled Avro object
container round-trips, commit-time sync on append-only tables, the
boundary refusals, and the optimize->resync->vacuum ordering that keeps
Iceberg readers from ever holding a stale manifest."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources import iceberg_uniform as uf
from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
from pos_dlt_spark.sources.delta_writer import (
    delta_optimize,
    delta_vacuum,
    write_delta,
)

UNIFORM_CONF = {
    "delta.appendOnly": "true",
    "delta.universalFormat.enabledFormats": "iceberg",
}


def test_avro_container_roundtrip(tmp_path):
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
            {"name": "c", "type": {"type": "map", "values": "int"}},
            {"name": "d", "type": {"type": "array", "items": "double"}},
            {
                "name": "e",
                "type": {
                    "type": "record",
                    "name": "inner",
                    "fields": [{"name": "x", "type": "boolean"}],
                },
            },
        ],
    }
    rows = [
        {"a": -1, "b": None, "c": {}, "d": [], "e": {"x": True}},
        {"a": 2**40, "b": "héllo", "c": {"k": -7}, "d": [1.5, -2.25], "e": {"x": False}},
    ]
    p = str(tmp_path / "t.avro")
    uf.write_avro(p, schema, rows, meta={"custom": "yes"})
    got_schema, got = uf.read_avro(p)
    assert got_schema == schema
    assert got == rows


def test_avro_long_zigzag_edges(tmp_path):
    schema = {
        "type": "record",
        "name": "z",
        "fields": [{"name": "v", "type": "long"}],
    }
    vals = [0, -1, 1, 63, -64, 64, 2**31, -(2**31), 2**62, -(2**62)]
    p = str(tmp_path / "z.avro")
    uf.write_avro(p, schema, [{"v": v} for v in vals])
    _, got = uf.read_avro(p)
    assert [r["v"] for r in got] == vals


def test_uniform_sync_on_commit_and_reader_resolution(spark, tmp_path):
    t = str(tmp_path / "uni")
    df = spark.range(0, 100).withColumn("p", (F.col("id") % 2).cast("string"))
    write_delta(df.repartition(2), t, partition_by=["p"], configuration=UNIFORM_CONF)
    write_delta(
        spark.range(100, 150).withColumn("p", F.lit("0")), t, partition_by=["p"]
    )
    files = uf.read_uniform_files(t)
    snap = delta_snapshot(spark, t)
    assert len(files) == len(snap.files)
    assert sum(f["record_count"] for f in files) == 150
    assert {f["partition"]["p"] for f in files} == {"0", "1"}
    assert all(f["file_format"] == "PARQUET" for f in files)
    # the data itself is reachable through the Iceberg metadata alone
    got = spark.read.parquet(*[f["file_path"] for f in files]).count()
    assert got == 150
    # snapshot history grew: one Iceberg snapshot per synced commit
    meta = json.load(
        open(
            os.path.join(
                t,
                "metadata",
                f"v{int(open(os.path.join(t, 'metadata', 'version-hint.text')).read())}.metadata.json",
            )
        )
    )
    assert meta["format-version"] == 2
    assert len(meta["snapshots"]) == 2
    assert meta["current-snapshot-id"] == meta["snapshots"][-1]["snapshot-id"]
    for k in ("schemas", "partition-specs", "last-column-id", "table-uuid"):
        assert k in meta


def test_uniform_optimize_resync_before_vacuum(spark, tmp_path):
    """OPTIMIZE (legal on appendOnly: dataChange=false) re-emits the
    Iceberg snapshot in the same call, so the following VACUUM never
    collects a file the last manifest still references."""
    t = str(tmp_path / "uo")
    write_delta(spark.range(0, 200).repartition(4), t, configuration=UNIFORM_CONF)
    delta_optimize(spark, t, target_files=1)
    delta_vacuum(spark, t, retain_versions=0, grace_seconds=-3600)
    files = uf.read_uniform_files(t)
    assert all(os.path.exists(f["file_path"]) for f in files)
    assert spark.read.parquet(*[f["file_path"] for f in files]).count() == 200
    assert read_delta(spark, t).count() == 200


def test_uniform_refusals(spark, tmp_path):
    df = spark.range(0, 10).withColumn("v", F.col("id"))
    with pytest.raises(ValueError, match="appendOnly"):
        write_delta(
            df,
            str(tmp_path / "u1"),
            configuration={"delta.universalFormat.enabledFormats": "iceberg"},
        )
    with pytest.raises(ValueError, match="column mapping"):
        write_delta(
            df,
            str(tmp_path / "u2"),
            configuration={
                **UNIFORM_CONF,
                "delta.columnMapping.mode": "name",
            },
        )
    nested = spark.range(0, 5).select(
        F.col("id"), F.struct(F.col("id").alias("x")).alias("s")
    )
    with pytest.raises(ValueError, match="Iceberg rendering"):
        write_delta(nested, str(tmp_path / "u3"), configuration=UNIFORM_CONF)


def test_uniform_manifest_field_ids_follow_spec(spark, tmp_path):
    """The emitted Avro schemas carry the spec's REQUIRED field-ids —
    what a real Iceberg reader keys on."""
    t = str(tmp_path / "ui")
    write_delta(spark.range(0, 20), t, configuration=UNIFORM_CONF)
    meta_dir = os.path.join(t, "metadata")
    snaps = [n for n in os.listdir(meta_dir) if n.startswith("snap-")]
    schema, manifests = uf.read_avro(os.path.join(meta_dir, snaps[0]))
    ids = {f["name"]: f.get("field-id") for f in schema["fields"]}
    assert ids["manifest_path"] == 500 and ids["added_snapshot_id"] == 503
    eschema, entries = uf.read_avro(manifests[0]["manifest_path"])
    eids = {f["name"]: f.get("field-id") for f in eschema["fields"]}
    assert eids["status"] == 0 and eids["data_file"] == 2
    dfields = next(f for f in eschema["fields"] if f["name"] == "data_file")
    dids = {f["name"]: f.get("field-id") for f in dfields["type"]["fields"]}
    assert dids["file_path"] == 100 and dids["record_count"] == 103
    assert entries and all(e["status"] == 1 for e in entries)


def test_uniform_incremental_manifests(spark, tmp_path):
    """Appends reuse the prior manifests and add one manifest holding
    only the NEW files (per-commit metadata rides the commit, not the
    table); OPTIMIZE's compaction falls back to one full rewrite."""
    t = str(tmp_path / "uinc")
    write_delta(spark.range(0, 50).coalesce(1), t, configuration=UNIFORM_CONF)
    write_delta(spark.range(50, 100).coalesce(1), t)
    write_delta(spark.range(100, 150).coalesce(1), t)

    def mlist():
        md = os.path.join(t, "metadata")
        v = int(open(os.path.join(md, "version-hint.text")).read())
        meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
        cur = next(
            s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
        )
        return uf.read_avro(cur["manifest-list"])[1], meta

    manifests, meta = mlist()
    assert len(manifests) == 3  # one manifest per commit, earlier ones reused
    assert [m["added_files_count"] for m in manifests] == [1, 1, 1]
    assert meta["snapshots"][-1]["summary"]["total-records"] == "150"
    files = uf.read_uniform_files(t)
    assert len(files) == 3
    assert spark.read.parquet(*[f["file_path"] for f in files]).count() == 150

    delta_optimize(spark, t, target_files=1)  # removes -> full rewrite
    manifests2, _ = mlist()
    assert len(manifests2) == 1
    files2 = uf.read_uniform_files(t)
    assert spark.read.parquet(*[f["file_path"] for f in files2]).count() == 150


def test_read_iceberg_dataframe_scan(spark, tmp_path):
    """read_iceberg is a metadata-pure DataFrame scan: same rows as the
    Delta read, partition columns re-attached from the hive layout and
    cast to the metadata's declared types."""
    t = str(tmp_path / "ri")
    df = spark.range(0, 120).select(
        F.col("id"),
        (F.col("id") % 3).cast("int").alias("bucket"),
        (F.col("id") * 1.5).alias("v"),
    )
    write_delta(
        df.repartition(2), t, partition_by=["bucket"], configuration=UNIFORM_CONF
    )
    got = uf.read_iceberg(spark, t)
    assert set(got.columns) == {"id", "bucket", "v"}
    assert dict(got.dtypes)["bucket"] == "int"
    delta_rows = {
        (r["id"], r["bucket"], r["v"]) for r in read_delta(spark, t).collect()
    }
    ice_rows = {(r["id"], r["bucket"], r["v"]) for r in got.collect()}
    assert ice_rows == delta_rows


def test_read_iceberg_snapshot_time_travel(spark, tmp_path):
    t = str(tmp_path / "rtt")
    write_delta(spark.range(0, 40).coalesce(1), t, configuration=UNIFORM_CONF)
    write_delta(spark.range(40, 100).coalesce(1), t)
    assert uf.read_iceberg(spark, t).count() == 100
    assert uf.read_iceberg(spark, t, snapshot_id=1).count() == 40
    # timestamp travel: the first snapshot's own timestamp selects it
    md = os.path.join(t, "metadata")
    v = int(open(os.path.join(md, "version-hint.text")).read())
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    ts0 = meta["snapshots"][0]["timestamp-ms"]
    assert uf.read_iceberg(spark, t, as_of_timestamp_ms=ts0).count() == 40
    with pytest.raises(ValueError, match="not in table metadata"):
        uf.read_iceberg(spark, t, snapshot_id=99)
    with pytest.raises(ValueError, match="at or before"):
        uf.read_iceberg(spark, t, as_of_timestamp_ms=ts0 - 10_000_000)


def test_read_iceberg_manifest_partition_pruning(spark, tmp_path):
    """Equality partition_filter prunes at the manifest level: only the
    matching partition's files reach the parquet scan."""
    t = str(tmp_path / "rp")
    df = spark.range(0, 90).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("bucket")
    )
    write_delta(
        df.repartition(3, "bucket"),
        t,
        partition_by=["bucket"],
        configuration=UNIFORM_CONF,
    )
    pruned = uf.read_iceberg(spark, t, partition_filter={"bucket": 1})
    all_files = {f["file_path"] for f in uf.read_uniform_files(t)}
    used = {"/" + p.split("://", 1)[-1].lstrip("/") for p in pruned.inputFiles()}
    assert used < all_files  # strictly fewer files than the full scan
    assert all(f"bucket=1" in p for p in used)
    rows = pruned.collect()
    assert len(rows) == 30 and all(r["bucket"] == 1 for r in rows)
    with pytest.raises(ValueError, match="not partition columns"):
        uf.read_iceberg(spark, t, partition_filter={"id": 1})


def test_read_iceberg_refuses_delete_manifests(spark, tmp_path):
    """A manifest-list entry with content=1 (delete manifest) refuses
    loudly — ignoring it would resurrect deleted rows."""
    t = str(tmp_path / "rd")
    write_delta(spark.range(0, 10).coalesce(1), t, configuration=UNIFORM_CONF)
    md = os.path.join(t, "metadata")
    v = int(open(os.path.join(md, "version-hint.text")).read())
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    schema, entries = uf.read_avro(cur["manifest-list"])
    entries[0]["content"] = 1
    uf.write_avro(cur["manifest-list"], schema, entries, meta={"format-version": "2"})
    with pytest.raises(ValueError, match="DELETE manifests"):
        uf.read_iceberg(spark, t)


def test_avro_deflate_codec_roundtrip(tmp_path):
    """Deflate-codec containers (real Iceberg writers' default) read
    back identically — the foreign-table half of the reader boundary."""
    schema = {
        "type": "record",
        "name": "t",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"], "default": None},
        ],
    }
    rows = [{"a": i, "b": None if i % 3 == 0 else f"s{i}" * 20} for i in range(500)]
    p = str(tmp_path / "d.avro")
    uf.write_avro(p, schema, rows, codec="deflate")
    got_schema, got = uf.read_avro(p)
    assert got_schema == schema and got == rows
    pn = str(tmp_path / "n.avro")
    uf.write_avro(pn, schema, rows, codec="null")
    assert os.path.getsize(p) < os.path.getsize(pn)  # actually compressed


def test_read_iceberg_deflate_manifests(spark, tmp_path):
    """A table whose manifest list + manifests were rewritten with the
    deflate codec (a foreign writer's shape) scans identically."""
    t = str(tmp_path / "rdz")
    df = spark.range(0, 60).select(
        F.col("id"), (F.col("id") % 2).cast("int").alias("bucket")
    )
    write_delta(
        df.repartition(2), t, partition_by=["bucket"], configuration=UNIFORM_CONF
    )
    before = {(r["id"], r["bucket"]) for r in uf.read_iceberg(spark, t).collect()}
    md = os.path.join(t, "metadata")
    v = int(open(os.path.join(md, "version-hint.text")).read())
    meta = json.load(open(os.path.join(md, f"v{v}.metadata.json")))
    cur = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    ls, entries = uf.read_avro(cur["manifest-list"])
    for m in entries:
        ms, es = uf.read_avro(m["manifest_path"])
        uf.write_avro(m["manifest_path"], ms, es, codec="deflate")
    uf.write_avro(cur["manifest-list"], ls, entries, codec="deflate")
    after = {(r["id"], r["bucket"]) for r in uf.read_iceberg(spark, t).collect()}
    assert after == before


def test_convert_iceberg_to_delta_roundtrip(spark, tmp_path):
    """An Iceberg-only table (UniForm twin with its Delta log removed)
    converts to Delta from the MANIFESTS alone: schema, partition
    values, and footer stats carried over; an on-disk orphan parquet the
    snapshot never referenced stays excluded (a directory-walk converter
    would have swallowed it)."""
    import shutil

    from pos_dlt_spark.sources.delta_writer import convert_iceberg_to_delta

    t = str(tmp_path / "ci")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("bucket")
    )
    write_delta(
        df.repartition(2), t, partition_by=["bucket"], configuration=UNIFORM_CONF
    )
    expected = {(r["id"], r["bucket"]) for r in read_delta(spark, t).collect()}
    shutil.rmtree(os.path.join(t, "_delta_log"))
    # an orphan file the Iceberg snapshot does not reference
    orphan_dir = os.path.join(t, "bucket=0")
    orphan = os.path.join(orphan_dir, "part-orphan.parquet")
    src = next(
        os.path.join(orphan_dir, n)
        for n in os.listdir(orphan_dir)
        if n.endswith(".parquet")
    )
    shutil.copy(src, orphan)

    assert convert_iceberg_to_delta(spark, t) == 0
    snap = delta_snapshot(spark, t)
    assert snap.partition_columns == ["bucket"]
    assert not any("orphan" in rel for rel, _ in snap.files)
    got = {(r["id"], r["bucket"]) for r in read_delta(spark, t).collect()}
    assert got == expected
    # footer stats rode the conversion: every add carries numRecords
    assert all(
        json.loads(a["stats"])["numRecords"] > 0 for a in snap.adds.values()
    )


def test_convert_iceberg_snapshot_and_refusals(spark, tmp_path):
    import shutil

    from pos_dlt_spark.sources.delta_writer import convert_iceberg_to_delta

    t = str(tmp_path / "cs")
    write_delta(spark.range(0, 30).coalesce(1), t, configuration=UNIFORM_CONF)
    write_delta(spark.range(30, 80).coalesce(1), t)
    with pytest.raises(ValueError, match="already a Delta table"):
        convert_iceberg_to_delta(spark, t)
    shutil.rmtree(os.path.join(t, "_delta_log"))
    assert convert_iceberg_to_delta(spark, t, snapshot_id=1) == 0
    assert read_delta(spark, t).count() == 30


def test_uniform_manifest_column_bounds(spark, tmp_path):
    """Manifest entries carry spec field-id 125/128 column bounds
    serialized from the Delta adds' stats (LE single-value encoding)."""
    import struct as _struct

    t = str(tmp_path / "ub")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") * 1.5).alias("v"),
        F.concat(F.lit("doc-"), F.format_string("%03d", F.col("id"))).alias("s"),
    )
    write_delta(df.coalesce(1), t, configuration=UNIFORM_CONF)
    files = uf.read_uniform_files(t)
    assert len(files) == 1
    lb = {e["key"]: e["value"] for e in files[0]["lower_bounds"]}
    ub_ = {e["key"]: e["value"] for e in files[0]["upper_bounds"]}
    # field ids follow schema order: id=1, v=2, s=3
    assert _struct.unpack("<q", lb[1])[0] == 0
    assert _struct.unpack("<q", ub_[1])[0] == 99
    assert _struct.unpack("<d", ub_[2])[0] == 99 * 1.5
    assert lb[3] == b"doc-000" and ub_[3] == b"doc-099"


def test_read_iceberg_bounds_pruning(spark, tmp_path):
    """read_iceberg(prune=...) skips files whose manifest bounds prove
    exclusion — fewer input files, identical qualifying rows."""
    t = str(tmp_path / "up")
    df = spark.range(0, 400).select(F.col("id"))
    # 4 files with disjoint id ranges
    write_delta(df.repartitionByRange(4, "id"), t, configuration=UNIFORM_CONF)
    all_files = {f["file_path"] for f in uf.read_uniform_files(t)}
    assert len(all_files) == 4
    pruned = uf.read_iceberg(spark, t, prune=[("id", ">=", 300)])
    assert len(pruned.inputFiles()) < len(all_files)
    rows = sorted(r["id"] for r in pruned.filter("id >= 300").collect())
    assert rows == list(range(300, 400))
    # string bounds prune too
    t2 = str(tmp_path / "up2")
    sdf = spark.range(0, 200).select(
        F.concat(F.lit("k"), F.format_string("%04d", F.col("id"))).alias("s")
    )
    write_delta(sdf.repartitionByRange(2, "s"), t2, configuration=UNIFORM_CONF)
    p2 = uf.read_iceberg(spark, t2, prune=[("s", "<", "k0050")])
    assert len(p2.inputFiles()) == 1
    with pytest.raises(ValueError, match="not in table schema"):
        uf.read_iceberg(spark, t, prune=[("nope", "=", 1)])


def test_read_iceberg_without_version_hint(spark, tmp_path):
    """Foreign tables may lack version-hint.text: discovery falls back
    to the highest v<N>.metadata.json, per the spec's hint-less rule."""
    t = str(tmp_path / "nh")
    write_delta(spark.range(0, 30).coalesce(1), t, configuration=UNIFORM_CONF)
    write_delta(spark.range(30, 50).coalesce(1), t)
    os.remove(os.path.join(t, "metadata", "version-hint.text"))
    assert uf.read_iceberg(spark, t).count() == 50  # newest snapshot wins
    assert uf.read_iceberg(spark, t, snapshot_id=1).count() == 30


def test_uniform_expire_snapshots(spark, tmp_path):
    """expireSnapshots keeps the newest K snapshots, deletes expired
    metadata JSONs / manifest lists / manifests referenced by NO
    surviving list (incremental reuse means shared manifests must
    survive), never touches data files, and leaves the current read and
    retained time travel exact."""
    t = str(tmp_path / "exp")
    for i in range(6):  # snapshots 1..6, manifests reused incrementally
        write_delta(spark.range(i * 10, i * 10 + 10).coalesce(1), t,
                    configuration=UNIFORM_CONF if i == 0 else None)
    md = os.path.join(t, "metadata")
    before_manifests = {n for n in os.listdir(md) if n.startswith("manifest-")}
    assert len(before_manifests) == 6
    deleted = uf.uniform_expire_snapshots(t, keep=2)
    assert deleted
    meta = uf._read_prior_metadata(md)
    assert [s["snapshot-id"] for s in meta["snapshots"]] == [5, 6]
    # shared manifests: snapshot 5's list references manifests 1..5 —
    # ALL must survive even though snapshots 1..4 expired
    assert uf.read_iceberg(spark, t).count() == 60
    assert uf.read_iceberg(spark, t, snapshot_id=5).count() == 50
    with pytest.raises(ValueError, match="not in table metadata"):
        uf.read_iceberg(spark, t, snapshot_id=2)
    # expired metadata JSONs and manifest lists are gone
    left = set(os.listdir(md))
    assert not any(n == f"v{i}.metadata.json" for i in (1, 2, 3, 4) for n in left)
    assert sum(1 for n in left if n.startswith("snap-")) == 2
    # data files untouched: the Delta read still sees every row
    assert read_delta(spark, t).count() == 60
    with pytest.raises(ValueError, match="keep must be"):
        uf.uniform_expire_snapshots(t, keep=0)
