"""Change Data Feed: change files + cdc actions on MERGE/DELETE when
``delta.enableChangeDataFeed=true``, derivation from data actions for
plain commits, invisibility to normal reads and streaming replay, vacuum
retention of retained commits' change files."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import (
    delta_snapshot,
    read_delta,
    replay_adds,
)
from pos_dlt_spark.sources.delta_cdf import read_change_feed
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_merge,
    write_delta,
)

CDF = {"delta.enableChangeDataFeed": "true"}


def _kv(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"k": [r[0] for r in rows], "seq": [r[1] for r in rows],
                      "v": [r[2] for r in rows]}),
        schema="k long, seq long, v string",
    )


def test_merge_emits_change_files(spark, tmp_path):
    table = str(tmp_path / "cdfm")
    write_delta(_kv(spark, [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")]), table,
                configuration=CDF)
    # update k=2 (wins), stale k=3 (loses), insert k=9
    v = delta_merge(
        spark, table,
        _kv(spark, [(2, 5, "b2"), (3, 0, "stale"), (9, 5, "i")]),
        keys=["k"], sequence_by="seq",
    )
    changes = read_change_feed(spark, table, start_version=v, end_version=v)
    got = {(r.k, r._change_type): (r.seq, r.v) for r in changes.collect()}
    # the stale k=3 row LOST: not a change at all
    assert got == {
        (2, "update_preimage"): (1, "b"),
        (2, "update_postimage"): (5, "b2"),
        (9, "insert"): (5, "i"),
    }
    assert all(r._commit_version == v for r in changes.collect())
    # change files live under _change_data and are INVISIBLE to reads
    assert os.path.isdir(os.path.join(table, "_change_data"))
    assert read_delta(spark, table).count() == 4
    # ...and to streaming replay (cdc actions are dataChange=false)
    plan = replay_adds(spark, table)
    assert [vv for vv, _ in plan] == [0, 1]


def test_plain_commits_derive_changes_without_change_files(spark, tmp_path):
    table = str(tmp_path / "cdfd")
    write_delta(_kv(spark, [(1, 1, "a"), (2, 1, "b")]), table, configuration=CDF)
    write_delta(_kv(spark, [(3, 1, "c")]), table)
    # append commits carry no cdc actions; inserts derive from the adds
    ch = read_change_feed(spark, table)
    got = {(r.k, r._change_type, r._commit_version) for r in ch.collect()}
    assert got == {(1, "insert", 0), (2, "insert", 0), (3, "insert", 1)}
    # overwrite: removed files' rows surface as deletes, new as inserts
    write_delta(_kv(spark, [(7, 1, "z")]), table, mode="overwrite")
    ch2 = read_change_feed(spark, table, start_version=2)
    got2 = {(r.k, r._change_type) for r in ch2.collect()}
    assert got2 == {(1, "delete"), (2, "delete"), (3, "delete"), (7, "insert")}


def test_delete_emits_delete_changes_dv_and_rewrite(spark, tmp_path):
    for mode in ("dv", "rewrite"):
        table = str(tmp_path / f"cdfdel_{mode}")
        write_delta(
            _kv(spark, [(i, 1, f"x{i}") for i in range(10)]).coalesce(1),
            table, configuration=CDF,
        )
        v, n = delta_delete(spark, table, "k % 3 = 0", mode=mode)
        assert n == 4
        ch = read_change_feed(spark, table, start_version=v, end_version=v)
        got = {(r.k, r._change_type) for r in ch.collect()}
        assert got == {(0, "delete"), (3, "delete"), (6, "delete"), (9, "delete")}
        # a second DV delete only emits NEWLY deleted rows
        if mode == "dv":
            v2, n2 = delta_delete(spark, table, "k <= 3")
            ch2 = read_change_feed(spark, table, start_version=v2, end_version=v2)
            got2 = {(r.k, r._change_type) for r in ch2.collect()}
            assert got2 == {(1, "delete"), (2, "delete")}  # 0 and 3 already dead


def test_partitioned_cdf_roundtrip(spark, tmp_path):
    table = str(tmp_path / "cdfp")
    df = spark.range(8).select(
        F.col("id").alias("k"), F.lit(1).alias("seq"),
        (F.col("id") % 2).cast("int").alias("b"),
    )
    write_delta(df, table, partition_by=["b"], configuration=CDF)
    v = delta_merge(
        spark, table,
        spark.createDataFrame(pd.DataFrame({"k": [3, 100], "seq": [9, 9], "b": [1, 0]})),
        keys=["k"], sequence_by="seq",
    )
    ch = read_change_feed(spark, table, start_version=v, end_version=v)
    got = {(r.k, r._change_type): (r.seq, r.b) for r in ch.collect()}
    assert got == {
        (3, "update_preimage"): (1, 1),
        (3, "update_postimage"): (9, 1),
        (100, "insert"): (9, 0),
    }


def test_dv_delete_without_cdf_derives_changes(spark, tmp_path):
    """A DV-mode delete committed WITHOUT change files (table written
    without enableChangeDataFeed) must yield the SAME change rows the
    rewrite path / the change-file path would — derived from the DV
    delta against the prior snapshot."""
    table = str(tmp_path / "cdfx")
    write_delta(
        _kv(spark, [(i, 1, f"x{i}") for i in range(10)]).coalesce(1), table
    )  # CDF off
    v, n = delta_delete(spark, table, "k % 3 = 0")  # DV delete, no change files
    assert n == 4
    ch = read_change_feed(spark, table, start_version=v, end_version=v)
    got = {(r.k, r._change_type) for r in ch.collect()}
    assert got == {(0, "delete"), (3, "delete"), (6, "delete"), (9, "delete")}
    # a second DV delete derives only the NEWLY deleted rows (DV union
    # minus the prior DV), and its paired same-path remove+add is NOT a
    # full-file delete+insert
    v2, n2 = delta_delete(spark, table, "k <= 3")
    assert n2 == 2
    ch2 = read_change_feed(spark, table, start_version=v2, end_version=v2)
    got2 = {(r.k, r._change_type) for r in ch2.collect()}
    assert got2 == {(1, "delete"), (2, "delete")}
    # CDF-based replay (the apply_changes feed) serves these commits too
    from pos_dlt_spark.sources.delta_cdf import replay_changes

    plan = replay_changes(spark, table, start_version=v)
    assert [vv for vv, _ in plan] == [v, v2]


def test_cdf_after_optimize_is_empty(spark, tmp_path):
    """OPTIMIZE reorganizes bytes, not rows: its commit must contribute
    ZERO changes (removes carry dataChange=false). A dataChange=true
    remove there would surface every compacted file as deleted with no
    matching inserts — corrupted CDF."""
    from pos_dlt_spark.sources.delta_writer import delta_optimize

    table = str(tmp_path / "cdfo")
    write_delta(_kv(spark, [(1, 1, "a"), (2, 1, "b")]).coalesce(1), table,
                configuration=CDF)
    write_delta(_kv(spark, [(3, 1, "c")]).coalesce(1), table)
    v = delta_optimize(spark, table, target_files=1)
    assert v == 2
    ch = read_change_feed(spark, table, start_version=v, end_version=v)
    assert ch.count() == 0
    # the full feed still shows the original inserts exactly once
    full = read_change_feed(spark, table)
    got = {(r.k, r._change_type, r._commit_version) for r in full.collect()}
    assert got == {(1, "insert", 0), (2, "insert", 0), (3, "insert", 1)}


def test_vacuum_keeps_retained_change_files(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_vacuum

    table = str(tmp_path / "cdfv")
    write_delta(_kv(spark, [(1, 1, "a"), (2, 1, "b")]), table, configuration=CDF)
    v1 = delta_merge(spark, table, _kv(spark, [(1, 5, "a2")]), keys=["k"],
                     sequence_by="seq")
    v2 = delta_merge(spark, table, _kv(spark, [(2, 5, "b2")]), keys=["k"],
                     sequence_by="seq")
    # retain the last two versions: v2's change files must survive
    deleted = delta_vacuum(spark, table, retain_versions=1)
    ch = read_change_feed(spark, table, start_version=v2, end_version=v2)
    assert {(r.k, r._change_type) for r in ch.collect()} == {
        (2, "update_preimage"), (2, "update_postimage")
    }
    assert all(not d.startswith("_change_data") or "cdc-" in d for d in deleted)
    # v1's change files were vacuumable (not retained)
    v1_readable = True
    try:
        read_change_feed(spark, table, start_version=v1, end_version=v1).collect()
    except Exception:
        v1_readable = False
    # either collected (preferred) or still present under the mtime guard —
    # never a wrong result
    if v1_readable:
        ch1 = read_change_feed(spark, table, start_version=v1, end_version=v1)
        assert {(r.k, r._change_type) for r in ch1.collect()} == {
            (1, "update_preimage"), (1, "update_postimage")
        }


def test_dv_replay_folds_prior_snapshot_once(spark, tmp_path, monkeypatch):
    """Regression: DV-delta CDF derivation over many DV commits must
    maintain the prior live-set incrementally — ONE historical snapshot
    fold total, not one per DV commit (quadratic over the log)."""
    import pos_dlt_spark.sources.delta_cdf as cdfmod
    from pos_dlt_spark.sources.delta_cdf import replay_changes

    table = str(tmp_path / "dvreplay")
    write_delta(_kv(spark, [(k, 1, f"v{k}") for k in range(12)]).repartition(1), table)
    expected = []
    for mod, tag in ((5, "m5"), (3, "m3"), (2, "m2")):
        v, _ = delta_delete(spark, table, f"k % {mod} = 0", mode="dv")
        expected.append(v)
    real = cdfmod.delta_snapshot
    versioned_calls: list[int] = []

    def counting(spark_, path_, version=None, *a, **k):
        if version is not None:
            versioned_calls.append(version)
        return real(spark_, path_, version, *a, **k)

    monkeypatch.setattr(cdfmod, "delta_snapshot", counting)
    plan = replay_changes(spark, table, start_version=expected[0])
    assert len(versioned_calls) <= 1  # seeded once, folded forward
    got = {}
    for v, df in plan:
        got[v] = sorted(
            r.k for r in df.collect() if r._change_type == "delete"
        )
    assert got[expected[0]] == [0, 5, 10]
    assert got[expected[1]] == [3, 6, 9]        # 0 already deleted
    assert got[expected[2]] == [2, 4, 8]        # 0,6,10 already deleted
