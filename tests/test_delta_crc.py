"""Per-commit VERSION CHECKSUMS ({version}.crc, VERDICT r07 #4): every
commit of this writer emits post-commit table totals (tableSizeBytes /
numFiles / live domainMetadata), computed incrementally at the commit
choke point (O(actions)); checkpoints re-anchor the chain from the full
fold; delta_fsck cross-checks the newest checksum against a fold; log
cleanup retires checksums with their commits."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pos_dlt_spark.sources import delta_fixture as fx
from pos_dlt_spark.sources.delta import delta_snapshot
from pos_dlt_spark.sources.delta_check import delta_fsck
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_log_cleanup,
    delta_merge,
    delta_optimize,
    delta_restore,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _crc(table, v):
    p = os.path.join(table, "_delta_log", f"{v:020d}.crc")
    if not os.path.exists(p):
        return None
    with open(p, encoding="utf-8") as fh:
        return json.load(fh)


def _fold_totals(spark, table, v=None):
    snap = delta_snapshot(spark, table, v)
    return (
        len(snap.files),
        sum(int(snap.adds[rel].get("size") or 0) for rel, _ in snap.files),
    )


def test_crc_chain_tracks_every_dml(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10).repartition(2), t)             # v0
    write_delta(_df(spark, 10, 20).coalesce(1), t)               # v1
    delta_merge(
        spark, t, _df(spark, 15, 25).coalesce(1),
        keys=["id"], sequence_by="name",
    )                                                            # v2
    delta_delete(spark, t, "id >= 22", mode="rewrite")           # v3
    delta_optimize(spark, t, target_files=1)                     # v4
    write_delta(_df(spark, 100, 101).coalesce(1), t, mode="overwrite")  # v5
    snap = delta_snapshot(spark, t)
    for v in range(snap.version + 1):
        crc = _crc(t, v)
        assert crc is not None, f"missing crc for version {v}"
        n, size = _fold_totals(spark, t, v)
        assert crc["numFiles"] == n, (v, crc, n)
        assert crc["tableSizeBytes"] == size, (v, crc, size)
    assert delta_fsck(spark, t) == []


def test_crc_exact_through_rt_enable_and_restore(spark, tmp_path):
    from pos_dlt_spark.sources.delta_writer import delta_enable_row_tracking

    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10).repartition(2), t)
    delta_enable_row_tracking(spark, t)  # re-adds every live path
    v = delta_snapshot(spark, t).version
    crc = _crc(t, v)
    n, size = _fold_totals(spark, t)
    assert (crc["numFiles"], crc["tableSizeBytes"]) == (n, size)
    assert "delta.rowTracking" in crc["domainMetadata"]
    write_delta(_df(spark, 10, 30).coalesce(1), t)
    delta_restore(spark, t, version=v)
    v2 = delta_snapshot(spark, t).version
    crc2 = _crc(t, v2)
    assert (crc2["numFiles"], crc2["tableSizeBytes"]) == _fold_totals(spark, t)
    assert delta_fsck(spark, t) == []


def test_fsck_catches_corrupted_crc(spark, tmp_path):
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10).coalesce(1), t)
    v = delta_snapshot(spark, t).version
    p = os.path.join(t, "_delta_log", f"{v:020d}.crc")
    crc = json.load(open(p, encoding="utf-8"))
    crc["numFiles"] += 7
    crc["tableSizeBytes"] -= 1
    with open(p, "w", encoding="utf-8") as fh:
        json.dump(crc, fh)
    findings = delta_fsck(spark, t)
    codes = [c for _, c, _ in findings]
    assert codes.count("crc") == 2  # numFiles AND tableSizeBytes


def test_foreign_commit_breaks_chain_checkpoint_reanchors(spark, tmp_path):
    """A raw commit whose remove carries no size cannot be accounted:
    no .crc for it or its descendants — until the next checkpoint
    recomputes the totals from the fold and the chain resumes."""
    t = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10).coalesce(1), t)  # v0
    snap = delta_snapshot(spark, t)
    rel = next(rel for rel, _ in snap.files)
    # foreign writer: remove without size (+ its own replacement add)
    import shutil

    dup = rel.replace(".parquet", "_foreign.parquet")
    shutil.copy(os.path.join(t, rel), os.path.join(t, dup))
    fx.write_commit(
        t, 1,
        [
            fx.commit_info_action("FOREIGN", {}),
            {"remove": {"path": rel, "deletionTimestamp": 0, "dataChange": True}},
            fx.add_action(dup, size=os.path.getsize(os.path.join(t, dup)),
                          stats=json.dumps({"numRecords": 10})),
        ],
    )
    write_delta(_df(spark, 10, 12).coalesce(1), t)  # v2 — still broken
    assert _crc(t, 1) is None and _crc(t, 2) is None
    for _ in range(8):  # cross the checkpoint cadence (interval 10)
        write_delta(_df(spark, 20, 21).coalesce(1), t)
    v = delta_snapshot(spark, t).version
    assert v == 10 and _crc(t, 10) is not None  # checkpoint re-anchored
    write_delta(_df(spark, 30, 31).coalesce(1), t)  # incremental again
    crc = _crc(t, 11)
    assert (crc["numFiles"], crc["tableSizeBytes"]) == _fold_totals(spark, t)
    assert delta_fsck(spark, t) == []


def test_log_cleanup_retires_old_crcs(spark, tmp_path):
    t = str(tmp_path / "t")
    for i in range(12):  # crosses the interval-10 checkpoint
        write_delta(_df(spark, i, i + 1).coalesce(1), t)
    deleted = delta_log_cleanup(spark, t)
    assert any(n.endswith(".crc") for n in deleted)
    log = os.listdir(os.path.join(t, "_delta_log"))
    crcs = sorted(n for n in log if n.endswith(".crc"))
    # horizon (v10) kept, older gone, later commits intact
    assert crcs[0] == f"{10:020d}.crc"
    write_delta(_df(spark, 50, 51).coalesce(1), t)
    assert _crc(t, 12) is not None
    assert delta_fsck(spark, t) == []


def test_total_live_size_matches_per_row_walk(spark, tmp_path):
    """The columnar tableSizeBytes (block sums minus removed/overridden
    rows plus the JSON override layer) equals the per-row walk on a fold
    with a checkpoint, post-checkpoint appends, a DV re-add, and an
    OPTIMIZE's remove+re-add window."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import delta_snapshot
    from pos_dlt_spark.sources.delta_writer import (
        delta_delete,
        delta_optimize,
        write_delta,
    )

    table = str(tmp_path / "tls")
    for i in range(4):  # v0..v3, classic checkpoint at v3
        write_delta(
            spark.range(i * 10, i * 10 + 10).withColumn("v", F.col("id") * 2)
            .coalesce(1),
            table,
            checkpoint_interval=3,
        )
    delta_delete(spark, table, "id < 3", checkpoint_interval=0)  # DV re-add
    write_delta(
        spark.range(100, 120).withColumn("v", F.col("id") * 2).coalesce(2),
        table,
        checkpoint_interval=0,
    )
    delta_optimize(spark, table, target_files=1)  # removes + re-adds
    snap = delta_snapshot(spark, table)
    assert hasattr(snap.adds, "total_live_size")
    columnar = snap.adds.total_live_size()
    walk = sum(int(snap.adds[rel].get("size") or 0) for rel, _ in snap.files)
    assert columnar == walk and walk > 0
