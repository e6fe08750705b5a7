"""Clustered tables (protocol 'clustering' writer feature / Liquid
Clustering surface): creation via cluster_by, the delta.clustering
domainMetadata (physical paths), bare-OPTIMIZE re-clustering on the
declared columns, ALTER CLUSTER BY, checkpoint survival, and the fsck
invariants."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import delta_snapshot, read_delta, skip_files
from pos_dlt_spark.sources.delta_clustering import (
    CLUSTERING_DOMAIN,
    clustering_columns,
)
from pos_dlt_spark.sources.delta_writer import (
    delta_alter_cluster_by,
    delta_create_table,
    delta_optimize,
    write_delta,
)


def _orders(spark, n=4000):
    return spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("v"),
        F.concat(F.lit("r"), F.col("id")).alias("s"),
    )


def test_create_with_cluster_by_declares_domain_and_features(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t, cluster_by=["v", "k"])
    snap = delta_snapshot(spark, t)
    wf = set(snap.protocol.get("writerFeatures") or ())
    assert {"clustering", "domainMetadata"} <= wf
    assert clustering_columns(snap) == ["v", "k"]
    raw = json.loads(snap.domain_metadata[CLUSTERING_DOMAIN])
    assert raw["clusteringColumns"] == [["v"], ["k"]]


def test_cluster_by_validation(spark, tmp_path):
    t = str(tmp_path / "bad")
    with pytest.raises(ValueError, match="not in the schema"):
        write_delta(_orders(spark), t, cluster_by=["nope"])
    with pytest.raises(ValueError, match="cannot also be partitioned"):
        write_delta(
            _orders(spark), t, cluster_by=["k"], partition_by=["v"]
        )
    write_delta(_orders(spark), t)
    with pytest.raises(ValueError, match="creation only"):
        write_delta(_orders(spark), t, cluster_by=["k"])


def test_bare_optimize_reclusters_on_declared_columns(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(8), t, cluster_by=["v"])
    snap0 = delta_snapshot(spark, t)
    _, skipped0 = skip_files(snap0, [("v", "<", 50)])
    delta_optimize(spark, t, target_files=8)  # no zorder arg
    snap1 = delta_snapshot(spark, t)
    _, skipped1 = skip_files(snap1, [("v", "<", 50)])
    assert skipped1 > skipped0 and skipped1 * 2 >= len(snap1.files)
    got = sorted(r.k for r in read_delta(spark, t).filter("v < 50").collect())
    want = sorted(
        r.k for r in _orders(spark).filter("v < 50").collect()
    )
    assert got == want


def test_alter_cluster_by_swaps_domain_lazily(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t)  # unclustered
    delta_alter_cluster_by(spark, t, ["v"])
    snap = delta_snapshot(spark, t)
    assert clustering_columns(snap) == ["v"]
    assert "clustering" in set(snap.protocol.get("writerFeatures") or ())
    delta_optimize(spark, t, target_files=4)
    _, skipped = skip_files(delta_snapshot(spark, t), [("v", "<", 50)])
    assert skipped >= 1
    delta_alter_cluster_by(spark, t, [])  # CLUSTER BY NONE
    assert clustering_columns(delta_snapshot(spark, t)) == []


def test_clustering_survives_checkpoint(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_orders(spark).coalesce(1), t, cluster_by=["k"])
    for _ in range(12):  # cross a checkpoint boundary
        write_delta(_orders(spark, 10).coalesce(1), t)
    import os

    assert any(
        n.endswith(".checkpoint.parquet")
        for n in os.listdir(os.path.join(t, "_delta_log"))
    )
    assert clustering_columns(delta_snapshot(spark, t)) == ["k"]


def test_fsck_flags_dangling_clustering_column(spark, tmp_path):
    from pos_dlt_spark.sources.delta_check import delta_fsck
    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources.delta_clustering import clustering_domain_action

    t = str(tmp_path / "c")
    write_delta(_orders(spark).coalesce(1), t, cluster_by=["v"])
    assert delta_fsck(spark, t) == []
    snap = delta_snapshot(spark, t)
    fx.write_commit(
        t, snap.version + 1,
        [fx.commit_info_action("CLUSTER BY", {}),
         clustering_domain_action(["ghost"])],
    )
    findings = delta_fsck(spark, t)
    assert any(code == "clustering" and sev == "error"
               for sev, code, _ in findings)


def test_create_table_ddl_with_cluster_by(spark, tmp_path):
    from pyspark.sql.types import LongType, StructField, StructType

    t = str(tmp_path / "ddl")
    schema = StructType(
        [StructField("a", LongType()), StructField("b", LongType())]
    )
    delta_create_table(spark, t, schema, cluster_by=["b"])
    snap = delta_snapshot(spark, t)
    assert clustering_columns(snap) == ["b"]
    write_delta(spark.range(5).selectExpr("id a", "id*2 b"), t)
    assert read_delta(spark, t).count() == 5


# --- incremental (ZCube-stamped) re-clustering — VERDICT r07 #1 ---------


def _live(spark, t):
    return {rel for rel, _ in delta_snapshot(spark, t).files}


def test_incremental_optimize_rewrites_only_new_files(spark, tmp_path):
    """OPTIMIZE -> append -> OPTIMIZE: the second run rewrites ONLY the
    appended (unstamped) files; the first run's ZCube is untouched —
    maintenance is O(new data), not O(table)."""
    from pos_dlt_spark.sources.delta_clustering import (
        PROVIDER_TAG,
        ZCUBE_ID_TAG,
        is_current_cluster_file,
    )

    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(8), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=4)
    snap1 = delta_snapshot(spark, t)
    cube1 = _live(spark, t)
    assert all(
        is_current_cluster_file(snap1.adds[r], ["v"]) for r in cube1
    )
    zids = {snap1.adds[r]["tags"][ZCUBE_ID_TAG] for r in cube1}
    assert len(zids) == 1  # one run = one cube
    # append fresh (unstamped) files
    write_delta(_orders(spark, 500).repartition(2), t)
    appended = _live(spark, t) - cube1
    assert len(appended) == 2
    v = delta_optimize(spark, t, target_files=4)
    snap2 = delta_snapshot(spark, t)
    live2 = _live(spark, t)
    # the original cube survived untouched; only the appends rewrote
    assert cube1 <= live2
    assert appended.isdisjoint(live2)
    new_cube = live2 - cube1
    assert all(
        (snap2.adds[r].get("tags") or {}).get(PROVIDER_TAG) == "liquid"
        for r in new_cube
    )
    assert {snap2.adds[r]["tags"][ZCUBE_ID_TAG] for r in new_cube} not in (
        set(), zids
    )
    # commitInfo records the incremental run
    import json as _json
    import os

    with open(
        os.path.join(t, "_delta_log", f"{v:020d}.json"), encoding="utf-8"
    ) as fh:
        ci = next(
            _json.loads(l)["commitInfo"]
            for l in fh
            if '"commitInfo"' in l
        )
    assert ci["operationParameters"]["auto"] == "True"
    assert int(ci["operationParameters"]["skippedFiles"]) == len(cube1)
    # a third bare OPTIMIZE with nothing new is a NO-OP (no commit)
    assert delta_optimize(spark, t, target_files=4) == snap2.version
    # rows intact
    assert read_delta(spark, t).count() == 4000 + 500


def test_optimize_full_consolidates_all_cubes(spark, tmp_path):
    """full=True (OPTIMIZE FULL) rewrites every file — stamped or not —
    into one fresh cube (small-cube consolidation)."""
    from pos_dlt_spark.sources.delta_clustering import ZCUBE_ID_TAG

    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=2)
    write_delta(_orders(spark, 300).repartition(2), t)
    delta_optimize(spark, t, target_files=2)  # second small cube
    snap = delta_snapshot(spark, t)
    assert len({
        snap.adds[r]["tags"][ZCUBE_ID_TAG] for r, _ in snap.files
    }) == 2
    before = _live(spark, t)
    delta_optimize(spark, t, target_files=2, full=True)
    snap2 = delta_snapshot(spark, t)
    after = _live(spark, t)
    assert before.isdisjoint(after)
    assert len({
        snap2.adds[r]["tags"][ZCUBE_ID_TAG] for r, _ in snap2.files
    }) == 1
    assert read_delta(spark, t).count() == 4300


def test_alter_cluster_by_invalidates_stamps(spark, tmp_path):
    """ALTER ... CLUSTER BY changes the columns: files stamped for the
    OLD columns are stale, so the next bare OPTIMIZE re-clusters them
    (the documented lazy re-cluster)."""
    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=2)
    cube_v = _live(spark, t)
    delta_alter_cluster_by(spark, t, ["k"])
    delta_optimize(spark, t, target_files=2)
    live = _live(spark, t)
    assert cube_v.isdisjoint(live)
    _, skipped = skip_files(delta_snapshot(spark, t), [("k", "<", 100)])
    assert skipped >= 1


def test_zcube_stamps_survive_checkpoint(spark, tmp_path):
    """add.tags must round-trip the checkpoint fold or the first
    post-checkpoint OPTIMIZE would re-cluster the whole table."""
    import os

    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=2)
    cube1 = _live(spark, t)
    for i in range(12):  # cross the checkpoint cadence
        write_delta(_orders(spark, 10).coalesce(1), t)
    assert any(
        n.endswith(".checkpoint.parquet")
        for n in os.listdir(os.path.join(t, "_delta_log"))
    )
    delta_optimize(spark, t, target_files=2)
    assert cube1 <= _live(spark, t)  # stamped cube skipped post-fold


def test_incremental_optimize_purges_dv_files(spark, tmp_path):
    """A stamped file that later grew a deletion vector is no longer
    current: the next incremental OPTIMIZE rewrites it minus the deleted
    rows (OPTIMIZE stays PURGE) and leaves its un-DV'd siblings alone."""
    from pos_dlt_spark.sources.delta_writer import delta_delete

    t = str(tmp_path / "c")
    write_delta(_orders(spark).repartition(4), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=4)
    cube = _live(spark, t)
    delta_delete(spark, t, "k = 7", mode="dv")
    snap = delta_snapshot(spark, t)
    dvd = {
        r for r, _ in snap.files if snap.adds[r].get("deletionVector")
    }
    assert dvd and dvd < cube
    delta_optimize(spark, t, target_files=4)
    live = _live(spark, t)
    assert (cube - dvd) <= live and dvd.isdisjoint(live)
    assert read_delta(spark, t).filter("k = 7").count() == 0
    assert read_delta(spark, t).count() == 3999


def test_min_cube_bytes_consolidates_small_cubes(spark, tmp_path):
    """Incremental OPTIMIZE with min_cube_bytes: stamped cubes below the
    threshold join the rewrite (many tiny runs coalesce); cubes at or
    above it stay untouched."""
    from pos_dlt_spark.sources.delta_clustering import ZCUBE_ID_TAG

    t = str(tmp_path / "c")
    write_delta(_orders(spark, 4000).repartition(4), t, cluster_by=["v"])
    delta_optimize(spark, t, target_files=2)  # big cube A (~4000 rows)
    snap = delta_snapshot(spark, t)
    big = _live(spark, t)
    big_bytes = sum(snap.adds[r]["size"] for r in big)
    # two tiny appends, each reclustered into its own small cube
    for lo in (100_000, 200_000):
        write_delta(_orders(spark, 50).coalesce(1), t)
        delta_optimize(spark, t, target_files=2)
    snap = delta_snapshot(spark, t)
    assert len({
        (snap.adds[r]["tags"] or {})[ZCUBE_ID_TAG] for r, _ in snap.files
    }) == 3
    # a fresh append + consolidating OPTIMIZE: threshold above the small
    # cubes but below the big one -> small cubes + new files rewrite
    # together, big cube untouched
    write_delta(_orders(spark, 50).coalesce(1), t)
    delta_optimize(spark, t, target_files=2, min_cube_bytes=big_bytes // 2)
    snap = delta_snapshot(spark, t)
    live = _live(spark, t)
    assert big <= live  # big cube untouched
    others = live - big
    zids = {(snap.adds[r]["tags"] or {})[ZCUBE_ID_TAG] for r in others}
    assert len(zids) == 1  # small cubes + append coalesced into ONE
    assert read_delta(spark, t).count() == 4000 + 150


def test_incremental_recluster_preserves_row_ids(spark, tmp_path):
    """Clustered + row-tracking table: the incremental recluster's
    output files carry BOTH the ZCube stamp and materialized row ids —
    ids survive the rewrite, stamps gate the next run."""
    from pos_dlt_spark.sources.delta_clustering import PROVIDER_TAG
    from pos_dlt_spark.sources.delta_rowtracking import read_delta_with_row_ids

    t = str(tmp_path / "c")
    write_delta(
        _orders(spark, 2000).repartition(4), t,
        cluster_by=["v"],
        configuration={"delta.enableRowTracking": "true"},
    )
    ids0 = {
        r.k: r._row_id for r in read_delta_with_row_ids(spark, t).collect()
    }
    delta_optimize(spark, t, target_files=2)
    snap = delta_snapshot(spark, t)
    assert all(
        (snap.adds[r].get("tags") or {}).get(PROVIDER_TAG) == "liquid"
        for r, _ in snap.files
    )
    ids1 = {
        r.k: r._row_id for r in read_delta_with_row_ids(spark, t).collect()
    }
    assert ids1 == ids0  # rewrite preserved every id
    cube = _live(spark, t)
    write_delta(_orders(spark, 100).coalesce(1), t)
    delta_optimize(spark, t, target_files=2)
    assert cube <= _live(spark, t)  # stamps still gate the next run
