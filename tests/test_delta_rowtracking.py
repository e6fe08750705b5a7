"""ROW TRACKING (protocol writer feature, VERDICT r06 #2): fresh row-id
assignment via add.baseRowId + the domainMetadata high watermark, reads
resolving ``coalesce(materialized, baseRowId + row_index)``, and id
PRESERVATION across every rewriting DML — OPTIMIZE, UPDATE, DELETE
(rewrite), REORG PURGE, MERGE — plus checkpoint survival of the
watermark and per-file bases."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
from pos_dlt_spark.sources.delta_rowtracking import (
    MAT_ROW_ID_PROP,
    MAT_ROW_VER_PROP,
    ROW_TRACKING_DOMAIN,
    read_delta_with_row_ids,
    row_id_high_water_mark,
)
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_merge,
    delta_optimize,
    delta_reorg_purge,
    delta_update,
    write_delta,
)

RT_CONF = {"delta.enableRowTracking": "true"}


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _ids(spark, table):
    return {
        r.id: (r._row_id, r._row_commit_version)
        for r in read_delta_with_row_ids(spark, table).collect()
    }


def test_fresh_ids_and_watermark(spark, tmp_path):
    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 10).repartition(2), table, configuration=RT_CONF)
    write_delta(_df(spark, 10, 15).repartition(1), table)
    snap = delta_snapshot(spark, table)
    wf = set(snap.protocol.get("writerFeatures") or ())
    assert {"rowTracking", "domainMetadata"} <= wf
    assert "readerFeatures" not in snap.protocol  # writer-only features
    assert row_id_high_water_mark(snap) == 14
    # per-file bases are disjoint, cover [0, hwm], versions stamped
    spans = []
    for rel, _ in snap.files:
        a = snap.adds[rel]
        n = json.loads(a["stats"])["numRecords"]
        spans.append((a["baseRowId"], a["baseRowId"] + n - 1))
        assert a["defaultRowCommitVersion"] in (0, 1)
    spans.sort()
    assert spans[0][0] == 0 and spans[-1][1] == 14
    assert all(spans[i][1] < spans[i + 1][0] + 1 for i in range(len(spans) - 1))
    got = _ids(spark, table)
    assert sorted(rid for rid, _ in got.values()) == list(range(15))
    # materialized column names minted at creation
    assert snap.configuration.get(MAT_ROW_ID_PROP)
    assert snap.configuration.get(MAT_ROW_VER_PROP)
    # plain reads see the table schema only
    assert set(read_delta(spark, table).columns) == {"id", "name"}


def test_dv_delete_keeps_ids_stable(spark, tmp_path):
    table = str(tmp_path / "rtdv")
    write_delta(_df(spark, 0, 12).repartition(2), table, configuration=RT_CONF)
    before = _ids(spark, table)
    delta_delete(spark, table, "id % 3 = 0", mode="dv")
    after = _ids(spark, table)
    assert set(after) == {i for i in range(12) if i % 3}
    assert all(after[k] == before[k] for k in after)


def test_optimize_preserves_ids_via_materialized_columns(spark, tmp_path):
    table = str(tmp_path / "rtopt")
    write_delta(_df(spark, 0, 10).repartition(3), table, configuration=RT_CONF)
    delta_delete(spark, table, "id = 4", mode="dv")
    before = _ids(spark, table)
    hwm0 = row_id_high_water_mark(delta_snapshot(spark, table))
    delta_optimize(spark, table, target_files=1)
    snap = delta_snapshot(spark, table)
    assert len(snap.files) == 1
    after = _ids(spark, table)
    assert after == before  # ids AND commit versions survive the rewrite
    # the compacted file still got a fresh base (materialized wins on read)
    assert row_id_high_water_mark(snap) > hwm0
    # the materialized column physically exists in the rewritten file
    rel = snap.files[0][0]
    import pyarrow.parquet as pq

    names = set(pq.read_schema(os.path.join(table, rel)).names)
    assert snap.configuration[MAT_ROW_ID_PROP] in names
    assert snap.configuration[MAT_ROW_VER_PROP] in names


def test_update_preserves_ids_bumps_version(spark, tmp_path):
    table = str(tmp_path / "rtupd")
    write_delta(_df(spark, 0, 10).repartition(2), table, configuration=RT_CONF)
    before = _ids(spark, table)
    v, n = delta_update(spark, table, "id < 3", {"name": "concat(name, '-u')"})
    assert n == 3
    after = _ids(spark, table)
    for k, (rid, rvr) in after.items():
        assert rid == before[k][0]
        assert rvr == (v if k < 3 else before[k][1])


def test_delete_rewrite_and_purge_preserve_ids(spark, tmp_path):
    table = str(tmp_path / "rtdel")
    write_delta(_df(spark, 0, 12).repartition(2), table, configuration=RT_CONF)
    before = _ids(spark, table)
    delta_delete(spark, table, "id >= 10", mode="rewrite")
    mid = _ids(spark, table)
    assert mid == {k: v for k, v in before.items() if k < 10}
    delta_delete(spark, table, "id = 1", mode="dv")
    delta_reorg_purge(spark, table)
    snap = delta_snapshot(spark, table)
    assert not any(a.get("deletionVector") for a in snap.adds.values())
    after = _ids(spark, table)
    assert after == {k: v for k, v in mid.items() if k != 1}


def test_merge_id_semantics(spark, tmp_path):
    """Carried rows keep id+version; an UPDATE winning an existing key
    keeps the OLD id with the merge's commit version; inserts take fresh
    ids above the prior watermark; tombstoned keys retire."""
    import pandas as pd

    table = str(tmp_path / "rtmerge")
    write_delta(
        spark.createDataFrame(
            pd.DataFrame({"k": [1, 2, 3], "seq": [1, 1, 1], "v": ["a", "b", "c"]})
        ).repartition(1),
        table,
        configuration=RT_CONF,
    )
    before = {
        r.k: (r._row_id, r._row_commit_version)
        for r in read_delta_with_row_ids(spark, table).collect()
    }
    hwm0 = row_id_high_water_mark(delta_snapshot(spark, table))
    batch = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [2, 3, 9],
                "seq": [9, 9, 9],
                "v": [None, "C", "i"],
                "op": ["DELETE", "UPSERT", "UPSERT"],
            }
        )
    )
    v = delta_merge(
        spark, table, batch, keys=["k"], sequence_by="seq",
        delete_predicate="op = 'DELETE'",
    )
    after = {
        r.k: (r._row_id, r._row_commit_version, r.v)
        for r in read_delta_with_row_ids(spark, table).collect()
    }
    assert set(after) == {1, 3, 9}
    assert after[1][:2] == before[1]                      # carried
    assert after[3][0] == before[3][0] and after[3][1] == v  # updated: old id, new ver
    assert after[9][0] > hwm0 and after[9][1] == v        # insert: fresh id
    assert after[3][2] == "C" and after[9][2] == "i"


def test_checkpoint_survives_watermark_and_bases(spark, tmp_path):
    table = str(tmp_path / "rtckpt")
    write_delta(_df(spark, 0, 6).repartition(1), table, configuration=RT_CONF)
    before = _ids(spark, table)
    for i in range(2):
        write_delta(
            _df(spark, 6 + 3 * i, 9 + 3 * i).repartition(1),
            table,
            checkpoint_interval=2,
        )
    log = os.path.join(table, "_delta_log")
    assert os.path.exists(os.path.join(log, f"{2:020d}.checkpoint.parquet"))
    for v in range(2):  # force the fold onto the checkpoint
        os.remove(os.path.join(log, f"{v:020d}.json"))
    snap = delta_snapshot(spark, table)
    assert snap.domain_metadata.get(ROW_TRACKING_DOMAIN)
    assert row_id_high_water_mark(snap) == 11
    after = _ids(spark, table)
    assert all(after[k] == before[k] for k in before)
    assert sorted(rid for rid, _ in after.values()) == list(range(12))


def test_retry_restamps_base_ids(spark, tmp_path, monkeypatch):
    """A lost commit race must re-stamp baseRowId against the FRESH
    watermark — ids are pure metadata, so no restaging is needed, but a
    stale base would collide with the concurrent writer's range."""
    import pos_dlt_spark.sources.delta_writer as dw

    table = str(tmp_path / "rtrace")
    write_delta(_df(spark, 0, 4).repartition(1), table, configuration=RT_CONF)
    real = dw._try_commit
    state = {"raced": False}

    def flaky(log_dir, version, actions, **kw):
        if not state["raced"]:
            state["raced"] = True
            # a concurrent writer lands 6 rows at this version first
            write_delta(_df(spark, 100, 106).repartition(1), table)
            return False
        return real(log_dir, version, actions)

    monkeypatch.setattr(dw, "_try_commit", flaky)
    write_delta(_df(spark, 10, 13).repartition(1), table)
    monkeypatch.setattr(dw, "_try_commit", real)
    got = _ids(spark, table)
    ids = sorted(rid for rid, _ in got.values())
    assert ids == list(range(13))  # 4 + 6 + 3, no collision, no gap
    assert row_id_high_water_mark(delta_snapshot(spark, table)) == 12


def test_row_tracking_refused_without_feature(spark, tmp_path):
    from pos_dlt_spark.sources.delta import DeltaProtocolError

    table = str(tmp_path / "plain")
    write_delta(_df(spark, 0, 3), table)
    with pytest.raises(DeltaProtocolError, match="rowTracking"):
        read_delta_with_row_ids(spark, table)


def test_fsck_row_tracking_invariants(spark, tmp_path):
    from pos_dlt_spark.sources.delta_check import delta_fsck
    from pos_dlt_spark.sources import delta_fixture as fx

    table = str(tmp_path / "rtfsck")
    write_delta(_df(spark, 0, 10).repartition(2), table, configuration=RT_CONF)
    delta_optimize(spark, table, target_files=1)
    assert delta_fsck(spark, table) == []
    # corrupt: drop the watermark below the live max
    fx.write_commit(
        table, delta_snapshot(spark, table).version + 1,
        [fx.domain_metadata_action(
            ROW_TRACKING_DOMAIN, '{"rowIdHighWaterMark": 3}'
        )],
    )
    codes = {c for _s, c, _m in delta_fsck(spark, table)}
    assert "rowtracking" in codes


# -- merge-on-read CDF (write_change_files=False) -----------------------------

CDF_RT_CONF = {
    "delta.enableRowTracking": "true",
    "delta.enableChangeDataFeed": "true",
}


def _changes(spark, table, start=1):
    from pos_dlt_spark.sources.delta_cdf import read_change_feed

    return sorted(
        (r._commit_version, r._change_type, r.id, r.name)
        for r in read_change_feed(spark, table, start_version=start).collect()
    )


def test_merge_on_read_update_matches_explicit_change_files(spark, tmp_path):
    """The derived change set of write_change_files=False must equal the
    explicit change files of the same UPDATE on a twin table."""
    ta, tb = str(tmp_path / "a"), str(tmp_path / "b")
    for t in (ta, tb):
        write_delta(_df(spark, 0, 40).repartition(2), t, configuration=CDF_RT_CONF)
    delta_update(spark, ta, "id % 4 = 1", {"name": "concat(name, '!')"})
    delta_update(
        spark, tb, "id % 4 = 1", {"name": "concat(name, '!')"},
        write_change_files=False,
    )
    assert _changes(spark, ta) == _changes(spark, tb)
    # and the derived table really wrote NO change files
    assert not os.path.exists(os.path.join(tb, "_change_data"))


def test_merge_on_read_carried_rows_contribute_nothing(spark, tmp_path):
    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 30).coalesce(1), table, configuration=CDF_RT_CONF)
    delta_update(
        spark, table, "id = 7", {"name": "'seven'"}, write_change_files=False
    )
    got = _changes(spark, table)
    assert got == [
        (1, "update_postimage", 7, "seven"),
        (1, "update_preimage", 7, "n7"),
    ]


def test_merge_on_read_merge_with_inserts_and_tombstones(spark, tmp_path):
    """MERGE without change files: updated keys derive update pairs,
    brand-new keys derive inserts, tombstoned keys derive deletes —
    carried rows nothing."""
    table = str(tmp_path / "rt")
    write_delta(
        spark.range(0, 20).select(
            F.col("id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
            F.lit(0).cast("long").alias("seq"),
            F.lit(False).alias("gone"),
        ).coalesce(1),
        table,
        configuration=CDF_RT_CONF,
    )
    upd = spark.createDataFrame(
        [(3, "three", 1, False), (25, "new25", 1, False), (8, "n8", 1, True)],
        "id long, name string, seq long, gone boolean",
    )
    delta_merge(
        spark, table, upd, ["id"], "seq",
        delete_predicate="gone", write_change_files=False,
    )
    got = sorted(
        (r._change_type, r.id, r.name)
        for r in __import__(
            "pos_dlt_spark.sources.delta_cdf", fromlist=["read_change_feed"]
        ).read_change_feed(spark, table, start_version=1).collect()
    )
    assert got == [
        ("delete", 8, "n8"),
        ("insert", 25, "new25"),
        ("update_postimage", 3, "three"),
        ("update_preimage", 3, "n3"),
    ]
    assert not os.path.exists(os.path.join(table, "_change_data"))


def test_merge_on_read_refused_without_row_tracking(spark, tmp_path):
    table = str(tmp_path / "plain")
    write_delta(
        _df(spark, 0, 10).coalesce(1), table,
        configuration={"delta.enableChangeDataFeed": "true"},
    )
    with pytest.raises(ValueError, match="needs row tracking"):
        delta_update(
            spark, table, "id = 1", {"name": "'x'"}, write_change_files=False
        )


def test_rewrite_delete_derives_minimal_changes(spark, tmp_path):
    """DELETE mode='rewrite' on an rt table WITHOUT CDF enabled: the
    protocol derivation now reports only the deleted rows (old-only row
    ids), not whole-file delete+insert noise."""
    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 12).coalesce(1), table, configuration=RT_CONF)
    delta_delete(spark, table, "id >= 10", mode="rewrite")
    got = _changes(spark, table)
    assert got == [
        (1, "delete", 10, "n10"),
        (1, "delete", 11, "n11"),
    ]


def test_restore_preserves_high_watermark_no_id_reuse(spark, tmp_path):
    """RESTORE re-points the live set at an OLD version but must NOT
    regress the rowIdHighWaterMark (it lives in domainMetadata, which
    restore leaves untouched): ids assigned after the restore must not
    collide with ids the restored-away commit had used."""
    from pos_dlt_spark.sources.delta_writer import delta_restore

    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 10).coalesce(1), table, configuration=RT_CONF)  # ids 0-9
    write_delta(_df(spark, 10, 25).coalesce(1), table)  # ids 10-24
    delta_restore(spark, table, version=0)
    snap = delta_snapshot(spark, table)
    assert row_id_high_water_mark(snap) == 24  # NOT regressed to 9
    write_delta(_df(spark, 100, 105).coalesce(1), table)  # fresh ids
    got = _ids(spark, table)
    assert sorted(got) == list(range(10)) + list(range(100, 105))
    ids = sorted(rid for rid, _ in got.values())
    assert ids == list(range(10)) + list(range(25, 30))  # no reuse of 10-24


# --- ADVICE r07: enablement path + guard fixes --------------------------


def test_set_properties_refuses_row_tracking_props(spark, tmp_path):
    """Bare SET TBLPROPERTIES of delta.enableRowTracking (or the
    materialized-column props) would land the table half-enabled — every
    later DML raising; the props are structural (ADVICE r07 #1)."""
    from pos_dlt_spark.sources.delta_writer import delta_set_properties

    table = str(tmp_path / "t")
    write_delta(_df(spark, 0, 5).coalesce(1), table)
    with pytest.raises(ValueError, match="delta_enable_row_tracking"):
        delta_set_properties(spark, table, {"delta.enableRowTracking": "true"})
    with pytest.raises(ValueError, match="delta_enable_row_tracking"):
        delta_set_properties(spark, table, {MAT_ROW_ID_PROP: "bogus"})


def test_enable_row_tracking_backfills_existing_table(spark, tmp_path):
    """delta_enable_row_tracking on a plain table: one commit declares
    the features, mints the materialized columns, backfills baseRowId on
    every live file from footer numRecords (no data rewrite), and every
    later DML preserves the assigned ids."""
    from pos_dlt_spark.sources.delta_writer import delta_enable_row_tracking

    table = str(tmp_path / "t")
    write_delta(_df(spark, 0, 10).repartition(2), table)
    write_delta(_df(spark, 10, 15).coalesce(1), table)
    data_files_before = sorted(
        os.path.relpath(os.path.join(dp, n), table)
        for dp, _, ns in os.walk(table)
        for n in ns
        if n.endswith(".parquet") and "_delta_log" not in dp
    )
    v = delta_enable_row_tracking(spark, table)
    snap = delta_snapshot(spark, table)
    assert v == snap.version
    assert {"rowTracking", "domainMetadata"} <= set(
        snap.protocol.get("writerFeatures") or ()
    )
    assert snap.configuration.get(MAT_ROW_ID_PROP)
    assert row_id_high_water_mark(snap) == 14
    # metadata-only: no data file was rewritten
    data_files_after = sorted(
        os.path.relpath(os.path.join(dp, n), table)
        for dp, _, ns in os.walk(table)
        for n in ns
        if n.endswith(".parquet") and "_delta_log" not in dp
    )
    assert data_files_after == data_files_before
    ids0 = _ids(spark, table)
    assert sorted(ids0) == list(range(15))
    assert sorted(rid for rid, _ in ids0.values()) == list(range(15))
    # ids survive a rewrite DML after enablement
    delta_update(spark, table, "id = 3", {"name": "'patched'"})
    ids1 = _ids(spark, table)
    assert {k: v[0] for k, v in ids1.items()} == {
        k: v[0] for k, v in ids0.items()
    }
    # idempotent
    assert delta_enable_row_tracking(spark, table) == snap.version + 1


def test_cm_plus_row_tracking_refused_at_creation(spark, tmp_path):
    """The unsupported cm+rowTracking pairing is rejected BEFORE data
    exists, not at the first DML (ADVICE r07 #4)."""
    from pos_dlt_spark.sources.delta_writer import (
        delta_create_table,
        delta_enable_column_mapping,
        delta_enable_row_tracking,
    )

    both = {
        "delta.columnMapping.mode": "name",
        "delta.enableRowTracking": "true",
    }
    with pytest.raises(ValueError, match="not supported"):
        write_delta(_df(spark, 0, 3), str(tmp_path / "a"), configuration=both)
    with pytest.raises(ValueError, match="not supported"):
        delta_create_table(
            spark, str(tmp_path / "b"), _df(spark, 0, 1).schema,
            configuration=both,
        )
    # ... and the two upgrade paths refuse crossing into the pairing
    rt_table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 3).coalesce(1), rt_table, configuration=RT_CONF)
    with pytest.raises(ValueError, match="row-tracking"):
        delta_enable_column_mapping(spark, rt_table)
    cm_table = str(tmp_path / "cm")
    write_delta(
        _df(spark, 0, 3).coalesce(1), cm_table,
        configuration={"delta.columnMapping.mode": "name"},
    )
    with pytest.raises(ValueError, match="column-mapped"):
        delta_enable_row_tracking(spark, cm_table)


def test_row_id_scan_broadcast_branch(spark, tmp_path, monkeypatch):
    """Past DV_FID_MAP_MAX entries the id resolution switches to the
    broadcast-join ladder (raw join -> decoded join -> loud miss); force
    the branch and check ids are identical to the literal-map path."""
    import pos_dlt_spark.sources.delta as d

    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 20).repartition(3), table, configuration=RT_CONF)
    want = _ids(spark, table)
    monkeypatch.setattr(d, "DV_FID_MAP_MAX", 0)
    assert _ids(spark, table) == want


def test_merge_on_read_cost_guardrail_warns(spark, tmp_path, monkeypatch):
    """Reading a derived (write_change_files=False) feed past the
    per-commit row threshold warns, steering feed-hot tables back to
    explicit change files (VERDICT r07 #8); under it, silence."""
    import warnings

    from pos_dlt_spark.sources import delta_cdf as cdf

    table = str(tmp_path / "rt")
    write_delta(_df(spark, 0, 30).coalesce(1), table, configuration=CDF_RT_CONF)
    delta_update(
        spark, table, "id = 7", {"name": "'seven'"}, write_change_files=False
    )
    monkeypatch.setattr(cdf, "MOR_CDF_WARN_ROWS", 10)
    with pytest.warns(UserWarning, match="merge-on-read CDF derivation"):
        _changes(spark, table)
    monkeypatch.setattr(cdf, "MOR_CDF_WARN_ROWS", 10_000_000)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _changes(spark, table)


def test_clone_preserves_row_id_watermark_and_clustering(spark, tmp_path):
    """CLONE must carry domainMetadata: dropping delta.rowTracking would
    reset the clone's watermark to -1 while the copied adds keep their
    baseRowIds — the first append would mint COLLIDING ids; dropping
    delta.clustering would silently un-cluster the clone."""
    from pos_dlt_spark.sources.delta_clustering import clustering_columns
    from pos_dlt_spark.sources.delta_writer import delta_clone

    src = str(tmp_path / "src")
    write_delta(_df(spark, 0, 10).coalesce(1), src, configuration=RT_CONF)
    dst = str(tmp_path / "dst")
    delta_clone(spark, src, dst)
    snap = delta_snapshot(spark, dst)
    assert row_id_high_water_mark(snap) == 9
    write_delta(_df(spark, 10, 15).coalesce(1), dst)
    got = _ids(spark, dst)
    ids = sorted(rid for rid, _ in got.values())
    assert ids == list(range(15))  # no collisions: appended ids start at 10
    # clustering domain survives too
    csrc = str(tmp_path / "csrc")
    write_delta(
        spark.range(100).selectExpr("id k", "id*7 % 13 v").repartition(2),
        csrc, cluster_by=["v"],
    )
    cdst = str(tmp_path / "cdst")
    delta_clone(spark, csrc, cdst)
    assert clustering_columns(delta_snapshot(spark, cdst)) == ["v"]
