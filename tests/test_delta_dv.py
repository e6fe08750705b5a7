"""Deletion vectors (sources/dv.py + reader/writer integration), built
from the public Delta PROTOCOL.md DV spec and the public RoaringFormatSpec:
codec round-trips (array/bitmap/run containers, z85, file layout + CRC),
DELETE-via-DV end to end, DV-aware MERGE/OPTIMIZE(PURGE)/VACUUM, and the
loud failure modes (corrupt payloads, streaming replay of row deletes)."""

from __future__ import annotations

import os
import struct

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources import dv as DV
from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
)
from pos_dlt_spark.sources.delta_writer import delta_delete, write_delta


# -- codec ------------------------------------------------------------------


def test_z85_roundtrip():
    for data in (b"", b"\x00" * 4, b"helloworld!!", os.urandom(40)):
        assert DV.z85_decode(DV.z85_encode(data)) == data
    with pytest.raises(DV.DeletionVectorError):
        DV.z85_encode(b"abc")  # not 4-aligned
    with pytest.raises(DV.DeletionVectorError):
        DV.z85_decode("~~~~~")  # ~ not in the Z85 alphabet


def test_roaring_bitmap_roundtrip_array_and_bitmap_containers():
    # array container (<=4096), bitmap container (>4096), multiple
    # 16-bit keys, and a >32-bit index forcing a second 32-bit bitmap
    cases = [
        [],
        [0],
        [1, 5, 7, 65535, 65536, 131072 + 9],
        list(range(5000)),                      # bitmap container
        list(range(0, 200000, 3)),              # several containers
        [3, (1 << 32) + 4, (1 << 33) + 10],     # multiple high keys
    ]
    for idx in cases:
        assert DV.decode_dv_bitmap(DV.encode_dv_bitmap(idx)) == sorted(set(idx))


def test_roaring_run_container_decodes():
    """The decoder must understand run containers (real writers emit
    them) even though our encoder never produces them: hand-build a
    portable bitmap with the 12347 cookie + one run container."""
    # one container, key=0, cardinality 11 (rows 5..15), run flag set
    buf = struct.pack("<I", (0 << 16) | 12347)      # cookie: n-1=0 | SERIAL_COOKIE
    buf += b"\x01"                                   # run-flag bitset: container 0 is runs
    buf += struct.pack("<HH", 0, 10)                 # key 0, cardinality-1
    buf += struct.pack("<H", 1)                      # 1 run
    buf += struct.pack("<HH", 5, 10)                 # start 5, length 10 -> 5..15
    data = struct.pack("<iq", 1681511377, 1) + buf
    assert DV.decode_dv_bitmap(data) == list(range(5, 16))


def test_cardinality_runs_membership_views_agree():
    """The three non-materializing views (header cardinality, run
    rendering, vectorized membership) must agree with the full decode on
    every container kind."""
    import numpy as np

    cases = [
        [],
        [0],
        [5, 6, 7, 100, 65535, 65536, 65537],
        list(range(5000)),                      # bitmap container
        list(range(0, 200000, 3)),              # scattered across containers
        [3, (1 << 32) + 4, (1 << 33) + 10],     # multiple high keys
        list(range(1000, 1500)) + list(range(70000, 70010)),
    ]
    for idx in cases:
        data = DV.encode_dv_bitmap(idx)
        want = sorted(set(idx))
        assert DV.bitmap_cardinality(data) == len(want)
        runs = DV.decode_dv_runs(data)
        flat = [i for lo, hi in runs for i in range(lo, hi + 1)]
        assert flat == want
        # runs are maximal: no two adjacent runs touch
        assert all(runs[i + 1][0] > runs[i][1] + 1 for i in range(len(runs) - 1))
        m = DV.DvMembership(data)
        probe = np.array(
            sorted(set(want) | {0, 1, 2, 65535, 65536, (1 << 32) + 4, 10**9}),
            dtype=np.int64,
        )
        got = m.contains(probe)
        assert [int(p) for p, g in zip(probe, got) if g] == [
            p for p in probe if int(p) in set(want)
        ]


def test_numpy_codec_matches_python_codec():
    """The vectorized encoder/decoder (executor-side DELETE path) must
    agree bit-for-bit / value-for-value with the per-value codec."""
    import numpy as np

    cases = [
        [],
        [0, 1, 2],
        list(range(5000)),
        list(range(0, 200000, 3)),
        [3, (1 << 32) + 4, (1 << 33) + 10],
    ]
    for idx in cases:
        py_bytes = DV.encode_dv_bitmap(idx)
        np_bytes = DV.encode_dv_bitmap_np(np.array(idx, dtype=np.int64))
        assert np_bytes == py_bytes  # identical serialization
        arr = DV.decode_dv_numpy(py_bytes)
        assert list(arr) == sorted(set(idx))
    # run containers decode through the numpy path too
    import struct as _s

    buf = _s.pack("<I", (0 << 16) | 12347)
    buf += b"\x01" + _s.pack("<HH", 0, 10) + _s.pack("<H", 1) + _s.pack("<HH", 5, 10)
    data = _s.pack("<iq", 1681511377, 1) + buf
    assert list(DV.decode_dv_numpy(data)) == list(range(5, 16))


def test_run_container_views():
    """Run containers (real writers emit them; our encoder doesn't) must
    flow through cardinality/runs/membership too."""
    import numpy as np

    buf = struct.pack("<I", (0 << 16) | 12347)
    buf += b"\x01"
    buf += struct.pack("<HH", 0, 10)
    buf += struct.pack("<H", 1)
    buf += struct.pack("<HH", 5, 10)  # rows 5..15
    data = struct.pack("<iq", 1681511377, 1) + buf
    assert DV.bitmap_cardinality(data) == 11
    assert DV.decode_dv_runs(data) == [(5, 15)]
    m = DV.DvMembership(data)
    assert list(m.contains(np.array([4, 5, 15, 16], dtype=np.int64))) == [
        False, True, True, False,
    ]


def test_membership_path_matches_run_join_path(spark, tmp_path, monkeypatch):
    """Forcing the executor-side membership path (as a huge scattered DV
    would) must produce exactly the rows the JVM run-join path does."""
    from pos_dlt_spark.sources import delta as D

    table = str(tmp_path / "dvmem")
    write_delta(_df(spark, 0, 2000).coalesce(2), table)
    delta_delete(spark, table, "id % 7 = 0")
    want = sorted(r.id for r in read_delta(spark, table).collect())
    monkeypatch.setattr(D, "DV_RUN_JOIN_MAX", 0)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == want == [i for i in range(2000) if i % 7 != 0]


def test_mixed_per_file_path_selection(spark, tmp_path, monkeypatch):
    """A budget that fits one file's clustered DV but not its scattered
    neighbour must keep the first on the JVM anti-join and probe ONLY
    the second — per-file selection, not all-or-nothing — with results
    identical to the unconstrained read."""
    from pos_dlt_spark.sources import delta as D

    table = str(tmp_path / "dvmix")
    # file A: ids 0..1999 (partition col splits files deterministically)
    df = _df(spark, 0, 4000).withColumn("pk", (F.col("id") / 2000).cast("int"))
    write_delta(df.repartition("pk"), table, partition_by=["pk"])
    # clustered deletes on A (one run), scattered on B (every 2nd row)
    delta_delete(spark, table, "pk = 0 AND id < 100")
    delta_delete(spark, table, "pk = 1 AND id % 2 = 0")
    want = sorted(r.id for r in read_delta(spark, table).collect())
    assert want == [i for i in range(100, 2000)] + [
        i for i in range(2000, 4000) if i % 2 == 1
    ]
    calls = []
    orig = DV.decode_dv_runs

    def spy(data, max_runs=None):
        out = orig(data, max_runs=max_runs)
        calls.append(out is None)
        return out

    monkeypatch.setattr(DV, "decode_dv_runs", spy)
    monkeypatch.setattr(D, "DV_RUN_JOIN_MAX", 16)  # fits 1 run, not 1000
    out = read_delta(spark, table)
    got = sorted(r.id for r in out.collect())
    assert got == want
    # the clustered file decoded within budget; the scattered aborted
    assert sorted(calls) == [False, True]
    # and the plan carries BOTH legs: a probe udf and a JVM anti-join
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan and "LeftAnti" in plan


def test_bucketed_run_join_many_runs_stays_jvm(spark, tmp_path):
    """A many-run DV inside the budget applies as the bucketed JVM
    anti-join — the executed plan carries no Python node at all."""
    table = str(tmp_path / "dvruns")
    write_delta(_df(spark, 0, 3000).coalesce(1), table)
    delta_delete(spark, table, "id % 3 = 0")  # 1000 single-row runs
    out = read_delta(spark, table)
    got = sorted(r.id for r in out.collect())
    assert got == [i for i in range(3000) if i % 3 != 0]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BroadcastHashJoin" in plan


def test_dv_file_layout_and_checksum(tmp_path):
    data = DV.encode_dv_bitmap([1, 2, 3])
    p = str(tmp_path / "dv.bin")
    entries = DV.write_dv_file(p, [data, DV.encode_dv_bitmap([7])])
    assert entries[0][0] == 1  # version byte precedes the first entry
    desc = {
        "storageType": "p",
        "pathOrInlineDv": p,
        "offset": entries[1][0],
        "sizeInBytes": entries[1][1],
        "cardinality": 1,
    }
    assert DV.read_dv_descriptor(str(tmp_path), desc) == [7]
    # corrupt one byte of the second bitmap -> checksum failure, loud
    with open(p, "r+b") as fh:
        fh.seek(entries[1][0] + 4)
        b = fh.read(1)
        fh.seek(entries[1][0] + 4)
        fh.write(bytes([b[0] ^ 0xFF]))
    with pytest.raises(DV.DeletionVectorError, match="checksum"):
        DV.read_dv_descriptor(str(tmp_path), desc)


def test_unknown_storage_type_fails_loudly(tmp_path):
    with pytest.raises(DV.DeletionVectorError, match="storageType"):
        DV.read_dv_descriptor(str(tmp_path), {"storageType": "x", "sizeInBytes": 1})


# -- end-to-end -------------------------------------------------------------


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def test_delete_dv_mode_inline(spark, tmp_path):
    table = str(tmp_path / "dvi")
    write_delta(_df(spark, 0, 100).coalesce(2), table)
    v, n = delta_delete(spark, table, "id % 10 = 0")
    assert v == 1 and n == 10
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [i for i in range(100) if i % 10 != 0]
    # NO data file was rewritten: the same physical files are live
    snap = delta_snapshot(spark, table)
    assert all(a.get("deletionVector") for a in snap.adds.values())
    assert all(
        a["deletionVector"]["storageType"] == "i" for a in snap.adds.values()
    )
    # time travel to before the delete still sees every row
    assert read_delta(spark, table, version=0).count() == 100
    # a second delete UNIONS into the existing DVs
    v2, n2 = delta_delete(spark, table, "id % 10 = 5")
    assert v2 == 2 and n2 == 10
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == [i for i in range(100) if i % 10 not in (0, 5)]
    # deleting already-dead rows is a no-op on the live count
    v3, n3 = delta_delete(spark, table, "id % 10 = 0")
    assert n3 == 0
    assert read_delta(spark, table).count() == 80


def test_delete_dv_mode_sidecar_file(spark, tmp_path):
    table = str(tmp_path / "dvf")
    write_delta(_df(spark, 0, 5000).coalesce(1), table)
    v, n = delta_delete(spark, table, "id < 3000", inline_threshold=64)
    assert n == 3000
    snap = delta_snapshot(spark, table)
    (add,) = snap.adds.values()
    assert add["deletionVector"]["storageType"] == "u"
    rel = DV.dv_relative_path(add["deletionVector"])
    assert rel and os.path.exists(os.path.join(table, rel))
    assert sorted(r.id for r in read_delta(spark, table).collect()) == list(
        range(3000, 5000)
    )


def test_delete_rewrite_mode(spark, tmp_path):
    table = str(tmp_path / "dvr")
    write_delta(_df(spark, 0, 100).coalesce(1), table)
    write_delta(_df(spark, 1000, 1100).coalesce(1), table)
    v, n = delta_delete(spark, table, "id >= 1050", mode="rewrite")
    assert n == 50
    snap = delta_snapshot(spark, table)
    assert not any(a.get("deletionVector") for a in snap.adds.values())
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == list(range(100)) + list(range(1000, 1050))
    # only the file containing matches was rewritten (2 files -> 2 files)
    assert len(snap.files) == 2


def test_delete_dv_on_partitioned_table(spark, tmp_path):
    table = str(tmp_path / "dvp")
    df = spark.range(40).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("b")
    )
    write_delta(df, table, partition_by=["b"])
    v, n = delta_delete(spark, table, "b = 2 AND id < 20")
    assert n == 5  # ids 2,6,10,14,18
    got = {(r.id, r.b) for r in read_delta(spark, table).collect()}
    assert got == {(i, i % 4) for i in range(40) if not (i % 4 == 2 and i < 20)}


def test_merge_applies_dv_on_touched_files(spark, tmp_path):
    """A merge that touches a DV'd file must not resurrect deleted rows."""
    import pandas as pd

    from pos_dlt_spark.sources.delta_writer import delta_merge

    table = str(tmp_path / "dvm")
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 4], "seq": [1] * 4, "v": ["a", "b", "c", "d"]})
    ).coalesce(1)
    write_delta(base, table)
    delta_delete(spark, table, "k = 2")
    upd = spark.createDataFrame(pd.DataFrame({"k": [3], "seq": [9], "v": ["c9"]}))
    delta_merge(spark, table, upd, keys=["k"], sequence_by="seq")
    got = {r.k: r.v for r in read_delta(spark, table).collect()}
    assert got == {1: "a", 3: "c9", 4: "d"}  # k=2 stays deleted


def test_optimize_purges_dvs_and_vacuum_collects_sidecars(spark, tmp_path):
    from pos_dlt_spark.sources.delta import replay_adds
    from pos_dlt_spark.sources.delta_writer import delta_optimize, delta_vacuum

    table = str(tmp_path / "dvo")
    write_delta(_df(spark, 0, 5000).coalesce(1), table)
    delta_delete(spark, table, "id < 1000", inline_threshold=8)  # sidecar DV
    snap = delta_snapshot(spark, table)
    (add,) = snap.adds.values()
    sidecar = DV.dv_relative_path(add["deletionVector"])
    assert os.path.exists(os.path.join(table, sidecar))

    # streaming replay refuses the row-delete commit, loudly
    with pytest.raises(DeltaProtocolError, match="deletion vector"):
        replay_adds(spark, table)

    v = delta_optimize(spark, table, target_files=1)
    snap2 = delta_snapshot(spark, table)
    assert not any(a.get("deletionVector") for a in snap2.adds.values())
    assert read_delta(spark, table).count() == 4000
    deleted = delta_vacuum(spark, table, retain_versions=0)
    assert sidecar in deleted  # the orphaned DV sidecar is collected
    assert read_delta(spark, table).count() == 4000


def test_checkpoint_preserves_dvs_and_protocol(spark, tmp_path):
    """A checkpoint written AFTER a DV-mode delete must carry the DV
    descriptors (and the declared deletionVectors feature) — dropping
    either resurrects the deleted rows for every post-checkpoint
    snapshot, and after log cleanup, for ALL snapshots."""
    from pos_dlt_spark.sources.delta_writer import delta_log_cleanup

    for fmt in ("classic", "v2"):
        table = str(tmp_path / f"dvc_{fmt}")
        write_delta(_df(spark, 0, 100).coalesce(1), table)
        delta_delete(spark, table, "id % 10 = 0")  # v1: DV delete
        # v2: append that crosses the checkpoint interval
        write_delta(
            _df(spark, 100, 110).coalesce(1),
            table,
            checkpoint_interval=2,
            checkpoint_format=fmt,
        )
        snap = delta_snapshot(spark, table)
        assert "deletionVectors" in (snap.protocol.get("readerFeatures") or [])
        if fmt == "v2":
            assert "v2Checkpoint" in (snap.protocol.get("readerFeatures") or [])
        # drop the JSON chain: the checkpoint alone must reproduce state
        assert delta_log_cleanup(spark, table)
        got = sorted(r.id for r in read_delta(spark, table).collect())
        assert got == [i for i in range(110) if not (i < 100 and i % 10 == 0)]
        snap2 = delta_snapshot(spark, table)
        assert any(a.get("deletionVector") for a in snap2.adds.values())
        assert "deletionVectors" in (snap2.protocol.get("readerFeatures") or [])


def test_dv_survives_encoded_partition_directories(spark, tmp_path):
    """Partition values with spaces/colons percent-encode in Spark's
    _metadata.file_path; the DV exclusion join must still match (a miss
    would silently resurrect deleted rows)."""
    table = str(tmp_path / "dv enc")
    df = spark.range(40).select(
        F.col("id"),
        F.concat(F.lit("g "), (F.col("id") % 2).cast("string")).alias("b"),
    )
    write_delta(df, table, partition_by=["b"])
    v, n = delta_delete(spark, table, "id < 10")
    assert n == 10
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == list(range(10, 40))


def test_dv_with_stats_skipping_stays_conservative(spark, tmp_path):
    table = str(tmp_path / "dvs")
    write_delta(_df(spark, 0, 100).coalesce(1), table)
    write_delta(_df(spark, 1000, 1100).coalesce(1), table)
    delta_delete(spark, table, "id IN (1000, 1001)")
    got = read_delta(spark, table, prune=[("id", ">=", 500)]).filter(
        F.col("id") >= 500
    )
    assert sorted(r.id for r in got.collect()) == list(range(1002, 1100))


def test_fid_join_resolution_matches_literal_map(spark, tmp_path, monkeypatch):
    """Forcing the broadcast-join file-id path (as a many-DV-file table
    would) must produce the same rows as the literal-map path."""
    from pos_dlt_spark.sources import delta as D

    table = str(tmp_path / "dvfid")
    write_delta(_df(spark, 0, 300).repartition(3), table)
    delta_delete(spark, table, "id % 5 = 0")
    want = sorted(r.id for r in read_delta(spark, table).collect())
    monkeypatch.setattr(D, "DV_FID_MAP_MAX", 0)
    got = sorted(r.id for r in read_delta(spark, table).collect())
    assert got == want == [i for i in range(300) if i % 5 != 0]
    # and through the membership (pandas-UDF) path too
    monkeypatch.setattr(D, "DV_RUN_JOIN_MAX", 0)
    got2 = sorted(r.id for r in read_delta(spark, table).collect())
    assert got2 == want


def test_vacuum_keeps_superseded_dv_of_retained_version(spark, tmp_path):
    """ADVICE r08 (high): a DV sidecar live at the OLDEST retained
    version but superseded by a second dv-mode DML inside the retention
    window appears in no window action (removes record only the data
    path), yet time travel to the retained version still reads it.
    Vacuum must protect it via the window-start snapshot's descriptors."""
    from pos_dlt_spark.sources.delta_writer import delta_vacuum

    table = str(tmp_path / "dvsuper")
    write_delta(_df(spark, 0, 5000).coalesce(1), table)          # v0
    delta_delete(spark, table, "id < 1000", inline_threshold=8)  # v1: dv1
    snap1 = delta_snapshot(spark, table)
    (add1,) = snap1.adds.values()
    dv1 = DV.dv_relative_path(add1["deletionVector"])
    assert dv1 and os.path.exists(os.path.join(table, dv1))
    delta_delete(spark, table, "id >= 4000", inline_threshold=8)  # v2: dv2
    snap2 = delta_snapshot(spark, table)
    (add2,) = snap2.adds.values()
    dv2 = DV.dv_relative_path(add2["deletionVector"])
    assert dv2 and dv2 != dv1

    # retain v1 and v2 — v1's snapshot references dv1
    deleted = delta_vacuum(spark, table, retain_versions=1, grace_seconds=-3600)
    assert dv1 not in deleted, "superseded DV of a retained version collected"
    assert read_delta(spark, table, version=1).count() == 4000
    assert read_delta(spark, table).count() == 3000

    # shrink the window past v1: dv1 is now genuinely unreferenced
    deleted2 = delta_vacuum(spark, table, retain_versions=0, grace_seconds=-3600)
    assert dv1 in deleted2
    assert read_delta(spark, table).count() == 3000


def test_dv_readd_carries_datachange_true_after_optimize(spark, tmp_path):
    """ADVICE r08 (medium): a dv-mode DML on a file last written by
    OPTIMIZE (dataChange=false) must emit its re-add with
    dataChange=true — streaming replay and derived CDF key on it."""
    import json as _json

    from pos_dlt_spark.sources.delta import _commit_actions, _list_log
    from pos_dlt_spark.sources.delta_writer import delta_optimize

    table = str(tmp_path / "dvdc")
    write_delta(_df(spark, 0, 500).repartition(4), table)   # v0
    delta_optimize(spark, table, target_files=1)            # v1: dataChange=false add
    delta_delete(spark, table, "id % 7 = 0")                # v2: dv re-add
    log_dir = os.path.join(table, "_delta_log")
    commits = dict(_list_log(log_dir)[0])
    actions = list(_commit_actions(commits[2]))
    readds = [a["add"] for a in actions if "add" in a and a["add"].get("deletionVector")]
    assert readds, "dv delete emitted no re-add"
    assert all(a.get("dataChange") is True for a in readds)
    removes = [a["remove"] for a in actions if "remove" in a]
    assert removes and all(r.get("dataChange", True) for r in removes)
