"""Minor log compaction ({start}.{end}.compacted.json): the fold
prefers one aggregated segment over the span's per-commit JSONs and
reconstructs identical state — net adds, remove tombstones cancelling
pre-span adds, newest metaData, txn maxes, domainMetadata — and time
travel inside / past the span still works."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_log_compact,
    delta_set_properties,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def _snap_state(snap):
    return (
        sorted(rel for rel, _ in snap.files),
        snap.configuration,
        dict(snap.txns),
        dict(snap.domain_metadata),
    )


def test_compacted_fold_equals_json_replay(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_df(spark, 0, 100).coalesce(1), t)          # v0 add
    write_delta(_df(spark, 100, 150).coalesce(1), t)        # v1 add
    delta_delete(spark, t, "id < 20", mode="rewrite")       # v2 remove+add
    delta_set_properties(spark, t, {"userprop": "x"})       # v3 metaData
    write_delta(_df(spark, 150, 160).coalesce(1), t,
                txn=("app", 7))                              # v4 txn
    want = _snap_state(delta_snapshot(spark, t))
    want_rows = sorted(r.id for r in read_delta(spark, t).collect())

    p = delta_log_compact(spark, t)
    assert os.path.basename(p) == f"{0:020d}.{4:020d}.compacted.json"
    # force the fold through the segment: remove the per-commit JSONs
    log = os.path.join(t, "_delta_log")
    for v in range(5):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    snap = delta_snapshot(spark, t)
    assert _snap_state(snap) == want
    assert snap.version == 4 and snap.txns["app"] == 7
    assert snap.configuration.get("userprop") == "x"
    got_rows = sorted(r.id for r in read_delta(spark, t).collect())
    assert got_rows == want_rows


def test_partial_segment_time_travel_and_appends_after(spark, tmp_path):
    t = str(tmp_path / "c")
    for lo in range(0, 50, 10):                              # v0..v4
        write_delta(_df(spark, lo, lo + 10).coalesce(1), t)
    delta_log_compact(spark, t, 1, 3)
    # versions INSIDE the span cannot use it (segment end > target):
    assert read_delta(spark, t, version=2).count() == 30
    # target at the segment end uses it even with JSONs gone
    log = os.path.join(t, "_delta_log")
    for v in (1, 2, 3):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    assert read_delta(spark, t, version=3).count() == 40
    assert read_delta(spark, t).count() == 50               # v4 rides after
    with pytest.raises(FileNotFoundError, match="missing commit"):
        read_delta(spark, t, version=2)                     # inside: gone


def test_remove_tombstones_cancel_pre_span_adds(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_df(spark, 0, 30).coalesce(1), t)            # v0 (pre-span)
    delta_delete(spark, t, "id >= 0", mode="rewrite")        # v1 removes v0's file
    write_delta(_df(spark, 0, 5).coalesce(1), t)             # v2
    delta_log_compact(spark, t, 1, 2)
    log = os.path.join(t, "_delta_log")
    for v in (1, 2):
        os.remove(os.path.join(log, f"{v:020d}.json"))
    # v0's add must stay cancelled by the tombstone inside the segment
    assert read_delta(spark, t).count() == 5


def test_compact_range_validation(spark, tmp_path):
    t = str(tmp_path / "c")
    write_delta(_df(spark, 0, 5).coalesce(1), t)
    write_delta(_df(spark, 5, 9).coalesce(1), t)
    with pytest.raises(ValueError, match="bad compaction range"):
        delta_log_compact(spark, t, 1, 0)
    os.remove(os.path.join(t, "_delta_log", f"{0:020d}.json"))
    with pytest.raises(ValueError, match="missing commits"):
        delta_log_compact(spark, t, 0, 1)


def test_fsck_accepts_compacted_coverage(spark, tmp_path):
    from pos_dlt_spark.sources.delta_check import delta_fsck

    t = str(tmp_path / "c")
    for lo in (0, 10, 20):
        write_delta(_df(spark, lo, lo + 10).coalesce(1), t)
    delta_log_compact(spark, t, 0, 2)
    log = os.path.join(t, "_delta_log")
    os.remove(os.path.join(log, f"{1:020d}.json"))
    assert not [f for f in delta_fsck(spark, t) if f[1] == "log"]
