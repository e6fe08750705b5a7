"""delta_fsck: the table invariant checker — healthy tables report
nothing; each seeded corruption surfaces as the right finding."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from pos_dlt_spark.sources import delta_fixture as fx
from pos_dlt_spark.sources.delta_check import delta_fsck
from pos_dlt_spark.sources.delta_writer import (
    delta_delete,
    delta_enable_column_mapping,
    write_delta,
)


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )


def test_healthy_table_reports_nothing(spark, tmp_path):
    table = str(tmp_path / "ok")
    write_delta(_df(spark, 0, 20), table)
    delta_delete(spark, table, "id = 3", mode="dv")
    delta_enable_column_mapping(spark, table)
    assert delta_fsck(spark, table) == []


def test_missing_file_and_size_mismatch(spark, tmp_path):
    table = str(tmp_path / "bad1")
    write_delta(_df(spark, 0, 10).repartition(2), table)
    from pos_dlt_spark.sources.delta import delta_snapshot

    rels = [rel for rel, _ in delta_snapshot(spark, table).files]
    os.remove(os.path.join(table, rels[0]))
    with open(os.path.join(table, rels[1]), "ab") as f:
        f.write(b"x")
    codes = {(s, c) for s, c, _m in delta_fsck(spark, table)}
    assert ("error", "files") in codes
    msgs = [m for _s, c, m in delta_fsck(spark, table) if c == "files"]
    assert any("missing" in m for m in msgs) and any("size mismatch" in m for m in msgs)


def test_dv_under_declared_protocol_flags(spark, tmp_path):
    """A foreign writer that added a DV without upgrading the protocol:
    fsck must flag the declaration gap (spec-compliant readers would
    resurrect the deleted rows)."""
    table = str(tmp_path / "bad2")
    write_delta(_df(spark, 0, 10), table)
    delta_delete(spark, table, "id = 2", mode="dv")
    # clobber the protocol back to (1,2) — the bug _merged_protocol
    # prevents our own writers from ever committing
    fx.write_commit(table, 2, [fx.protocol_action(min_reader=1, min_writer=2)])
    codes = {(s, c) for s, c, _m in delta_fsck(spark, table)}
    assert ("error", "protocol") in codes


def test_unparseable_stats_warns(spark, tmp_path):
    table = str(tmp_path / "bad3")
    write_delta(_df(spark, 0, 10).repartition(1), table)
    from pos_dlt_spark.sources.delta import delta_snapshot

    rel = delta_snapshot(spark, table).files[0][0]
    fx.write_commit(
        table, 1,
        [fx.remove_action(rel), fx.add_action(rel, size=os.path.getsize(os.path.join(table, rel)), stats="{not json")],
    )
    findings = delta_fsck(spark, table)
    assert ("warn", "stats") in {(s, c) for s, c, _m in findings}
    # stats damage is a WARN, never an error: reads stay correct
    assert not [f for f in findings if f[0] == "error"]


def test_fsck_parallel_probe_matches_sequential(spark, tmp_path, monkeypatch):
    """The executor-side existence/size probe must report exactly the
    sequential loop's findings (missing file + size mismatch)."""
    import os

    from pyspark.sql import functions as F

    from pos_dlt_spark.sources import delta_check as C
    from pos_dlt_spark.sources.delta import delta_snapshot
    from pos_dlt_spark.sources.delta_writer import write_delta

    t = str(tmp_path / "fpar")
    write_delta(spark.range(0, 400).withColumn("v", F.col("id")).repartition(4), t)
    snap = delta_snapshot(spark, t)
    rels = sorted(r for r, _ in snap.files)
    os.remove(os.path.join(t, rels[0]))          # missing
    with open(os.path.join(t, rels[1]), "ab") as fh:
        fh.write(b"xx")                           # size mismatch
    seq = sorted(f for f in C.delta_fsck(spark, t) if f[1] == "files")
    monkeypatch.setattr(C, "FSCK_PARALLEL_MIN", 0)
    par = sorted(f for f in C.delta_fsck(spark, t) if f[1] == "files")
    assert par == seq and len(seq) == 2
