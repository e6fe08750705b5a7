"""VARIANT semi-structured type through the Delta protocol (the
variantType reader-writer table feature): feature declaration at
creation and on ALTER ADD COLUMN, mixed-commit reads via variant_get,
the stats degradation contract (variant parquet footers carry a
LogicalType pyarrow cannot parse -> files ship stats-less and skipping
stays conservative), and the loud row-tracking refusal (baseRowId needs
numRecords)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.sources.delta import (
    DeltaProtocolError,
    delta_snapshot,
    read_delta,
    skip_files,
)
from pos_dlt_spark.sources.delta_writer import (
    delta_alter_add_column,
    delta_optimize,
    write_delta,
)


def _vdf(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        F.parse_json(
            F.concat(F.lit('{"k": '), F.col("id") * 3, F.lit("}"))
        ).alias("v"),
    )


def test_variant_create_append_read(spark, tmp_path):
    t = str(tmp_path / "v")
    write_delta(_vdf(spark, 0, 10).coalesce(1), t)
    write_delta(_vdf(spark, 10, 15).coalesce(1), t)
    snap = delta_snapshot(spark, t)
    assert snap.protocol["minReaderVersion"] == 3
    assert "variantType" in set(snap.protocol.get("readerFeatures") or ())
    assert "variantType" in set(snap.protocol.get("writerFeatures") or ())
    got = {
        r.id: r.k
        for r in read_delta(spark, t)
        .selectExpr("id", "variant_get(v, '$.k', 'long') k")
        .collect()
    }
    assert got == {i: i * 3 for i in range(15)}
    # stats are absent (unparseable footer) -> skipping is conservative
    for rel, _ in snap.files:
        assert snap.adds[rel].get("stats") is None
    pruned, skipped = skip_files(snap, [("id", "<", 3)])
    assert skipped == 0 and len(pruned.files) == len(snap.files)


def test_variant_via_alter_add_column(spark, tmp_path):
    t = str(tmp_path / "v")
    write_delta(spark.range(5).selectExpr("id", "id*2 AS w"), t)
    delta_alter_add_column(spark, t, "props", "variant")
    snap = delta_snapshot(spark, t)
    assert "variantType" in set(snap.protocol.get("readerFeatures") or ())
    # old files surface NULL for the new variant column
    assert read_delta(spark, t).filter("props IS NULL").count() == 5
    write_delta(
        spark.range(5, 7).selectExpr(
            "id", "id*2 AS w", """parse_json(concat('{"k": ', id, '}')) props"""
        ),
        t,
    )
    out = read_delta(spark, t).selectExpr(
        "id", "variant_get(props, '$.k', 'long') k"
    )
    assert {r.id: r.k for r in out.collect()} == {
        **{i: None for i in range(5)}, 5: 5, 6: 6,
    }


def test_variant_optimize_and_row_tracking_refusal(spark, tmp_path):
    t = str(tmp_path / "v")
    write_delta(_vdf(spark, 0, 8).repartition(4), t)
    delta_optimize(spark, t, target_files=1)
    snap = delta_snapshot(spark, t)
    assert len(snap.files) == 1
    assert read_delta(spark, t).count() == 8
    from pos_dlt_spark.sources.delta_check import delta_fsck

    assert delta_fsck(spark, t) == []  # stats-less variant files are healthy
    # row tracking needs footer numRecords, which variant files cannot
    # provide here — the combination refuses LOUDLY instead of minting
    # broken baseRowIds
    t2 = str(tmp_path / "rt")
    with pytest.raises(DeltaProtocolError, match="numRecords"):
        write_delta(
            _vdf(spark, 0, 5).coalesce(1), t2,
            configuration={"delta.enableRowTracking": "true"},
        )


def test_timestamp_ntz_declares_feature(spark, tmp_path):
    """Writing a TIMESTAMP_NTZ column declares the timestampNtz
    reader-writer feature — a reader unaware of NTZ would TZ-shift
    every value, so it must refuse instead."""
    t = str(tmp_path / "ntz")
    df = spark.range(3).selectExpr(
        "id", "CAST(timestamp'2026-01-02 03:04:05' AS TIMESTAMP_NTZ) w"
    )
    write_delta(df.coalesce(1), t)
    snap = delta_snapshot(spark, t)
    assert snap.protocol["minReaderVersion"] == 3
    assert "timestampNtz" in set(snap.protocol.get("readerFeatures") or ())
    assert "timestampNtz" in set(snap.protocol.get("writerFeatures") or ())
    got = read_delta(spark, t).selectExpr("CAST(w AS STRING) s").first().s
    assert got == "2026-01-02 03:04:05"


# --- variant shredding (typed physical twins + backfilled stats) ----------


def test_shredded_variant_stats_and_skipping(spark, tmp_path):
    """shred_variant persists typed variant_get twins as EXTRA physical
    columns with Spark-derived add.stats — the low-k files are provably
    excluded from a selective predicate, the logical schema stays clean,
    and the filtered read matches the unpruned one."""
    from pos_dlt_spark.sources.delta import variant_shred_col

    t = str(tmp_path / "vs")
    write_delta(
        _vdf(spark, 0, 500).coalesce(1), t, shred_variant={"v": {"k": "long"}}
    )
    write_delta(_vdf(spark, 500, 1000).coalesce(1), t)  # spec inherited
    snap = delta_snapshot(spark, t)
    sc = variant_shred_col("v", "k")
    for rel, a in snap.adds.items():
        st = json.loads(a["stats"])
        assert st["numRecords"] == 500
        assert sc in st["minValues"] and sc in st["maxValues"]
    _pruned, skipped = skip_files(snap, [(sc, ">", 1600)])
    assert skipped == 1  # k = id*3: first file maxes at 1497
    out = read_delta(spark, t, prune=[(sc, ">", 1600)])
    assert sorted(out.columns) == ["id", "v"]  # twins invisible logically
    got = sorted(
        r.id
        for r in out.filter(F.expr("variant_get(v, '$.k', 'long') > 1600")).collect()
    )
    assert got == list(range(534, 1000))


def test_shredded_variant_optimize_reshreds(spark, tmp_path):
    """OPTIMIZE on a shredded table re-derives the typed twins and their
    stats — compaction must not demote the table to the stats-less
    full-scan posture."""
    from pos_dlt_spark.sources.delta import variant_shred_col

    t = str(tmp_path / "vso")
    write_delta(
        _vdf(spark, 0, 300).repartition(3), t, shred_variant={"v": {"k": "long"}}
    )
    write_delta(_vdf(spark, 300, 600).repartition(3), t)
    delta_optimize(spark, t, target_files=1)
    snap = delta_snapshot(spark, t)
    assert len(snap.files) == 1
    (add,) = snap.adds.values()
    st = json.loads(add["stats"])
    sc = variant_shred_col("v", "k")
    assert st["numRecords"] == 600
    assert st["minValues"][sc] == 0 and st["maxValues"][sc] == 599 * 3
    got = read_delta(spark, t).filter(
        F.expr("variant_get(v, '$.k', 'long') = 900")
    ).collect()
    assert len(got) == 1 and got[0].id == 300


def test_shred_spec_validation(spark, tmp_path):
    t = str(tmp_path / "vbad")
    with pytest.raises(ValueError, match="not a VARIANT column"):
        write_delta(_vdf(spark, 0, 10), t, shred_variant={"id": {"k": "long"}})
    with pytest.raises(ValueError, match="not a plain identifier"):
        write_delta(
            _vdf(spark, 0, 10), t, shred_variant={"v": {"k'); drop": "long"}}
        )
    with pytest.raises(ValueError, match="not in"):
        write_delta(_vdf(spark, 0, 10), t, shred_variant={"v": {"k": "decimal"}})
    # spec is creation-only: a conflicting later declaration refuses
    write_delta(_vdf(spark, 0, 10), t, shred_variant={"v": {"k": "long"}})
    with pytest.raises(ValueError, match="creation only"):
        write_delta(
            _vdf(spark, 10, 20), t, shred_variant={"v": {"k": "string"}}
        )


def test_shredded_missing_field_yields_null_stats_conservative(spark, tmp_path):
    """Rows lacking the shredded field produce NULL twins; files whose
    rows ALL lack it carry no min/max for the twin and are never
    skipped (conservative, like any stats-less column)."""
    from pos_dlt_spark.sources.delta import variant_shred_col

    t = str(tmp_path / "vnull")
    nok = spark.range(0, 50).select(
        F.col("id"), F.parse_json(F.lit('{"other": 1}')).alias("v")
    )
    write_delta(nok.coalesce(1), t, shred_variant={"v": {"k": "long"}})
    write_delta(_vdf(spark, 50, 100).coalesce(1), t)
    snap = delta_snapshot(spark, t)
    sc = variant_shred_col("v", "k")
    stats = [json.loads(a["stats"]) for a in snap.adds.values()]
    nullfile = [s for s in stats if s["nullCount"].get(sc) == 50]
    assert len(nullfile) == 1 and sc not in nullfile[0]["minValues"]
    _pruned, skipped = skip_files(snap, [(sc, ">", 0)])
    assert skipped == 0  # the all-null file cannot be proven out
    assert read_delta(spark, t).count() == 100
