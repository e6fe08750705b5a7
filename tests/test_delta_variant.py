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
