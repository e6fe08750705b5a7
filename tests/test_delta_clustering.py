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
