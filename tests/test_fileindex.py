"""Pins for sources/fileindex.pruned_parquet — the zero-stat-job scan
of log-known live-file sets (SCALE.md r11's 'next lever')."""

import os
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql.types import LongType, StructField, StructType

from pos_dlt_spark.sources.fileindex import (
    LISTING_JOB_THRESHOLD,
    pruned_parquet,
)

SCHEMA = StructType([StructField("id", LongType())])


def _make_files(spark, d, n, start=0, sub=None):
    os.makedirs(d, exist_ok=True)
    out = []
    for i in range(n):
        sd = os.path.join(d, sub(i)) if sub else d
        os.makedirs(sd, exist_ok=True)
        p = os.path.join(sd, f"part-{start + i:05d}.parquet")
        pq.write_table(
            pa.table({"id": pa.array([start + i], pa.int64())}), p
        )
        out.append(p)
    return out


def _scan_num_files(df) -> int:
    nodes = []

    def walk(node):
        nodes.append(node)
        for i in range(node.children().size()):
            walk(node.children().apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    for nd in nodes:
        if "Scan" in nd.nodeName():
            it = nd.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numFiles":
                    return int(kv._2().value())
    raise AssertionError("no scan node with numFiles metric")


def test_pruned_parquet_file_level_pruning(spark, tmp_path):
    """Above the threshold the dir read is used, and file pruning is
    FILE-level: dead files are never opened. Pinned by planting (a) a
    tombstoned parquet with an INCOMPATIBLE schema (id as string — the
    pinned-long read would error if its footer were opened) and (b) a
    non-parquet deletion_vector_*.bin in the same directory."""
    d = str(tmp_path / "t")
    live = _make_files(spark, d, LISTING_JOB_THRESHOLD + 8)
    pq.write_table(
        pa.table({"id": pa.array(["not-a-long"])}),
        os.path.join(d, "part-99999-dead.parquet"),
    )
    with open(
        os.path.join(d, f"deletion_vector_{uuid.uuid4()}.bin"), "wb"
    ) as f:
        f.write(b"\x00\x01binary-not-parquet")

    df = pruned_parquet(spark.read.schema(SCHEMA), live)
    got = sorted(r["id"] for r in df.collect())
    assert got == list(range(len(live))), got
    assert _scan_num_files(df) == len(live)


def test_pruned_parquet_zero_listing_jobs(spark, tmp_path):
    """The whole point: above the threshold, no distributed stat job at
    reader-resolution time. The listing job's stages are named
    'parquet at ...' (fired inside DataFrameReader.parquet); the
    pruned read must launch none."""
    d = str(tmp_path / "t")
    files = _make_files(spark, d, LISTING_JOB_THRESHOLD + 8)
    sc = spark.sparkContext
    st = sc.statusTracker()

    def listing_stages(fn):
        g = str(uuid.uuid4())
        sc.setJobGroup(g, "probe")
        try:
            fn()
        finally:
            sc.setJobGroup(None, None)
        n = 0
        for j in st.getJobIdsForGroup(g) or []:
            for s in st.getJobInfo(j).stageIds:
                si = st.getStageInfo(s)
                if si and si.name.startswith("parquet at"):
                    n += 1
        return n

    explicit = listing_stages(
        lambda: spark.read.schema(SCHEMA).parquet(*files).count()
    )
    pruned = listing_stages(
        lambda: pruned_parquet(spark.read.schema(SCHEMA), files).count()
    )
    assert explicit >= 1, explicit  # the stat stage the fix removes
    assert pruned == 0, pruned


def test_pruned_parquet_fallbacks(spark, tmp_path):
    """At or below the threshold, and for unsafe path characters or
    multi-parent layouts without a base_dir, the explicit-path read is
    used (below the threshold it is stat-job-free anyway)."""
    d = str(tmp_path / "t")
    files = _make_files(spark, d, 3)
    df = pruned_parquet(spark.read.schema(SCHEMA), files)
    assert sorted(r["id"] for r in df.collect()) == [0, 1, 2]

    # multi-parent above threshold without base_dir: falls back, still right
    d2 = str(tmp_path / "u")
    files2 = _make_files(spark, d2, LISTING_JOB_THRESHOLD, start=100)
    both = files + files2
    df2 = pruned_parquet(spark.read.schema(SCHEMA), both)
    assert len(df2.collect()) == len(both)

    # unsafe chars (space in dir name): falls back, still right
    d3 = str(tmp_path / "with space")
    files3 = _make_files(spark, d3, LISTING_JOB_THRESHOLD + 2, start=200)
    df3 = pruned_parquet(spark.read.schema(SCHEMA), files3)
    assert len(df3.collect()) == len(files3)


def test_pruned_parquet_base_dir_partitioned(spark, tmp_path):
    """base_dir + basePath discovery: hive-layout live files across
    partition directories prune correctly and keep partition columns."""
    d = str(tmp_path / "t")
    n = LISTING_JOB_THRESHOLD + 8
    files = _make_files(spark, d, n, sub=lambda i: f"p={i % 4}")
    live = files[: n - 5]
    df = pruned_parquet(
        spark.read.schema(SCHEMA).option("basePath", d), live, base_dir=d
    )
    assert "p" in df.columns
    assert len(df.collect()) == len(live)
    assert _scan_num_files(df) == len(live)
