"""UniForm Iceberg decade measurements (round 9, row-level deletes).

Measures, on protocol-shaped synthetic inputs:

1. **dv-sync** — position-delete emission cost: a 2M-row / 64-file
   UniForm table takes a dv-mode DELETE of ~1% scattered rows; the
   commit's full-rewrite sync decodes every live DV and writes the
   position-delete parquet. Reported: DML wall with sync vs the same
   DML on a non-uniform twin (the delta IS the Iceberg rendering cost),
   delete-parquet bytes (the O(deleted rows) artifact), and manifest
   bytes.

2. **mor-read** — merge-on-read overhead: read_iceberg (anti-join
   against the broadcast delete frame) vs read_delta (DV-filtered scan)
   on the same table, same aggregate, both steady-state.

3. **fieldid** — footer-group resolution: N id-stamped parquet files
   (executor-side footer reads above 2000), grouping wall + the scan's
   group count (bounded by schema generations, never file count).

Usage: python tools/iceberg_stress.py [dvsync|fieldid|all]
Numbers are host-dependent; transfer to SCALE.md by hand.
"""

from __future__ import annotations

import glob
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )


def dvsync() -> None:
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources import iceberg_uniform as uf
    from pos_dlt_spark.sources.delta import read_delta
    from pos_dlt_spark.sources.delta_writer import delta_delete, write_delta

    spark = _spark()
    work = tempfile.mkdtemp(prefix="ice_stress_")
    try:
        rows = 2_000_000
        df = spark.range(0, rows).select(
            "id", (F.col("id") * 7 % 1000).alias("v")
        )
        t_uni = os.path.join(work, "uni")
        t_plain = os.path.join(work, "plain")
        write_delta(
            df.repartition(64),
            t_uni,
            configuration={"delta.universalFormat.enabledFormats": "iceberg"},
        )
        write_delta(df.repartition(64), t_plain)
        # untimed warmup pair: the first dv DELETE of a session pays JVM
        # JIT + codegen; timing it against a warm second run would charge
        # the warmup to whichever table went first
        for warm in ("w_plain", "w_uni"):
            tw = os.path.join(work, warm)
            write_delta(
                df.repartition(64),
                tw,
                configuration=(
                    {"delta.universalFormat.enabledFormats": "iceberg"}
                    if warm == "w_uni"
                    else None
                ),
            )
            delta_delete(spark, tw, "id % 97 = 0", mode="dv")

        pred = "id % 97 = 0"  # ~1% scattered across every file
        t0 = time.monotonic()
        delta_delete(spark, t_plain, pred, mode="dv")
        plain_wall = time.monotonic() - t0
        t0 = time.monotonic()
        delta_delete(spark, t_uni, pred, mode="dv")
        uni_wall = time.monotonic() - t0

        dels = glob.glob(os.path.join(t_uni, "metadata", "delete-*.parquet"))
        del_bytes = sum(os.path.getsize(p) for p in dels)
        man_bytes = sum(
            os.path.getsize(p)
            for p in glob.glob(os.path.join(t_uni, "metadata", "manifest-*.avro"))
        )
        n_deleted = rows - read_delta(spark, t_uni).count()
        print(
            f"dv-sync: {rows} rows / 64 files, {n_deleted} deleted (~1%)\n"
            f"  dv DELETE wall plain={plain_wall:.2f}s uniform={uni_wall:.2f}s "
            f"(iceberg rendering delta {uni_wall - plain_wall:+.2f}s)\n"
            f"  delete parquet: {len(dels)} file(s), {del_bytes/1e6:.2f} MB "
            f"({del_bytes/max(n_deleted,1):.1f} B/deleted row)\n"
            f"  manifests total: {man_bytes/1e6:.2f} MB"
        )

        # 2. merge-on-read read overhead, steady state (2nd run timed)
        def _agg_ice():
            return uf.read_iceberg(spark, t_uni).agg(F.sum("v")).collect()[0][0]

        def _agg_delta():
            return (
                read_delta(spark, t_uni).agg(F.sum("v")).collect()[0][0]
            )

        a = _agg_ice()
        t0 = time.monotonic()
        a2 = _agg_ice()
        ice_wall = time.monotonic() - t0
        b = _agg_delta()
        t0 = time.monotonic()
        b2 = _agg_delta()
        delta_wall = time.monotonic() - t0
        assert a == b == a2 == b2, (a, b)
        print(
            f"mor-read: sum(v) over {rows - n_deleted} live rows\n"
            f"  read_iceberg={ice_wall:.2f}s read_delta={delta_wall:.2f}s "
            f"(values identical)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def fieldid(n_files: int = 4000) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pos_dlt_spark.sources import iceberg_uniform as uf

    spark = _spark()
    work = tempfile.mkdtemp(prefix="ice_fid_")
    try:
        sch_old = pa.schema(
            [
                pa.field("id", pa.int64(), metadata={"PARQUET:field_id": "1"}),
                pa.field("old_g", pa.string(), metadata={"PARQUET:field_id": "2"}),
            ]
        )
        sch_new = pa.schema(
            [
                pa.field("id", pa.int64(), metadata={"PARQUET:field_id": "1"}),
                pa.field("g", pa.string(), metadata={"PARQUET:field_id": "2"}),
            ]
        )
        paths = []
        for i in range(n_files):
            p = os.path.join(work, f"f{i:05d}.parquet")
            sch = sch_old if i < n_files // 2 else sch_new
            pq.write_table(
                pa.table(
                    {sch.names[0]: pa.array([i], pa.int64()),
                     sch.names[1]: pa.array(["x"])},
                    schema=sch,
                ),
                p,
            )
            paths.append(p)
        t0 = time.monotonic()
        groups = uf._field_id_groups(spark, paths)
        wall = time.monotonic() - t0
        print(
            f"fieldid: {n_files} id-stamped files -> {len(groups)} scan "
            f"group(s) in {wall:.2f}s "
            f"({'executor-side' if n_files > 2000 else 'driver-side'} footers)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("dvsync", "all"):
        dvsync()
    if what in ("fieldid", "all"):
        fieldid()
