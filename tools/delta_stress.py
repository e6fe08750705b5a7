"""Delta-suite scale decades (VERDICT r04 #8).

Measures, on synthetic-but-protocol-shaped inputs:

1. **Log fold at 1M files** — one decade past SCALE.md's 100k row: build
   a `_delta_log` with N live add actions (JSON chain and classic
   checkpoint variants) and time `delta_snapshot`. The fold is
   driver-side metadata; the question is whether it stays linear with
   sane constants at the documented boundary.

2. **MERGE against 1000 banded files (10M rows)** — one decade past the
   r04 100-file measurement, with the hull-defeating batch shape (50k
   clustered updates + 10k top-of-keyspace inserts), comparing the
   broadcast BETWEEN pruning against the bucketized interval-join scale
   path (forced via range_join_threshold=1): touched set and results
   must match, wall clocks recorded.

Usage: python tools/delta_stress.py [fold|merge|all] [--files N]
Writes human-readable results to stdout; transfer the numbers to
SCALE.md by hand (they are host-dependent).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_session():
    from pos_dlt_spark.session import get_spark

    return get_spark("delta_stress")


def stress_fold(spark, n_files: int) -> None:
    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources.delta import delta_snapshot
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_fold_")
    try:
        per_commit = 1000
        n_commits = n_files // per_commit
        stats = json.dumps(
            {"numRecords": 1000, "minValues": {"k": 0}, "maxValues": {"k": 999}}
        )

        # -- JSON chain variant --------------------------------------
        tj = os.path.join(work, "json_chain")
        os.makedirs(tj, exist_ok=True)
        from pyspark.sql.types import LongType, StructField, StructType

        schema = StructType([StructField("k", LongType())])
        t0 = time.perf_counter()
        for c in range(n_commits):
            actions = []
            if c == 0:
                actions += [fx.protocol_action(), fx.metadata_action(schema)]
            actions += [
                fx.add_action(f"part-{c}-{i}.parquet", size=1 << 20, stats=stats)
                for i in range(per_commit)
            ]
            fx.write_commit(tj, c, actions)
        build_json = time.perf_counter() - t0

        t0 = time.perf_counter()
        snap = delta_snapshot(spark, tj)
        fold_json = time.perf_counter() - t0
        assert len(snap.files) == n_files, len(snap.files)

        # -- minor-compaction variant (same chain, one aggregated file)
        from pos_dlt_spark.sources.delta_writer import delta_log_compact

        t0 = time.perf_counter()
        delta_log_compact(spark, tj)
        build_compact = time.perf_counter() - t0
        t0 = time.perf_counter()
        snap_c = delta_snapshot(spark, tj)
        fold_compact = time.perf_counter() - t0
        assert len(snap_c.files) == n_files
        # drop the segment so the checkpoint variant below isn't shadowed
        for n in os.listdir(os.path.join(tj, "_delta_log")):
            if n.endswith(".compacted.json"):
                os.remove(os.path.join(tj, "_delta_log", n))

        # -- checkpoint variant --------------------------------------
        t0 = time.perf_counter()
        fx.write_checkpoint(
            tj,
            n_commits - 1,
            [fx.protocol_action(), fx.metadata_action(schema)]
            + [{"add": a} for a in snap.adds.values()],
        )
        build_ckpt = time.perf_counter() - t0
        # drop the JSON chain so the fold MUST ride the checkpoint
        for c in range(n_commits):
            os.remove(os.path.join(tj, "_delta_log", f"{c:020d}.json"))
        t0 = time.perf_counter()
        snap2 = delta_snapshot(spark, tj)
        fold_ckpt = time.perf_counter() - t0
        assert len(snap2.files) == n_files

        log_mb = sum(
            os.path.getsize(os.path.join(tj, "_delta_log", n))
            for n in os.listdir(os.path.join(tj, "_delta_log"))
        ) / 2**20
        print(
            f"fold n_files={n_files}: json_replay={fold_json:.2f}s "
            f"compacted={fold_compact:.2f}s checkpoint={fold_ckpt:.2f}s "
            f"(log {log_mb:.0f} MB on disk; build: json {build_json:.1f}s, "
            f"compact {build_compact:.1f}s, ckpt {build_ckpt:.1f}s)",
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_merge(spark, n_files: int = 1000, rows: int = 10_000_000) -> None:
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
    from pos_dlt_spark.sources.delta_writer import delta_merge, write_delta
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_merge_")
    try:
        per_file = rows // n_files

        def build(table: str) -> None:
            df = (
                spark.range(rows)
                .select(
                    F.col("id").alias("k"),
                    F.lit(1).alias("seq"),
                    (F.col("id") % 97).cast("long").alias("v"),
                )
                .repartitionByRange(n_files, "k")
            )
            write_delta(df, table)

        def batch():
            # 50k updates clustered in one band + 10k inserts past the top
            upd = spark.range(3 * per_file, 3 * per_file + 50_000).select(
                F.col("id").alias("k"), F.lit(9).alias("seq"), F.lit(-1).cast("long").alias("v")
            )
            ins = spark.range(rows * 2, rows * 2 + 10_000).select(
                F.col("id").alias("k"), F.lit(9).alias("seq"), F.lit(-2).cast("long").alias("v")
            )
            return upd.unionByName(ins)

        results = {}
        for label, thresh in (("broadcast_between", 10**9), ("bucketized_interval", 1)):
            table = os.path.join(work, label)
            t0 = time.perf_counter()
            build(table)
            t_build = time.perf_counter() - t0
            files_before = {rel for rel, _ in delta_snapshot(spark, table).files}
            t0 = time.perf_counter()
            delta_merge(
                spark, table, batch(), keys=["k"], sequence_by="seq",
                range_join_threshold=thresh,
            )
            t_merge = time.perf_counter() - t0
            snap = delta_snapshot(spark, table)
            survived = sum(1 for rel, _ in snap.files if rel in files_before)
            touched = len(files_before) - survived
            total = read_delta(spark, table).count()
            upd_applied = read_delta(spark, table).filter(F.col("v") == -1).count()
            results[label] = (t_merge, touched, total, upd_applied, t_build)
            print(
                f"merge[{label}]: wall={t_merge:.2f}s touched={touched}/{n_files} "
                f"rows={total} updates_applied={upd_applied} (build {t_build:.1f}s)"
            )
        a, b = results["broadcast_between"], results["bucketized_interval"]
        assert a[1:4] == b[1:4], f"pruning paths disagree: {a} vs {b}"
        print("touched set + results identical across pruning paths")
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_delete(spark, rows: int = 10_000_000, n_files: int = 100) -> None:
    """DV delete vs copy-on-write rewrite at 10M rows / 100 files, plus
    CDF-enabled merge overhead — the operational claims measured."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
    from pos_dlt_spark.sources.delta_writer import (
        delta_delete,
        delta_merge,
        write_delta,
    )
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_del_")
    try:
        def build(table, conf=None):
            df = (
                spark.range(rows)
                .select(
                    F.col("id").alias("k"), F.lit(1).alias("seq"),
                    (F.col("id") % 97).cast("long").alias("v"),
                )
                .repartitionByRange(n_files, "k")
            )
            write_delta(df, table, configuration=conf)

        def dir_mb(p):
            return sum(
                os.path.getsize(os.path.join(r, n))
                for r, _, fs in os.walk(p)
                for n in fs
            ) / 2**20

        # scattered selective delete: 0.1% of rows spread over every file
        pred = "k % 1000 = 0"
        for mode in ("dv", "rewrite"):
            table = os.path.join(work, f"del_{mode}")
            build(table)
            before_mb = dir_mb(table)
            t0 = time.perf_counter()
            v, n = delta_delete(spark, table, pred, mode=mode)
            wall = time.perf_counter() - t0
            written_mb = dir_mb(table) - before_mb
            cnt = read_delta(spark, table).count()
            print(
                f"delete[{mode}]: wall={wall:.2f}s rows_deleted={n} "
                f"bytes_written={written_mb:.2f} MB survivors={cnt}"
            )

        # CDF overhead on the 50k-update merge
        for label, conf in (("merge_plain", None),
                            ("merge_cdf", {"delta.enableChangeDataFeed": "true"})):
            table = os.path.join(work, label)
            build(table, conf)
            upd = spark.range(100_000, 150_000).select(
                F.col("id").alias("k"), F.lit(9).alias("seq"),
                F.lit(-1).cast("long").alias("v"),
            )
            t0 = time.perf_counter()
            delta_merge(spark, table, upd, keys=["k"], sequence_by="seq")
            wall = time.perf_counter() - t0
            snap = delta_snapshot(spark, table)
            cd = os.path.join(table, "_change_data")
            cdf_mb = dir_mb(cd) if os.path.isdir(cd) else 0.0
            print(
                f"{label}: wall={wall:.2f}s live_files={len(snap.files)} "
                f"change_data={cdf_mb:.2f} MB"
            )
    finally:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _vm_rss_mb() -> float:
    with open("/proc/self/status") as fh:
        for line in fh:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return -1.0


def stress_dv_read(spark, rows: int = 24_000_000) -> None:
    """READ path with a >=10M-row deletion vector (VERDICT r05 #1): the
    driver must stay flat — its cost rides the compressed bitmap bytes
    (broadcast of the serialized roaring containers + executor-side
    vectorized membership), never the deleted-row count. 12M deleted:
    10M scattered (every other row of [0, 20M) — bitmap containers, run
    rendering impossible) + 2M clustered ([20M, 22M))."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources import dv as DV
    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
    from pos_dlt_spark.sources.delta_writer import write_delta
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_dvread_")
    try:
        table = os.path.join(work, "dvbig")
        df = spark.range(rows).select(F.col("id"))
        write_delta(df.coalesce(1), table)
        snap = delta_snapshot(spark, table)
        (rel,) = [r for r, _ in snap.files]

        t0 = time.perf_counter()
        deleted = list(range(0, 20_000_000, 2)) + list(range(20_000_000, 22_000_000))
        data = DV.encode_dv_bitmap(deleted)
        desc_build = time.perf_counter() - t0
        print(
            f"dv_read: encode {len(deleted)} indices -> {len(data)/2**20:.2f} MB "
            f"bitmap in {desc_build:.1f}s (builder-side, not the read path)"
        )
        entries = DV.write_dv_file(os.path.join(table, "dv_big.bin"), [data])
        desc = {
            "storageType": "p",
            "pathOrInlineDv": os.path.join(table, "dv_big.bin"),
            "offset": entries[0][0],
            "sizeInBytes": entries[0][1],
            "cardinality": len(deleted),
        }
        add = dict(snap.adds[rel])
        add["deletionVector"] = desc
        fx.write_commit(
            table,
            snap.version + 1,
            [
                fx.commit_info_action("DELETE", {"mode": "dv-stress"}),
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                              "readerFeatures": ["deletionVectors"],
                              "writerFeatures": ["deletionVectors"]}},
                fx.remove_action(rel),
                {"add": add},
            ],
        )

        rss0 = _vm_rss_mb()
        t0 = time.perf_counter()
        got = read_delta(spark, table)
        cnt = got.count()
        wall = time.perf_counter() - t0
        rss1 = _vm_rss_mb()
        t0 = time.perf_counter()
        s = got.agg(F.sum("id")).collect()[0][0]
        wall2 = time.perf_counter() - t0
        live_scatter = sum(range(1, 20_000_000, 2))
        live_tail = sum(range(22_000_000, rows))
        ok = cnt == rows - len(deleted) and s == live_scatter + live_tail
        print(
            f"dv_read: count={cnt} (expect {rows - len(deleted)}) "
            f"sum_ok={s == live_scatter + live_tail} wall={wall:.2f}s "
            f"sum_wall={wall2:.2f}s broadcast={len(data)/2**20:.2f} MB "
            f"driver_rss {rss0:.0f} -> {rss1:.0f} MB (delta "
            f"{rss1 - rss0:+.0f} MB) correct={ok}"
        )

        # -- the WRITE side at the same scale: delta_delete(mode='dv')
        # matching ~4M additional live rows (id % 3 == 0 among the 12M
        # live), unioned with the existing 12M-row DV executor-side; the
        # driver sees only compressed bitmap bytes.
        from pos_dlt_spark.sources.delta_writer import delta_delete

        rss2 = _vm_rss_mb()
        t0 = time.perf_counter()
        v, n = delta_delete(spark, table, "id % 3 = 0")
        wall3 = time.perf_counter() - t0
        rss3 = _vm_rss_mb()
        cnt2 = read_delta(spark, table).count()
        import numpy as np

        live = np.ones(rows, dtype=bool)
        live[0:20_000_000:2] = False
        live[20_000_000:22_000_000] = False
        live_after = int((live & (np.arange(rows) % 3 != 0)).sum())
        print(
            f"dv_delete: rows_deleted={n} wall={wall3:.2f}s survivors={cnt2} "
            f"(expect {live_after}) driver_rss {rss2:.0f} -> {rss3:.0f} MB "
            f"(delta {rss3 - rss2:+.0f} MB) correct={cnt2 == live_after}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_dv_paths(spark, rows: int = 24_000_000) -> None:
    """VERDICT r06 #4: the bucketed JVM anti-join vs the executor-side
    membership probe, BOTH measured on the same 24M-row table across
    three 12M-scale DV regimes (clustered / 120k-run midscatter /
    fully-scattered 12M-run). Forces each path via DV_RUN_JOIN_MAX so
    the decade compares algorithms, not thresholds; reads run twice and
    report (first, second) so JIT noise is visible."""
    import numpy as np

    import pos_dlt_spark.sources.delta as DM
    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources import dv as DV
    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
    from pos_dlt_spark.sources.delta_writer import write_delta
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_dvpaths_")
    default_budget = DM.DV_RUN_JOIN_MAX
    try:
        table = os.path.join(work, "dvpaths")
        write_delta(spark.range(rows).selectExpr("id").coalesce(1), table)
        ids = np.arange(rows, dtype=np.int64)
        regimes = [
            ("clustered_12runs", np.concatenate(
                [np.arange(k * 2_000_000, k * 2_000_000 + 1_000_000)
                 for k in range(12)]).astype(np.int64)),
            ("midscatter_120k_runs", ids[(ids % 200) < 50]),
            ("heavyscatter_1M_runs", ids[(ids % 24) == 0]),
            ("scattered_12M_runs", np.arange(0, rows, 2, dtype=np.int64)),
        ]
        only = None
        if "--regime" in sys.argv:
            only = sys.argv[sys.argv.index("--regime") + 1]
        for name, deleted in regimes:
            if only is not None and name != only:
                continue
            snap = delta_snapshot(spark, table)
            rel = sorted(r for r, _ in snap.files)[0]
            t0 = time.perf_counter()
            data = DV.encode_dv_bitmap_np(deleted)
            enc = time.perf_counter() - t0
            entries = DV.write_dv_file(
                os.path.join(table, f"dv_{name}.bin"), [data]
            )
            desc = {
                "storageType": "p",
                "pathOrInlineDv": os.path.join(table, f"dv_{name}.bin"),
                "offset": entries[0][0],
                "sizeInBytes": entries[0][1],
                "cardinality": int(len(deleted)),
            }
            add = dict(snap.adds[rel])
            add.pop("deletionVector", None)
            add["deletionVector"] = desc
            fx.write_commit(
                table, snap.version + 1,
                [
                    fx.commit_info_action("DELETE", {"mode": f"dv-{name}"}),
                    {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7,
                                  "readerFeatures": ["deletionVectors"],
                                  "writerFeatures": ["deletionVectors"]}},
                    fx.remove_action(rel),
                    {"add": add},
                ],
            )
            expect = rows - len(deleted)
            runs = DV.decode_dv_runs(data)
            width = max(1, (runs[-1][1] + 1) // len(runs))
            n_entries = sum(hi // width - lo // width + 1 for lo, hi in runs)
            print(
                f"[{name}] deleted={len(deleted)} runs={len(runs)} "
                f"bitmap={len(data)/2**20:.2f} MB exploded_entries={n_entries} "
                f"(~{n_entries*28/2**20:.1f} MB broadcast) encode={enc:.1f}s",
                flush=True,
            )
            paths = [
                ("jvm_bucketed_join", max(n_entries + 1, default_budget)),
                ("membership_probe", 0),
            ]
            if len(runs) >= 4_000_000:
                # forcing the join here would materialize a >100 MB
                # broadcast from millions of driver tuples — the byte
                # math above IS the floor evidence; measure probe only
                paths = paths[1:]
            for label, budget in paths:
                DM.DV_RUN_JOIN_MAX = budget
                walls = []
                rss0 = _vm_rss_mb()
                for _ in range(2):
                    t0 = time.perf_counter()
                    cnt = read_delta(spark, table).count()
                    walls.append(time.perf_counter() - t0)
                rss1 = _vm_rss_mb()
                print(
                    f"[{name}] {label}: wall={walls[0]:.2f}s/{walls[1]:.2f}s "
                    f"count={cnt} correct={cnt == expect} "
                    f"driver_rss {rss0:.0f} -> {rss1:.0f} MB "
                    f"(delta {rss1 - rss0:+.0f} MB)"
                )
            DM.DV_RUN_JOIN_MAX = default_budget
    finally:
        DM.DV_RUN_JOIN_MAX = default_budget
        shutil.rmtree(work, ignore_errors=True)


def stress_rowtracking_mor(spark, rows: int = 10_000_000) -> None:
    """Row tracking + merge-on-read CDF at the 10M-row decade:

    1. id-resolving read (`read_delta_with_row_ids`) vs the plain read —
       the id path adds one broadcast of the per-file base table.
    2. a 50%-of-rows UPDATE on twin tables, one writing explicit change
       files, one with write_change_files=False — compare UPDATE wall,
       bytes under _change_data/, and the change-feed read wall; counts
       must match exactly. The MoR claim is: the write saves the full
       change-file amplification and the read pays one id-keyed join."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import read_delta
    from pos_dlt_spark.sources.delta_cdf import read_change_feed
    from pos_dlt_spark.sources.delta_rowtracking import read_delta_with_row_ids
    from pos_dlt_spark.sources.delta_writer import delta_update, write_delta
    from pos_dlt_spark.tables import scratch_dir

    def dir_bytes(p):
        if not os.path.isdir(p):
            return 0
        return sum(
            os.path.getsize(os.path.join(r, n))
            for r, _d, fs in os.walk(p)
            for n in fs
        )

    work = scratch_dir("delta_mor_")
    conf = {
        "delta.enableRowTracking": "true",
        "delta.enableChangeDataFeed": "true",
    }
    try:
        df = spark.range(rows).select(
            F.col("id"), (F.col("id") * 7 % 1000).alias("v")
        )
        tables = {}
        for name in ("explicit", "mor"):
            t = os.path.join(work, name)
            write_delta(df.repartition(16), t, configuration=conf)
            tables[name] = t

        # 1) id-resolving read vs plain read (on one of the twins)
        t0 = time.perf_counter()
        c_plain = read_delta(spark, tables["mor"]).count()
        w_plain = time.perf_counter() - t0
        rss0 = _vm_rss_mb()
        t0 = time.perf_counter()
        ids = read_delta_with_row_ids(spark, tables["mor"])
        c_ids = ids.count()
        w_ids = time.perf_counter() - t0
        rss1 = _vm_rss_mb()
        t0 = time.perf_counter()
        n_distinct = ids.agg(
            F.countDistinct("_row_id").alias("n")
        ).collect()[0]["n"]
        w_distinct = time.perf_counter() - t0
        print(
            f"rt_read rows={rows}: plain={w_plain:.2f}s ids={w_ids:.2f}s "
            f"(distinct-agg check {w_distinct:.2f}s) "
            f"ids_distinct={n_distinct} (expect {rows}) correct="
            f"{c_plain == c_ids == rows and n_distinct == rows} "
            f"driver_rss delta {rss1 - rss0:+.0f} MB", flush=True,
        )

        # 2) 50% UPDATE, explicit change files vs merge-on-read
        walls, cdbytes, feed = {}, {}, {}
        for name, wcf in (("explicit", True), ("mor", False)):
            t = tables[name]
            t0 = time.perf_counter()
            delta_update(
                spark, t, "id % 2 = 0", {"v": "v + 1"},
                write_change_files=wcf,
            )
            walls[name] = time.perf_counter() - t0
            cdbytes[name] = dir_bytes(os.path.join(t, "_change_data"))
            t0 = time.perf_counter()
            counts = dict(
                (r["_change_type"], r["n"])
                for r in read_change_feed(spark, t, start_version=1)
                .groupBy("_change_type").agg(F.count(F.lit(1)).alias("n"))
                .collect()
            )
            feed[name] = (time.perf_counter() - t0, counts)
        expect = {"update_preimage": rows // 2, "update_postimage": rows // 2}
        print(
            f"mor_update rows={rows} (50% updated): "
            f"explicit wall={walls['explicit']:.1f}s "
            f"change_data={cdbytes['explicit']/2**20:.1f} MB "
            f"feed_read={feed['explicit'][0]:.1f}s | "
            f"mor wall={walls['mor']:.1f}s "
            f"change_data={cdbytes['mor']/2**20:.1f} MB "
            f"feed_read={feed['mor'][0]:.1f}s | counts_match="
            f"{feed['explicit'][1] == feed['mor'][1] == expect}", flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_fsck_vacuum(spark, n_files: int = 1_000_000, dirs: int = 0) -> None:
    """VERDICT r06 #5 (and r08 #5 at 10M): delta_fsck and delta_vacuum
    at the N-file decade. Real (tiny) files on disk so the existence/
    size probes and the directory walk pay their true cost; 10k orphan
    files created BEFORE the last commit so vacuum has genuine work to
    find. ``dirs>0`` spreads files over that many subdirectories — the
    realistic shape of a table this large, and what the executor-side
    vacuum walk parallelizes over (a FLAT 10M-file directory degrades to
    one listing task by design). Reports wall + driver RSS for fsck,
    vacuum dry-run, and the real vacuum."""
    from pyspark.sql.types import LongType, StructField, StructType

    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources.delta import delta_snapshot
    from pos_dlt_spark.sources.delta_check import delta_fsck
    from pos_dlt_spark.sources.delta_writer import delta_vacuum
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_fsckvac_")
    try:
        t = os.path.join(work, "big")
        os.makedirs(t, exist_ok=True)
        per_commit = 1000
        n_commits = n_files // per_commit
        payload = b"01234567"
        stats = json.dumps(
            {"numRecords": 1000, "minValues": {"k": 0}, "maxValues": {"k": 999}}
        )
        schema = StructType([StructField("k", LongType())])
        t0 = time.perf_counter()
        def sub(c: int) -> str:
            return f"d{c % dirs}/" if dirs else ""

        for d in range(dirs):
            os.makedirs(os.path.join(t, f"d{d}"), exist_ok=True)
        for i in range(10_000):
            with open(
                os.path.join(t, sub(i).replace("/", os.sep) + f"orphan-{i}.parquet"),
                "wb",
            ) as fh:
                fh.write(payload)
        for c in range(n_commits):
            names = [
                sub(c) + f"part-{c:05d}-{i:04d}.parquet" for i in range(per_commit)
            ]
            for n in names:
                with open(os.path.join(t, n.replace("/", os.sep)), "wb") as fh:
                    fh.write(payload)
            actions = []
            if c == 0:
                actions += [fx.protocol_action(), fx.metadata_action(schema)]
            actions += [
                fx.add_action(n, size=len(payload), stats=stats) for n in names
            ]
            fx.write_commit(t, c, actions)
        build = time.perf_counter() - t0
        # checkpoint so the LATEST fold rides the columnar path; the JSON
        # chain stays so older-version folds (vacuum's referenced set)
        # remain reconstructable — exactly a long-lived table's shape
        snap = delta_snapshot(spark, t)
        fx.write_checkpoint(
            t, n_commits - 1,
            [fx.protocol_action(), fx.metadata_action(schema)]
            + [{"add": dict(a)} for a in snap.adds.values()],
        )
        print(f"fsckvac: built {n_files} live + 10k orphan files in {build:.0f}s")

        rss0 = _vm_rss_mb()
        t0 = time.perf_counter()
        findings = delta_fsck(spark, t)
        fsck_wall = time.perf_counter() - t0
        rss1 = _vm_rss_mb()
        print(
            f"fsck n_files={n_files}: wall={fsck_wall:.1f}s findings={len(findings)} "
            f"driver_rss {rss0:.0f} -> {rss1:.0f} MB (delta {rss1 - rss0:+.0f} MB)"
        )

        rss0 = _vm_rss_mb()
        t0 = time.perf_counter()
        would = delta_vacuum(spark, t, retain_versions=1, dry_run=True)
        dry_wall = time.perf_counter() - t0
        rss1 = _vm_rss_mb()
        t0 = time.perf_counter()
        gone = delta_vacuum(spark, t, retain_versions=1)
        real_wall = time.perf_counter() - t0
        ok = len(would) == 10_000 and sorted(would) == sorted(gone)
        print(
            f"vacuum n_files={n_files}: dry_run={dry_wall:.1f}s real={real_wall:.1f}s "
            f"deletable={len(would)} (expect 10000) match={ok} "
            f"driver_rss {rss0:.0f} -> {rss1:.0f} MB (delta {rss1 - rss0:+.0f} MB)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_incremental_cluster(spark, rows: int = 20_000_000) -> None:
    """VERDICT r07 #1 done-criterion: OPTIMIZE -> append 10% -> OPTIMIZE.
    The second bare OPTIMIZE on a clustered table must rewrite only the
    appended slice (incremental, ZCube-stamped), with the selective-
    predicate skip ratio preserved across the stamped cubes."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import delta_snapshot, skip_files
    from pos_dlt_spark.sources.delta_writer import delta_optimize, write_delta
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_incrcluster_")
    try:
        table = os.path.join(work, "t")

        def band(lo, n):
            # v scattered by Knuth hash: initial layout unskippable
            return spark.range(lo, lo + n).select(
                F.col("id").alias("k"),
                ((F.col("id") * 2654435761) % 100_000).alias("v"),
                F.concat(F.lit("p"), F.col("id") % 977).alias("s"),
            )

        write_delta(band(0, rows).repartition(64), table, cluster_by=["v", "k"])
        snap0 = delta_snapshot(spark, table)
        _, sk0 = skip_files(snap0, [("v", "<", 1000)])
        print(f"[incrcluster] base: {len(snap0.files)} files, skip(v<1000)={sk0}/{len(snap0.files)}")

        t0 = time.perf_counter()
        delta_optimize(spark, table, target_files=64)
        t_full = time.perf_counter() - t0
        snap1 = delta_snapshot(spark, table)
        cube1 = {rel for rel, _ in snap1.files}
        _, sk1 = skip_files(snap1, [("v", "<", 1000)])
        print(f"[incrcluster] OPTIMIZE#1 (all-new): {t_full:.1f}s, rewrote {len(snap0.files)} -> {len(snap1.files)} files, skip={sk1}/{len(snap1.files)}")

        # append 10%
        write_delta(band(rows, rows // 10).repartition(7), table)
        snap2 = delta_snapshot(spark, table)
        appended = {rel for rel, _ in snap2.files} - cube1
        print(f"[incrcluster] appended {len(appended)} files ({rows // 10} rows)")

        t0 = time.perf_counter()
        delta_optimize(spark, table, target_files=64)
        t_incr = time.perf_counter() - t0
        snap3 = delta_snapshot(spark, table)
        live3 = {rel for rel, _ in snap3.files}
        rewrote = [r for r in appended if r not in live3]
        untouched = cube1 <= live3
        _, sk3 = skip_files(snap3, [("v", "<", 1000)])
        new_files = live3 - cube1
        bytes_new = sum(snap3.adds[r]["size"] for r in new_files)
        bytes_all = sum(snap3.adds[r]["size"] for r in live3)
        print(
            f"[incrcluster] OPTIMIZE#2 (incremental): {t_incr:.1f}s, "
            f"rewrote {len(rewrote)}/{len(appended)} appended files, "
            f"prior cube untouched={untouched}, "
            f"new-cube bytes {bytes_new / 1e6:.0f}MB / table {bytes_all / 1e6:.0f}MB "
            f"({100 * bytes_new / bytes_all:.0f}%), skip={sk3}/{len(live3)}"
        )
        t0 = time.perf_counter()
        v_noop = delta_optimize(spark, table, target_files=64)
        t_noop = time.perf_counter() - t0
        print(
            f"[incrcluster] OPTIMIZE#3 (steady state): {t_noop:.2f}s, "
            f"no-op={v_noop == snap3.version}"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_dv_update(spark, rows: int = 20_000_000) -> None:
    """Merge-on-read UPDATE decade: update 0.1% of rows scattered across
    EVERY file of a 20M-row table, mode='dv' vs mode='rewrite' twins —
    the bytes-written asymmetry is the whole point (narrow updates over
    huge files should write bitmaps + changed rows, not re-copies of
    every touched file)."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import delta_snapshot, read_delta
    from pos_dlt_spark.sources.delta_writer import delta_update, write_delta
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_dvupd_")
    try:
        def build(t):
            write_delta(
                spark.range(rows).select(
                    F.col("id").alias("k"),
                    (F.col("id") % 997).alias("v"),
                    F.concat(F.lit("payload-"), F.col("id")).alias("s"),
                ).repartition(32),
                t,
            )

        def dir_bytes(t):
            n = 0
            for root, _d, fs in os.walk(t):
                if "_delta_log" in root:
                    continue
                n += sum(os.path.getsize(os.path.join(root, f)) for f in fs)
            return n

        results = {}
        for mode in ("dv", "rewrite"):
            t = os.path.join(work, mode)
            build(t)
            b0 = dir_bytes(t)
            t0 = time.perf_counter()
            v, n = delta_update(
                spark, t, "k % 1000 = 7", {"s": "concat(s, '!')"}, mode=mode
            )
            wall = time.perf_counter() - t0
            wrote = dir_bytes(t) - b0 if mode == "dv" else None
            if mode == "rewrite":
                # rewrite leaves old files on disk until vacuum; count
                # the NEW live bytes written by the commit
                snap = delta_snapshot(spark, t)
                import json as _json
                with open(os.path.join(t, "_delta_log", f"{v:020d}.json")) as fh:
                    acts = [_json.loads(l) for l in fh]
                wrote = sum(
                    a["add"]["size"] for a in acts if "add" in a
                )
            t0 = time.perf_counter()
            got = read_delta(spark, t).filter("s LIKE '%!'").count()
            read_wall = time.perf_counter() - t0
            assert got == n, (got, n)
            results[mode] = (wall, wrote, read_wall, n)
            print(
                f"[dvupdate] mode={mode}: updated {n} rows in {wall:.1f}s, "
                f"bytes written {wrote / 1e6:.1f} MB, "
                f"post-update filtered read {read_wall:.1f}s"
            )
        dvw, rww = results["dv"][1], results["rewrite"][1]
        print(
            f"[dvupdate] write amplification rewrite/dv = {rww / max(dvw, 1):.0f}x "
            f"({rww / 1e6:.0f} MB vs {dvw / 1e6:.1f} MB)"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def stress_v2_checkpoint(spark, n_files: int = 1_000_000) -> None:
    """Round-9: checkpoint write amplification at the 1M-add decade.
    Classic checkpoints (and a FIRST v2 checkpoint) materialize every
    add; an INCREMENTAL v2 checkpoint after a 1% append window should
    rewrite ~1% of the sidecar bytes and reuse the rest. Reports wall,
    driver RSS, bytes written, and sidecar reuse counts."""
    from pyspark.sql.types import LongType, StructField, StructType

    from pos_dlt_spark.sources import delta_fixture as fx
    from pos_dlt_spark.sources import delta_writer as dw
    from pos_dlt_spark.tables import scratch_dir

    work = scratch_dir("delta_v2ckpt_")
    try:
        t = os.path.join(work, "big")
        os.makedirs(t, exist_ok=True)
        log_dir = os.path.join(t, "_delta_log")
        per_commit = 1000
        n_commits = n_files // per_commit
        stats = json.dumps(
            {"numRecords": 1000, "minValues": {"k": 0}, "maxValues": {"k": 999}}
        )
        schema = StructType([StructField("k", LongType())])
        for c in range(n_commits):
            actions = []
            if c == 0:
                actions += [fx.protocol_action(), fx.metadata_action(schema)]
            actions += [
                fx.add_action(f"part-{c:05d}-{i:04d}.parquet", size=8, stats=stats)
                for i in range(per_commit)
            ]
            fx.write_commit(t, c, actions)
        v = n_commits - 1

        def log_bytes() -> int:
            total = 0
            for root, _d, files in os.walk(log_dir):
                for n in files:
                    total += os.path.getsize(os.path.join(root, n))
            return total

        def run(label: str, fmt: str, version: int) -> None:
            b0, r0 = log_bytes(), _vm_rss_mb()
            t0 = time.perf_counter()
            dw._maybe_checkpoint(spark, t, version, version, fmt)
            wall = time.perf_counter() - t0
            print(
                f"v2ckpt {label}: wall={wall:.1f}s wrote={(log_bytes() - b0) / 1e6:.1f} MB "
                f"driver_rss {r0:.0f} -> {_vm_rss_mb():.0f} MB"
            )

        # classic and v2 land at ADJACENT versions: a shared version
        # would make the fold read both checkpoint layouts (duplicate
        # add blocks), a shape no real single-format table has
        run("classic full", "classic", v - 1)
        run("v2 first (full spread)", "v2", v)
        # 1% churn window: 10 commits x 1000 fresh adds
        for c in range(n_commits, n_commits + 10):
            fx.write_commit(
                t,
                c,
                [
                    fx.add_action(f"part-{c:05d}-{i:04d}.parquet", size=8, stats=stats)
                    for i in range(per_commit)
                ],
            )
        run("v2 incremental (1% append window)", "v2", n_commits + 9)
        import pyarrow.parquet as pq

        from pos_dlt_spark.sources.delta import _CKPT_V2_RE, _list_log

        _, ckpts = _list_log(log_dir)
        newest = max(v2 for v2 in ckpts)
        manifest = next(
            p for p in ckpts[newest]
            if _CKPT_V2_RE.match(os.path.basename(p))
        )
        rows = pq.read_table(manifest, columns=["sidecar"]).to_pylist()
        names = [r["sidecar"]["path"] for r in rows if r.get("sidecar") and r["sidecar"].get("path")]
        sc_dir = os.path.join(log_dir, "_sidecars")
        mtimes = sorted(os.path.getmtime(os.path.join(sc_dir, n)) for n in names)
        # sidecars written in the FIRST spread predate the incremental
        # run; count how many the newest manifest reuses
        from pos_dlt_spark.sources.delta import delta_snapshot

        snap = delta_snapshot(spark, t)
        print(
            f"v2ckpt reuse: manifest references {len(names)} sidecars, "
            f"mtime spread {mtimes[-1] - mtimes[0]:.1f}s (old=reused); "
            f"fold sees {len(snap.files)} files (expect {n_files + 10_000})"
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    n_files = 1_000_000
    if "--files" in sys.argv:
        n_files = int(sys.argv[sys.argv.index("--files") + 1])
    spark = build_session()
    if which in ("fold", "all"):
        stress_fold(spark, n_files)
    if which in ("merge", "all"):
        stress_merge(spark)
    if which in ("delete", "all"):
        stress_delete(spark)
    if which in ("dvread", "all"):
        stress_dv_read(spark)
    if which in ("dvpaths", "all"):
        stress_dv_paths(spark)
    if which in ("fsckvac", "all"):
        dirs = 0
        if "--dirs" in sys.argv:
            dirs = int(sys.argv[sys.argv.index("--dirs") + 1])
        stress_fsck_vacuum(spark, n_files, dirs=dirs)
    if which in ("mor", "all"):
        stress_rowtracking_mor(spark)
    if which in ("incrcluster", "all"):
        stress_incremental_cluster(spark)
    if which in ("dvupdate", "all"):
        stress_dv_update(spark)
    if which in ("v2ckpt", "all"):
        stress_v2_checkpoint(spark, n_files)


if __name__ == "__main__":
    main()
