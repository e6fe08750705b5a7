"""Basic Delta Lake WRITER from the public transaction protocol —
append / overwrite commits with per-file column stats and optimistic
concurrency on a local/POSIX filesystem.

Scope and honesty boundary:

- **Commit atomicity = atomic put-if-absent of the next
  ``_delta_log/N.json``.** POSIX ``open(O_CREAT|O_EXCL)`` provides
  exactly the "mutual exclusion on the version file" primitive the
  protocol requires, so concurrent writers on one filesystem race
  safely: the loser re-reads the log and retries at the next version.
  Object stores WITHOUT put-if-absent (plain S3) need an external
  LogStore coordination service — that layer is out of scope here and
  loudly documented, exactly as delta-rs/delta-spark document theirs.
- Conflict resolution is APPEND-level: a lost race re-commits blind
  appends (always safe — no row can conflict); a lost OVERWRITE race
  aborts with :class:`DeltaCommitConflict` rather than guessing
  (serializable-overwrite reconciliation is a real writer's hardest
  feature and pretending otherwise would corrupt tables).
- Data files are written by an ordinary distributed
  ``df.write.parquet`` into the table directory under unique names;
  per-file stats (numRecords / minValues / maxValues / nullCount for
  leaf columns the skipping reader understands) come from the parquet
  FOOTERS via pyarrow on the driver — metadata-bounded, same cost class
  as the log fold.
- Checkpointing: every ``checkpoint_interval`` commits a classic
  single-file checkpoint parquet + ``_last_checkpoint`` is written, so
  long-lived tables fold from the checkpoint, not the full JSON chain.

Together with :mod:`pos_dlt_spark.sources.delta` this gives round-trip
Delta interop (write here, read there — or by any protocol-conformant
reader) without the delta-spark dependency.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame

from pos_dlt_spark.sources import delta_fixture as fx
from pos_dlt_spark.sources.delta import DeltaSnapshot, delta_snapshot


class DeltaCommitConflict(Exception):
    """A concurrent commit won the version race and the operation cannot
    be safely replayed (overwrite); the caller decides what to do."""


def _file_stats(path: str) -> str:
    """Per-file column stats from the parquet footer (driver-side, one
    footer read per file): numRecords + min/max/nullCount for leaf
    columns with primitive types. Strings are truncated to 32 chars for
    min (protocol writers bound stats size); truncated max values are
    DROPPED rather than emitted wrong (a truncated max underestimates)."""
    import pyarrow.parquet as pq

    md = pq.read_metadata(path)
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: skip (reader skips them too)
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode("utf-8"), mx.decode("utf-8")
                except UnicodeDecodeError:
                    continue
            if isinstance(mn, str) and len(mn) > 32:
                mn = mn[:32]
            if isinstance(mx, str) and len(mx) > 32:
                mx = None  # cannot truncate a max safely
            cur_mn = mins.get(name)
            mins[name] = mn if cur_mn is None or (mn is not None and mn < cur_mn) else cur_mn
            cur_mx = maxs.get(name)
            if mx is not None:
                maxs[name] = mx if cur_mx is None or mx > cur_mx else cur_mx
            if st.null_count is not None:
                nulls[name] = nulls.get(name, 0) + st.null_count

    def _js(v):
        import datetime

        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat()
        return v

    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": {k: _js(v) for k, v in mins.items() if v is not None},
            "maxValues": {k: _js(v) for k, v in maxs.items() if v is not None},
            "nullCount": nulls,
        }
    )


def _try_commit(log_dir: str, version: int, actions: list[dict]) -> bool:
    """Atomic put-if-absent of version.json (POSIX O_EXCL). False if a
    concurrent writer owns this version."""
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    try:
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY, 0o644)
    except FileExistsError:
        return False
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as fh:
            for a in actions:
                fh.write(json.dumps(a) + "\n")
            fh.flush()
            os.fsync(fh.fileno())
        return True
    except BaseException:
        os.unlink(path)
        raise


def _stage_and_move(df: DataFrame, path: str, partition_by: list[str] | None):
    """Distributed write into a staging dir, then rename into the table
    root (Hive-style ``col=value/`` subdirs when partitioned — the layout
    Delta writers produce and the reader's single-scan fast path expects)
    under fresh unique names. Returns add actions with partitionValues
    parsed back from the directory segments."""
    from urllib.parse import unquote

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
    w = df.write
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(staging)
    adds = []
    for root, _dirs, files in os.walk(staging):
        for n in sorted(files):
            if not n.endswith(".parquet"):
                continue
            sub = os.path.relpath(root, staging)
            segs = [] if sub == "." else sub.split(os.sep)
            pvals: dict[str, str | None] = {}
            for seg in segs:
                k, _, v = seg.partition("=")
                pvals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
            rel_dir = "/".join(segs)
            rel = (rel_dir + "/" if rel_dir else "") + f"part-{uuid.uuid4().hex}.parquet"
            dest = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(os.path.join(root, n), dest)
            adds.append(
                fx.add_action(
                    rel,
                    size=os.path.getsize(dest),
                    partition_values=pvals or None,
                    stats=_file_stats(dest),
                )
            )
    import shutil

    shutil.rmtree(staging, ignore_errors=True)
    return adds


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    max_retries: int = 20,
) -> int:
    """Write ``df`` to the Delta table at ``path`` (created if absent).
    Returns the committed version.

    ``mode='append'`` adds files; on a lost commit race it retries at the
    next version (blind appends never conflict). ``mode='overwrite'``
    removes every live file and adds the new ones; a lost race raises
    :class:`DeltaCommitConflict`. Schema: first commit pins the
    DataFrame's schema in metaData (and ``partition_by`` as the table's
    partitionColumns); appends require an identical schema and must not
    change the partitioning (fail-fast — evolution is the reader's job
    on old files, the writer's job is to not drift silently)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    spark = df.sparkSession
    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir) and any(
        n.endswith(".json") or n.endswith(".parquet") for n in os.listdir(log_dir)
    )
    adds = _stage_and_move(df, path, partition_by)

    # 2. commit loop (optimistic concurrency)
    for _ in range(max_retries):
        if exists:
            snap: DeltaSnapshot | None = delta_snapshot(spark, path)
            version = snap.version + 1
            # names + types, nullability excluded: file sources surface
            # everything nullable, so a strict equality would flag every
            # append of a computed (non-null) column as drift
            if sorted(
                [(f.name, f.dataType) for f in snap.schema.fields]
            ) != sorted([(f.name, f.dataType) for f in df.schema.fields]):
                raise ValueError(
                    "schema drift: table "
                    f"{[f.name for f in snap.schema.fields]} vs dataframe "
                    f"{[f.name for f in df.schema.fields]} — writer refuses "
                    "silent evolution"
                )
            if list(partition_by or []) != list(snap.partition_columns):
                raise ValueError(
                    f"partitioning drift: table {snap.partition_columns} vs "
                    f"write {partition_by or []}"
                )
            actions = list(adds)
            if mode == "overwrite":
                actions = [fx.remove_action(rel) for rel, _ in snap.files] + actions
        else:
            snap, version = None, 0
            actions = [
                fx.protocol_action(),
                fx.metadata_action(df.schema, partition_columns=list(partition_by or [])),
            ] + list(adds)

        if _try_commit(log_dir, version, actions):
            if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
                final = delta_snapshot(spark, path, version)
                fx.write_checkpoint(
                    path,
                    version,
                    [fx.protocol_action(), fx.metadata_action(final.schema)]
                    + [{"add": a} for a in final.adds.values()],
                )
            return version
        # lost the race
        if mode == "overwrite":
            raise DeltaCommitConflict(
                f"version {version} was committed concurrently; overwrite "
                "cannot be replayed safely"
            )
        exists = True  # re-fold and retry the append at the next version
    raise DeltaCommitConflict(f"gave up after {max_retries} commit races")


def delta_merge(
    spark,
    path: str,
    updates: DataFrame,
    keys: list[str],
    sequence_by: str,
    tiebreakers: list[str] | None = None,
) -> int:
    """Latest-per-key MERGE (upsert) into a Delta table — the operation
    the reference's CDC rides (`03_Bronze-to-Silver ETL.py:379-384`,
    Delta MERGE), rebuilt on the protocol primitives:

    1. **File pruning from log stats**: only files whose per-file
       min/max on ``keys[0]`` can overlap the update batch's key range
       are TOUCHED; provably-disjoint files are never read or rewritten
       (the same skipping machinery reads use). Conservative: files
       without stats are touched.
    2. Touched rows ∪ updates go through one latest-per-key window
       (``sequence_by`` DESC + tiebreakers — out-of-order updates LOSE
       to newer rows already in the table, so replays are idempotent),
       new files are written distributed, and the commit is one atomic
       remove(touched)+add(new) JSON — readers see the old or the new
       snapshot, never a mix.
    3. A lost commit race aborts with :class:`DeltaCommitConflict`
       (merge result depends on the base snapshot; blind replay could
       resurrect overwritten rows — the caller re-runs against the new
       snapshot).

    Keys absent from the table INSERT; keys present UPDATE (newest
    sequence wins). Precondition: the table's live rows are unique per
    key (the invariant every merge commit preserves; the window dedups
    a violated precondition too, keeping the newest row).

    Returns the committed version."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import _abs_file

    tiebreakers = list(tiebreakers or [])
    snap = delta_snapshot(spark, path)
    if not set(keys + [sequence_by] + tiebreakers) <= {f.name for f in snap.schema.fields}:
        raise ValueError("merge keys/sequence columns missing from table schema")

    if updates.limit(1).count() == 0:
        return snap.version  # empty update batch: nothing to commit

    # EXACT per-file pruning, not the update batch's min/max hull: a
    # single insert at the top of the keyspace would widen the hull over
    # every file (measured: 95/100 files touched where 3 suffice). Build
    # the per-file [min, max] table from the log stats, broadcast it
    # against the DISTINCT update keys with a BETWEEN join, and collect
    # the touched file ids — driver cost bounded by FILE COUNT. Files
    # without usable stats are always touched (conservative). At
    # 1M-files x 1B-keys scale, swap the broadcast BETWEEN join for the
    # bucketized interval join (operators/rangejoin.py) — same result.
    if keys[0] in snap.partition_columns:
        # partition-keyed merge: the EXACT touched set comes straight
        # from the log's partitionValues (files never store the column,
        # so footer stats cannot help here). Distinct update partition
        # values collect bounded by the batch's partition spread.
        vals = {
            r["__p"]
            for r in updates.select(
                F.col(keys[0]).cast("string").alias("__p")
            ).distinct().collect()
        }
        touched = [rel for rel, pv in snap.files if pv.get(keys[0]) in vals]
        ranges = []
    else:
        ranges = []
        touched_always = []
        for rel, _pv in snap.files:
            raw = snap.adds.get(rel, {}).get("stats")
            try:
                st = json.loads(raw) if isinstance(raw, str) else (raw or {})
                lo = (st.get("minValues") or {}).get(keys[0])
                hi = (st.get("maxValues") or {}).get(keys[0])
            except (TypeError, ValueError):
                lo = hi = None
            if lo is None or hi is None:
                touched_always.append(rel)
            else:
                ranges.append((rel, lo, hi))
        touched = list(touched_always)
    if ranges:
        try:
            from pos_dlt_spark.tables import local_df

            kt = updates.select(F.col(keys[0]).alias("__k")).distinct()
            key_type = dict(
                (f.name, f.dataType.simpleString()) for f in snap.schema.fields
            )[keys[0]]
            rng = local_df(
                spark, ranges, f"__rel string, __lo {key_type}, __hi {key_type}"
            )
            hit = (
                kt.join(
                    F.broadcast(rng),
                    (F.col("__k") >= F.col("__lo")) & (F.col("__k") <= F.col("__hi")),
                )
                .select("__rel")
                .distinct()
                .collect()
            )
            touched += [r["__rel"] for r in hit]
        except Exception:
            # pruning is an optimization, never a correctness dependency:
            # a key type whose JSON stats rendering does not round-trip
            # into the column type (exotic timestamps, decimals beyond
            # pandas) falls back to touching every stat-ful file
            touched += [rel for rel, _lo, _hi in ranges]

    cols = [f.name for f in snap.schema.fields]
    # cast the update batch to the TABLE's column types (update batches
    # often arrive widened, e.g. int64 from pandas against an int
    # column; writing them as-is would poison the files against the
    # pinned log schema). ANSI mode errors on lossy casts.
    tbl_types = {f.name: f.dataType for f in snap.schema.fields}
    updates = updates.select(
        *[F.col(n).cast(tbl_types[n]).alias(n) for n in cols]
    )
    if touched:
        if snap.partition_columns:
            # partitioned tables: data files lack the partition columns —
            # re-attach each touched file group's partitionValues as
            # typed literals (the read_delta fallback shape)
            types = {f.name: f.dataType for f in snap.schema.fields}
            pv_by_rel = dict(snap.files)
            groups: dict[tuple, list[str]] = {}
            for rel in touched:
                k = tuple(pv_by_rel[rel].get(c) for c in snap.partition_columns)
                groups.setdefault(k, []).append(_abs_file(path, rel))
            parts = []
            for k, fpaths in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
                d = spark.read.schema(snap.data_schema).parquet(*fpaths)
                for c, v in zip(snap.partition_columns, k):
                    lit = F.lit(None) if v is None else F.lit(v)
                    d = d.withColumn(c, lit.cast(types[c]))
                parts.append(d.select(*cols))
            old = parts[0]
            for d in parts[1:]:
                old = old.unionByName(d)
        else:
            old = spark.read.schema(snap.schema).parquet(
                *[_abs_file(path, rel) for rel in touched]
            )
        merged_in = old.unionByName(updates.select(*cols))
    else:
        merged_in = updates.select(*cols)
    order = [F.col(sequence_by).desc()] + [F.col(t).desc() for t in tiebreakers]
    w = Window.partitionBy(*keys).orderBy(*order)
    merged = (
        merged_in.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    adds = _stage_and_move(merged, path, snap.partition_columns or None)

    actions = [fx.remove_action(rel) for rel in touched] + adds
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(
            f"version {version} was committed concurrently; merge must "
            "re-run against the new snapshot"
        )
    return version


def delta_optimize(spark, path: str, target_files: int = 1) -> int:
    """OPTIMIZE (bin-pack compaction): rewrite each PARTITION's live
    files into at most ``target_files`` larger files (one group for an
    unpartitioned table; compaction never crosses a partition boundary)
    and commit remove(old)+add(new) with
    ``dataChange: false`` — the protocol's marker that no ROWS changed,
    so streaming replays (:func:`pos_dlt_spark.sources.delta.replay_adds`)
    skip the rewrite and batch readers see identical content in fewer,
    bigger files (the small-files problem is the single most common
    operational Delta chore). A lost commit race aborts — re-run against
    the new snapshot; compaction is always safe to retry.

    Returns the committed version."""
    snap = delta_snapshot(spark, path)
    from pos_dlt_spark.sources.delta import _abs_file

    # group live files per partition tuple (one group, (), when the
    # table is unpartitioned); compaction never crosses a partition
    # boundary — each group with more files than the target is rewritten
    # within its own directory, everything else is untouched.
    groups: dict[tuple, list[str]] = {}
    pv_by_group: dict[tuple, dict] = {}
    for rel, pv in snap.files:
        k = tuple(pv.get(c) for c in snap.partition_columns)
        groups.setdefault(k, []).append(rel)
        pv_by_group[k] = pv
    removes: list[str] = []
    adds: list[dict] = []
    import shutil

    for k, rels in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        if len(rels) <= target_files:
            continue
        data = spark.read.schema(snap.data_schema).parquet(
            *[_abs_file(path, rel) for rel in rels]
        )
        staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
        data.coalesce(target_files).write.parquet(staging)
        rel_dir = "/".join(
            f"{c}={'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
            for c, v in zip(snap.partition_columns, k)
        )
        for n in sorted(os.listdir(staging)):
            if not n.endswith(".parquet"):
                continue
            rel = (rel_dir + "/" if rel_dir else "") + f"part-{uuid.uuid4().hex}.parquet"
            dest = os.path.join(path, rel)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            os.replace(os.path.join(staging, n), dest)
            adds.append(
                fx.add_action(
                    rel,
                    size=os.path.getsize(dest),
                    partition_values=pv_by_group[k] or None,
                    stats=_file_stats(dest),
                    dataChange=False,
                )
            )
        shutil.rmtree(staging, ignore_errors=True)
        removes += rels
    if not removes:
        return snap.version
    actions = [fx.remove_action(rel) for rel in removes] + adds
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(f"version {version} committed concurrently; re-run optimize")
    return version


def delta_vacuum(spark, path: str, retain_versions: int = 1) -> list[str]:
    """VACUUM: physically delete data files referenced by NO retained
    snapshot (the live sets of the last ``retain_versions + 1``
    versions). Time travel to vacuumed versions then fails on read —
    delta's own retention semantics, by version count here instead of
    tombstone age (deterministic for tests; both are policies over the
    same referenced-set computation). Never touches ``_delta_log``.

    Returns the deleted relative paths."""
    latest = delta_snapshot(spark, path)
    keep_versions = range(max(0, latest.version - retain_versions), latest.version + 1)
    referenced: set[str] = set()
    for v in keep_versions:
        try:
            s = delta_snapshot(spark, path, v)
        except FileNotFoundError:
            continue  # pre-checkpoint version already unreconstructable
        referenced.update(rel for rel, _ in s.files)
    deleted = []
    for root, dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        parts = [] if rel_root == "." else rel_root.split(os.sep)
        if any(p == "_delta_log" or p.startswith("_staging") for p in parts):
            continue
        for n in files:
            if not n.endswith(".parquet"):
                continue
            full = os.path.join(root, n)
            rel = os.path.relpath(full, path)
            if rel not in referenced:
                os.remove(full)
                deleted.append(rel)
    return deleted
