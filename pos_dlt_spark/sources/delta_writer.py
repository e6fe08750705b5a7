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


class DeltaConstraintViolation(Exception):
    """>= 1 written row violates a ``delta.constraints.*`` CHECK
    constraint; nothing was committed."""


def _append_only(conf: dict[str, str]) -> bool:
    return (conf.get("delta.appendOnly") or "").lower() == "true"


def _table_constraints(conf: dict[str, str]) -> dict[str, str]:
    pre = "delta.constraints."
    return {k[len(pre):]: v for k, v in conf.items() if k.startswith(pre)}


def _constrained(df: DataFrame, conf: dict[str, str]):
    """Attach per-constraint violation counters to the write job
    (``DataFrame.observe`` — an AggregatingAccumulator on the already-
    running plan, zero extra scans) and return (df, check). ``check()``
    raises :class:`DeltaConstraintViolation` after the job when any
    written row violated a CHECK constraint — a row violates when the
    expression is false OR null, the protocol's CHECK semantics."""
    cons = _table_constraints(conf)
    if not cons:
        return df, None
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    obs = Observation()
    aggs = [
        F.sum(F.when(F.expr(expr), 0).otherwise(1)).cast("bigint").alias(name)
        for name, expr in cons.items()
    ]
    df = df.observe(obs, *aggs)

    def check() -> None:
        bad = {
            name: int(obs.get[name] or 0)
            for name in cons
            if int(obs.get[name] or 0) > 0
        }
        if bad:
            raise DeltaConstraintViolation(
                f"CHECK constraint(s) violated (rows): {bad}; "
                f"definitions: { {n: cons[n] for n in bad} }"
            )

    return df, check


def _generation_exprs(schema) -> dict[str, str]:
    """GENERATED COLUMNS (protocol "Generated Columns"): schema-field
    metadata key ``delta.generationExpression`` holds a SQL expression;
    writers must ensure the column's values equal it."""
    out: dict[str, str] = {}
    for f in schema.fields:
        md = f.metadata or {}
        if "delta.generationExpression" in md:
            out[f.name] = md["delta.generationExpression"]
    return out


def _generated(df: DataFrame, schema, exempt_col: str | None = None):
    """Enforce the table's generated columns on a frame about to stage:
    a MISSING generated column is COMPUTED from its expression (the
    common writer convenience — callers supply only the base columns);
    a PROVIDED one is VALIDATED row-by-row via ``DataFrame.observe`` on
    the already-running write job (null-safe equality, zero extra
    scans). Returns (df, check) — ``check()`` raises
    :class:`DeltaConstraintViolation` after the job when any row's
    provided value diverges from its expression (silently accepting it
    would break every reader that relies on the generation invariant
    for partition pruning)."""
    gens = _generation_exprs(schema)
    if not gens:
        return df, None
    from pyspark.sql import functions as F

    present = set(df.columns)
    to_check: dict[str, str] = {}
    for name, expr in gens.items():
        if name not in present:
            df = df.withColumn(name, F.expr(expr))
        else:
            to_check[name] = expr
    if not to_check:
        return df, None
    from pyspark.sql import Observation

    obs = Observation()
    # exempt_col (e.g. a merge's tombstone flag): rows it marks skip
    # validation — a DELETE event's payload columns are often null and
    # never reach the table anyway
    ok = (
        (lambda name, expr: F.col(f"`{name}`").eqNullSafe(F.expr(expr)))
        if exempt_col is None
        else (
            lambda name, expr: F.col(f"`{exempt_col}`")
            | F.col(f"`{name}`").eqNullSafe(F.expr(expr))
        )
    )
    aggs = [
        F.sum(F.when(ok(name, expr), 0).otherwise(1)).cast("bigint").alias(name)
        for name, expr in to_check.items()
    ]
    df = df.observe(obs, *aggs)

    def check() -> None:
        bad = {
            name: int(obs.get[name] or 0)
            for name in to_check
            if int(obs.get[name] or 0) > 0
        }
        if bad:
            raise DeltaConstraintViolation(
                f"generated column(s) violated (rows): {bad}; "
                f"expressions: { {n: to_check[n] for n in bad} }"
            )

    return df, check


def _merged_protocol(
    prior: dict | None,
    reader_features: tuple[str, ...] = (),
    writer_features: tuple[str, ...] = (),
) -> dict:
    """Protocol action carrying the UNION of the table's already-declared
    features and any newly required ones. Emitting only the new feature
    (or the bare default) would CLOBBER prior declarations — e.g. a
    checkpoint after a DV delete that re-declares (1,2) leaves DV files
    in use under a protocol that never mentions them, and spec-compliant
    readers may honor that by resurrecting the deleted rows."""
    p = dict(prior or {})
    rf = set(p.get("readerFeatures") or ()) | set(reader_features)
    wf = set(p.get("writerFeatures") or ()) | set(writer_features)
    out: dict = {
        "minReaderVersion": max(int(p.get("minReaderVersion") or 1), 3 if rf else 1),
        "minWriterVersion": max(int(p.get("minWriterVersion") or 2), 7 if (rf or wf) else 2),
    }
    if rf or wf:
        # version-3/7 tables must list EVERY feature in use; reader
        # features are writer features too per the table-features spec
        out["readerFeatures"] = sorted(rf)
        out["writerFeatures"] = sorted(wf | rf)
    return {"protocol": out}


def _writer_supports(snap: DeltaSnapshot) -> None:
    """Column-mapping writes: both 'name' and 'id' modes are SUPPORTED —
    'name' only needs logical->physical renames on the way out (files and
    partitionValues carry physical names; the logical schema lives in
    metaData), and 'id' additionally stamps the mapping's parquet field
    ids on every staged file (alias metadata ``parquet.field.id`` +
    ``spark.sql.parquet.fieldId.write.enabled``, Spark's native field-id
    emission) so id-mode readers resolve columns rename-proof. A table
    whose id mapping is INCOMPLETE (a column without a field id) still
    refuses: a file staged without ids silently resolves to all-null
    under id-mode reads elsewhere — loud refusal beats that. See
    :func:`_to_physical`."""
    if snap.column_mapping == "id":
        missing = [
            f.name for f in snap.schema.fields if f.name not in snap.field_ids
        ]
        if missing:
            from pos_dlt_spark.sources.delta import DeltaProtocolError

            raise DeltaProtocolError(
                "table uses column mapping 'id' but columns "
                f"{missing} carry no delta.columnMapping.id — a conformant "
                "write must stamp every column's parquet field id"
            )


def _to_physical(df: DataFrame, snap: DeltaSnapshot) -> DataFrame:
    """Rename a LOGICAL-named frame to the table's PHYSICAL column names
    for staging (no-op for mode 'none'). Data files of a column-mapping
    table must carry physical names — that is the mode's contract. When
    the mapping declares field ids they are stamped as alias metadata
    (``parquet.field.id``) and Spark's parquet writer emits them into
    the file schema (``spark.sql.parquet.fieldId.write.enabled``) — the
    id-mode read contract, harmless extra metadata under name mode."""
    if snap.column_mapping == "none":
        return df
    from pyspark.sql import functions as F

    if snap.field_ids:
        df.sparkSession.conf.set(
            "spark.sql.parquet.fieldId.write.enabled", "true"
        )
    return df.select(
        *[
            F.col(f"`{c}`").alias(
                snap.physical_names.get(c, c),
                metadata=(
                    {"parquet.field.id": snap.field_ids[c]}
                    if c in snap.field_ids
                    else {}
                ),
            )
            for c in df.columns
        ]
    )


def _physical_partition_by(snap: DeltaSnapshot) -> list[str] | None:
    """The table's partition columns under their PHYSICAL names — what
    partition directories and add.partitionValues keys must use."""
    if not snap.partition_columns:
        return None
    return [snap.physical_names.get(c, c) for c in snap.partition_columns]


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


def _maybe_checkpoint(
    spark, path: str, version: int, interval: int, fmt: str = "classic"
) -> None:
    """Write a checkpoint when ``version`` crosses the cadence — shared
    by EVERY committing operation (write/merge/delete/optimize/restore),
    so CDC-heavy tables whose commits are all merges still fold from a
    checkpoint instead of replaying an ever-growing JSON chain. The
    checkpoint REPLACES the JSON chain for later readers: its metaData
    must carry the full table identity (partitionColumns above all —
    folding [] here would make any post-checkpoint snapshot of a
    partitioned table read its partition column as all-null and flag
    every subsequent append as partitioning drift), and it carries the
    FOLDED protocol (plus v2Checkpoint when writing that format) — a
    narrower protocol here would undeclare features still in use
    (deletionVectors above all)."""
    if not interval or version <= 0 or version % interval != 0:
        return
    final = delta_snapshot(spark, path, version)
    ckpt_actions = (
        [
            _merged_protocol(
                final.protocol,
                *((("v2Checkpoint",), ("v2Checkpoint",))
                  if fmt == "v2" else ((), ())),
            ),
            fx.metadata_action(
                final.schema,
                partition_columns=final.partition_columns,
                table_id=final.table_id,
                configuration=final.configuration,
            ),
        ]
        + [fx.txn_action(a, v) for a, v in sorted(final.txns.items())]
        + [{"add": dict(a)} for a in final.adds.values()]
    )
    if fmt == "v2":
        fx.write_checkpoint_v2(path, version, ckpt_actions)
    else:
        # multi-part past 500k files — the layout real writers use so no
        # single checkpoint file balloons (the reader folds complete
        # part sets; an interrupted write leaves an incomplete set that
        # readers skip in favor of the previous checkpoint/JSON chain)
        parts = -(-len(final.files) // 500_000)
        fx.write_checkpoint(path, version, ckpt_actions, parts=max(1, parts))


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    max_retries: int = 20,
    precommit=None,
    txn: tuple[str, int] | None = None,
    configuration: dict[str, str] | None = None,
    checkpoint_format: str = "classic",
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
    on old files, the writer's job is to not drift silently).

    ``precommit`` (optional callable) runs AFTER the distributed write job
    (so ``DataFrame.observe`` metrics are populated) but BEFORE the commit:
    if it raises, the staged files are removed and no version is committed,
    leaving the previous snapshot untouched — Delta-native atomic abort
    (the pipeline's ``expect_or_fail`` rides this).

    ``txn=(app_id, version)`` makes the write IDEMPOTENT via the protocol's
    SetTransaction action: if the table has already committed this appId at
    or beyond this version, the call is a no-op (returns the current table
    version, writes nothing) — exactly-once micro-batch appends under
    foreachBatch replay, the same mechanism delta's own streaming sink
    uses. The watermark survives checkpoints.

    ``configuration`` (creation only) sets the table properties in
    metaData. Two are ENFORCED as the protocol obliges writers to:
    ``delta.appendOnly='true'`` refuses any data-changing remove
    (overwrite/merge/delete); ``delta.constraints.<name>='<sql expr>'``
    CHECK constraints are validated on every written row (violation
    counts ride the staging write job via observe — zero extra scans)
    and a violation aborts before any commit.

    ``checkpoint_format='v2'`` writes V2 checkpoints (uuid manifest +
    sidecars, with the v2Checkpoint feature declared) instead of classic
    single-file ones — the layout modern delta-spark produces; both fold
    identically through this reader."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    if checkpoint_format not in ("classic", "v2"):
        raise ValueError(f"checkpoint_format must be classic|v2, got {checkpoint_format!r}")
    spark = df.sparkSession
    log_dir = os.path.join(path, "_delta_log")
    exists = os.path.isdir(log_dir) and any(
        n.endswith(".json") or n.endswith(".parquet") for n in os.listdir(log_dir)
    )
    if exists and configuration is not None:
        raise ValueError("configuration is set at table creation only")
    conf = configuration or {}
    prior: DeltaSnapshot | None = None
    created_schema = df.schema
    cm_new = None  # minted mapping for a CREATE with column mapping on
    if not exists and (conf.get("delta.columnMapping.mode") or "none") != "none":
        from types import SimpleNamespace

        from pyspark.sql.types import StructField, StructType

        cm_mode = conf["delta.columnMapping.mode"]
        if cm_mode not in ("name", "id"):
            from pos_dlt_spark.sources.delta import DeltaProtocolError

            raise DeltaProtocolError(
                f"column mapping mode {cm_mode!r} not supported"
            )
        # mint the mapping like delta's CREATE does: a fresh physical
        # name (col-<uuid>) and field id per column; data files carry
        # the physical names (+ parquet field ids) from the first write
        fields, pns, fids = [], {}, {}
        for i, f in enumerate(df.schema.fields):
            md = dict(f.metadata or {})
            md["delta.columnMapping.id"] = i + 1
            md["delta.columnMapping.physicalName"] = f"col-{uuid.uuid4()}"
            pns[f.name], fids[f.name] = md["delta.columnMapping.physicalName"], i + 1
            fields.append(StructField(f.name, f.dataType, f.nullable, md))
        created_schema = StructType(fields)
        conf = dict(conf)
        conf["delta.columnMapping.maxColumnId"] = str(len(fields))
        cm_new = SimpleNamespace(
            column_mapping=cm_mode,
            physical_names=pns,
            field_ids=fids,
            partition_columns=list(partition_by or []),
        )
    if exists:
        prior = delta_snapshot(spark, path)
        _writer_supports(prior)
        conf = prior.configuration
        if txn is not None and prior.txns.get(txn[0], -1) >= txn[1]:
            return prior.version  # already committed: replay skipped
        if mode == "overwrite" and _append_only(conf):
            from pos_dlt_spark.sources.delta import DeltaProtocolError

            raise DeltaProtocolError(
                "table is delta.appendOnly: overwrite would remove data"
            )
    df, check_generated = _generated(
        df, prior.schema if prior is not None else df.schema
    )
    df, check_constraints = _constrained(df, conf)
    if prior is not None and prior.column_mapping != "none":
        # cm table: files + partition dirs carry PHYSICAL names
        adds = _stage_and_move(
            _to_physical(df, prior), path, _physical_partition_by(prior)
        )
    elif cm_new is not None:
        adds = _stage_and_move(
            _to_physical(df, cm_new), path, _physical_partition_by(cm_new)
        )
    else:
        adds = _stage_and_move(df, path, partition_by)
    for pre in (check_generated, check_constraints, precommit):
        if pre is None:
            continue
        try:
            pre()
        except BaseException:
            # abort before any commit: the staged files were already moved
            # into the table root but NO commit references them — remove
            # them so the table is byte-identical to before
            for a in adds:
                try:
                    os.remove(os.path.join(path, a["add"]["path"]))
                except OSError:
                    pass
            raise

    # 2. commit loop (optimistic concurrency)
    for _ in range(max_retries):
        if exists:
            snap: DeltaSnapshot | None = delta_snapshot(spark, path)
            _writer_supports(snap)
            if txn is not None and snap.txns.get(txn[0], -1) >= txn[1]:
                # a concurrent writer sharing our appId landed this batch
                # while we were staging — drop our staged twin and yield
                for a in adds:
                    try:
                        os.remove(os.path.join(path, a["add"]["path"]))
                    except OSError:
                        pass
                return snap.version
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
            if cm_new is not None:
                # legacy columnMapping protocol floor (reader 2 / writer
                # 5 also covers generated columns' writer-4 obligation)
                proto = fx.protocol_action(min_reader=2, min_writer=5)
            elif _generation_exprs(df.schema):
                # generated columns oblige writers at minWriterVersion 4
                proto = fx.protocol_action(min_writer=4)
            else:
                proto = fx.protocol_action()
            actions = [
                proto,
                fx.metadata_action(
                    created_schema,
                    partition_columns=list(partition_by or []),
                    configuration=conf or None,
                ),
            ] + list(adds)
        if txn is not None:
            actions = [fx.txn_action(txn[0], txn[1])] + actions
        actions = [
            fx.commit_info_action(
                "WRITE", {"mode": mode, "partitionBy": list(partition_by or [])}
            )
        ] + actions

        if _try_commit(log_dir, version, actions):
            _maybe_checkpoint(spark, path, version, checkpoint_interval, checkpoint_format)
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
    txn: tuple[str, int] | None = None,
    range_join_threshold: int = 100_000,
    checkpoint_interval: int = 10,
    max_retries: int = 3,
    delete_predicate: str | None = None,
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
    3. A lost commit race RE-RUNS the whole merge against the fresh
       snapshot (staged files cleaned up first) — never a blind replay
       of the stale result, which could resurrect overwritten rows. The
       re-run is always safe: the merge is deterministic in (snapshot,
       updates) and commits atomically or not at all; SetTransaction
       idempotence is re-checked on entry, so a concurrent writer
       sharing the appId short-circuits. After ``max_retries`` lost
       races :class:`DeltaCommitConflict` raises.

    Keys absent from the table INSERT; keys present UPDATE (newest
    sequence wins; an EQUAL sequence — after any explicit tiebreakers —
    resolves update-wins, matching DLT apply_changes' sequencing, so the
    outcome is deterministic without caller-supplied tiebreakers).
    Precondition: the table's live rows are unique per
    key (the invariant every merge commit preserves; the window dedups
    a violated precondition too, keeping the newest row).

    ``delete_predicate`` is MERGE's whenMatchedDelete / DLT's
    apply_as_deletes: an update row matching the SQL predicate is a
    DELETE tombstone — when it wins the per-key sequence ordering the
    key is REMOVED from the table (a stale tombstone loses like any
    stale update). The predicate is evaluated on the RAW update batch
    (it may reference columns outside the table schema, e.g. an op
    marker — extra columns never reach the files); tombstones are not
    retained across calls, so deletes assume per-key monotone
    sequences. With CDF enabled, removed keys emit ``delete`` change
    rows (their preimage) alongside the usual update/insert changes.

    Returns the committed version."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    tiebreakers = list(tiebreakers or [])
    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
    if txn is not None and snap.txns.get(txn[0], -1) >= txn[1]:
        return snap.version  # batch already merged: replay skipped
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
    # without usable stats are always touched (conservative). Past
    # ``range_join_threshold`` stat-ful files (integral keys), the
    # broadcast BETWEEN join — O(files x distinct keys) comparisons —
    # switches to a BUCKETIZED interval equi-join (the rangejoin.py
    # pattern on the numeric domain): bucket width = widest file
    # interval, each file lands in <= 2 buckets, keys hash to their
    # bucket, and the residual BETWEEN applies after the equi-join —
    # same exact touched set, shuffle-partitioned instead of all-pairs.
    _PARTITION_RENDER_SAFE = {"string", "tinyint", "smallint", "int", "bigint", "boolean", "date"}
    if keys[0] in snap.partition_columns:
        key_type = {f.name: f.dataType.simpleString() for f in snap.schema.fields}[keys[0]]
        if key_type in _PARTITION_RENDER_SAFE:
            # partition-keyed merge: the EXACT touched set comes straight
            # from the log's partitionValues (files never store the column,
            # so footer stats cannot help here). Distinct update partition
            # values collect bounded by the batch's partition spread.
            # Restricted to types whose Spark string cast provably matches
            # the partition-directory rendering — a timestamp's fractional
            # seconds or a double's scientific notation can differ, which
            # would SKIP files that hold the key and leave duplicates.
            vals = {
                r["__p"]
                for r in updates.select(
                    F.col(keys[0]).cast("string").alias("__p")
                ).distinct().collect()
            }
            touched = [rel for rel, pv in snap.files if pv.get(keys[0]) in vals]
        else:
            touched = [rel for rel, _pv in snap.files]  # conservative: all
        ranges = []
    else:
        ranges = []
        touched_always = []
        # stats in column-mapping tables are keyed by PHYSICAL names
        skey = snap.physical_names.get(keys[0], keys[0])
        for rel, _pv in snap.files:
            raw = snap.adds.get(rel, {}).get("stats")
            try:
                st = json.loads(raw) if isinstance(raw, str) else (raw or {})
                lo = (st.get("minValues") or {}).get(skey)
                hi = (st.get("maxValues") or {}).get(skey)
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
            integral = key_type in ("tinyint", "smallint", "int", "bigint")
            if integral and len(ranges) > range_join_threshold:
                # bucketized interval equi-join (the scale path). Shift by
                # the global min so both sides' bucket arithmetic stays
                # non-negative (Spark's DIV truncates toward zero,
                # Python's // floors — they agree only on non-negatives;
                # keys below the shift sit outside every file interval,
                # so their bucket is moot). Bucket width = the widest
                # file interval, so each file expands to <= 2 bucket rows.
                base = min(int(lo) for _, lo, _ in ranges)
                width = max(int(hi) - int(lo) for _, lo, hi in ranges) + 1
                rows = []
                for rel, lo, hi in ranges:
                    for b in {(int(lo) - base) // width, (int(hi) - base) // width}:
                        rows.append((rel, lo, hi, b))
                rng = local_df(
                    spark, rows,
                    f"__rel string, __lo {key_type}, __hi {key_type}, __b bigint",
                )
                hit = (
                    kt.withColumn(
                        "__b",
                        F.expr(
                            f"CAST((CAST(__k AS BIGINT) - {base}) DIV {width} AS BIGINT)"
                        ),
                    )
                    .join(rng, "__b")
                    .filter(
                        (F.col("__k") >= F.col("__lo")) & (F.col("__k") <= F.col("__hi"))
                    )
                    .select("__rel")
                    .distinct()
                    .collect()
                )
            else:
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
    # tombstone flag FIRST, on the RAW batch (the predicate may reference
    # op-marker columns outside the table schema)
    if delete_predicate is not None:
        updates = updates.withColumn(
            "__del", F.coalesce(F.expr(delete_predicate), F.lit(False))
        )
    # generated columns: compute any the update batch omitted, validate
    # any it provided (check runs after the staging job below; tombstone
    # rows are exempt — their payloads never reach the table)
    updates, check_generated = _generated(
        updates, snap.schema,
        exempt_col="__del" if delete_predicate is not None else None,
    )
    # cast the update batch to the TABLE's column types (update batches
    # often arrive widened, e.g. int64 from pandas against an int
    # column; writing them as-is would poison the files against the
    # pinned log schema). ANSI mode errors on lossy casts. Extra source
    # columns (op markers) are dropped here.
    tbl_types = {f.name: f.dataType for f in snap.schema.fields}
    flag = ["__del"] if delete_predicate is not None else []
    updates = updates.select(
        *[F.col(n).cast(tbl_types[n]).alias(n) for n in cols], *flag
    )
    old = None
    if touched:
        # the shared snapshot scanner recovers partition values (Hive
        # discovery or per-tuple literals) AND applies any deletion
        # vectors on touched files — a merge that read a DV'd file raw
        # would resurrect its deleted rows into the rewrite
        from pos_dlt_spark.sources.delta import _apply_deletion_vectors, scan_rels

        dv_touch = [
            rel for rel in touched if snap.adds.get(rel, {}).get("deletionVector")
        ]
        old = scan_rels(spark, snap, [r for r in touched if r not in set(dv_touch)])
        if dv_touch:
            dvpart = _apply_deletion_vectors(spark, snap, dv_touch)
            old = old.unionByName(dvpart) if old is not None else dvpart
        old_in = old.withColumn("__upd", F.lit(0))
        if delete_predicate is not None:
            old_in = old_in.withColumn("__del", F.lit(False))
        merged_in = old_in.unionByName(
            updates.select(*cols, *flag).withColumn("__upd", F.lit(1))
        )
    else:
        merged_in = updates.select(*cols, *flag).withColumn("__upd", F.lit(1))
    # equal-sequence (and equal-tiebreaker) ties resolve UPDATE-WINS —
    # DLT apply_changes' documented sequencing — via an implicit
    # is-update tiebreaker, so replays and ties are deterministic without
    # requiring the caller to supply explicit tiebreakers.
    order = (
        [F.col(sequence_by).desc()]
        + [F.col(t).desc() for t in tiebreakers]
        + [F.col("__upd").desc()]
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    merged_tagged = (
        merged_in.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    merged = merged_tagged.drop("__upd")
    if delete_predicate is not None:
        # a tombstone that won the ordering removes its key from the table
        merged = merged.filter(~F.col("__del")).drop("__del")
    if touched and _append_only(snap.configuration):
        from pos_dlt_spark.sources.delta import DeltaProtocolError

        raise DeltaProtocolError(
            "table is delta.appendOnly: merge would rewrite existing rows "
            "(a pure-insert batch on disjoint keys is allowed)"
        )
    merged, check_constraints = _constrained(merged, snap.configuration)
    adds = _stage_and_move(
        _to_physical(merged, snap), path, _physical_partition_by(snap)
    )
    for chk in (check_generated, check_constraints):
        if chk is None:
            continue
        try:
            chk()
        except BaseException:
            for a in adds:
                try:
                    os.remove(os.path.join(path, a["add"]["path"]))
                except OSError:
                    pass
            raise

    cdc_actions: list[dict] = []
    from pos_dlt_spark.sources.delta_cdf import (
        cdf_enabled,
        merge_change_rows,
        stage_change_files,
    )

    if cdf_enabled(snap):
        old_df = old if old is not None else spark.createDataFrame([], snap.schema)
        changes = merge_change_rows(old_df, merged_tagged, keys)
        # change files carry PHYSICAL column names under column mapping,
        # exactly like data files; _change_type is unmapped and passes
        # through _to_physical untouched
        cdc_actions = stage_change_files(
            _to_physical(changes, snap), path, _physical_partition_by(snap)
        )

    actions = cdc_actions + [fx.remove_action(rel) for rel in touched] + adds
    if txn is not None:
        actions = [fx.txn_action(txn[0], txn[1])] + actions
    actions = [fx.commit_info_action("MERGE", {"keys": keys, "sequenceBy": sequence_by})] + actions
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        # lost the race: the staged files are unreferenced — remove them
        # and re-run the WHOLE merge on the fresh snapshot (bounded)
        for a in adds:
            try:
                os.remove(os.path.join(path, a["add"]["path"]))
            except OSError:
                pass
        for c in cdc_actions:
            try:
                os.remove(os.path.join(path, c["cdc"]["path"]))
            except OSError:
                pass
        if max_retries > 1:
            return delta_merge(
                spark, path, updates, keys, sequence_by,
                tiebreakers=tiebreakers, txn=txn,
                range_join_threshold=range_join_threshold,
                checkpoint_interval=checkpoint_interval,
                max_retries=max_retries - 1,
            )
        raise DeltaCommitConflict(
            f"version {version} was committed concurrently and retries "
            "are exhausted; merge must re-run against the new snapshot"
        )
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version


def delta_optimize(
    spark,
    path: str,
    target_files: int = 1,
    zorder_by: list[str] | None = None,
    zorder_bits: int = 12,
    checkpoint_interval: int = 10,
) -> int:
    """OPTIMIZE (bin-pack compaction): rewrite each PARTITION's live
    files into at most ``target_files`` larger files (one group for an
    unpartitioned table; compaction never crosses a partition boundary)
    and commit remove(old)+add(new) with
    ``dataChange: false`` — the protocol's marker that no ROWS changed,
    so streaming replays (:func:`pos_dlt_spark.sources.delta.replay_adds`)
    skip the rewrite and batch readers see identical content in fewer,
    bigger files (the small-files problem is the single most common
    operational Delta chore). Files carrying DELETION VECTORS are always
    rewritten minus their deleted rows (this is also delta's REORG/PURGE:
    compaction materializes the deletes and drops the DV), still under
    ``dataChange: false`` — the logical rows are unchanged. A lost commit
    race aborts — re-run against the new snapshot; compaction is always
    safe to retry.

    ``zorder_by`` is OPTIMIZE ZORDER BY: within each partition the
    rewrite range-partitions AND sorts on the Morton interleave of the
    given (numeric) columns (``storage.zorder_key``, each column
    bucketized to ``zorder_bits`` bits over its observed span — one tiny
    stats pass per group), so the rewritten files' footer min/max stats
    are tight on EVERY z-column and ``skip_files``/``delta_merge``
    pruning works for predicates on any of them — multi-dimensional
    clustering, the one thing bin-packing alone cannot give. With
    ``zorder_by`` every multi-file group is rewritten even at or below
    ``target_files`` (re-clustering is the point).

    Returns the committed version."""
    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
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
        dv_rels = [r for r in rels if snap.adds.get(r, {}).get("deletionVector")]
        reorder = bool(zorder_by) and len(rels) > 1
        if len(rels) <= target_files and not dv_rels and not reorder:
            continue  # DV'd files always compact: OPTIMIZE is also PURGE
        data_cols = [f.name for f in snap.data_schema.fields]
        plain = [r for r in rels if r not in set(dv_rels)]
        data = None
        if plain:
            if snap.column_mapping == "none":
                data = spark.read.schema(snap.data_schema).parquet(
                    *[_abs_file(path, rel) for rel in plain]
                )
            else:
                # cm files carry physical names; the shared scanner
                # resolves them back to logical
                from pos_dlt_spark.sources.delta import scan_rels

                data = scan_rels(spark, snap, plain).select(*data_cols)
        if dv_rels:
            from pos_dlt_spark.sources.delta import _apply_deletion_vectors

            dvpart = _apply_deletion_vectors(spark, snap, dv_rels).select(*data_cols)
            data = data.unionByName(dvpart) if data is not None else dvpart
        staging = os.path.join(path, f"_staging_{uuid.uuid4().hex[:12]}")
        if zorder_by:
            from pyspark.sql import functions as F

            from pos_dlt_spark.storage import zorder_key

            missing = [c for c in zorder_by if c not in data_cols]
            if missing:
                raise ValueError(
                    f"zorder_by columns {missing} not data columns "
                    "(partition columns are already directory-clustered)"
                )
            stats_row = data.agg(
                *[F.min(c).alias(f"mn_{c}") for c in zorder_by],
                *[F.max(c).alias(f"mx_{c}") for c in zorder_by],
            ).collect()[0]
            bucketized = []
            for c in zorder_by:
                lo, hi = stats_row[f"mn_{c}"], stats_row[f"mx_{c}"]
                span = max(int(hi) - int(lo), 0) + 1
                # scale each column to the FULL 2^bits range (not floor-
                # divide by a width): a narrow column (say 8 bits of span)
                # next to a wide one would otherwise leave its high morton
                # bits always zero and the z-curve degenerates into a sort
                # on the wide column alone — no skipping on the narrow one
                if span * (1 << zorder_bits) < (1 << 62):
                    bucketized.append(
                        f"LEAST(((CAST({c} AS BIGINT) - {int(lo)}) * "
                        f"{1 << zorder_bits}) DIV {span}, {(1 << zorder_bits) - 1})"
                    )
                else:  # overflow-safe fallback for astronomically wide spans
                    width = max(-(-span // (1 << zorder_bits)), 1)
                    bucketized.append(f"((CAST({c} AS BIGINT) - {int(lo)}) div {width})")
            out = (
                data.withColumn("__z", zorder_key(bucketized, bits=zorder_bits))
                .repartitionByRange(max(target_files, 1), "__z")
                .sortWithinPartitions("__z")
                .drop("__z")
            )
            _to_physical(out, snap).write.parquet(staging)
        else:
            _to_physical(data.coalesce(target_files), snap).write.parquet(staging)
        # partition directories and partitionValues keys use PHYSICAL names
        rel_dir = "/".join(
            f"{snap.physical_names.get(c, c)}="
            f"{'__HIVE_DEFAULT_PARTITION__' if v is None else v}"
            for c, v in zip(snap.partition_columns, k)
        )
        pvals_out = {
            snap.physical_names.get(c, c): v for c, v in pv_by_group[k].items()
        }
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
                    partition_values=pvals_out or None,
                    stats=_file_stats(dest),
                    dataChange=False,
                )
            )
        shutil.rmtree(staging, ignore_errors=True)
        removes += rels
    if not removes:
        return snap.version
    actions = [
        fx.commit_info_action("OPTIMIZE", {"zOrderBy": list(zorder_by or [])})
    ] + [fx.remove_action(rel, data_change=False) for rel in removes] + adds
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(f"version {version} committed concurrently; re-run optimize")
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version


def delta_vacuum(
    spark, path: str, retain_versions: int = 1, grace_seconds: float = 0.0
) -> list[str]:
    """VACUUM: physically delete data files referenced by NO retained
    snapshot (the live sets of the last ``retain_versions + 1``
    versions). Time travel to vacuumed versions then fails on read —
    delta's own retention semantics, by version count here instead of
    tombstone age (deterministic for tests; both are policies over the
    same referenced-set computation). Never touches ``_delta_log``.

    In-flight-writer protection: ``_stage_and_move`` renames data files
    into the table root BEFORE the commit is attempted, so an
    unreferenced-but-new file may belong to a writer about to commit.
    Files whose mtime is not strictly older than the newest log entry
    (minus ``grace_seconds``) are SKIPPED — real Delta's retention window
    serves the same purpose. This protects the common staged-then-commit
    sequence; a writer that staged before a competing commit landed and
    is still retrying is only safe under ``grace_seconds`` sized above
    the longest plausible stage-to-commit latency (set it on shared
    tables; single-writer pipelines can keep 0).

    Returns the deleted relative paths."""
    latest = delta_snapshot(spark, path)
    log_dir = os.path.join(path, "_delta_log")
    cutoff = max(
        (
            os.path.getmtime(os.path.join(log_dir, n))
            for n in os.listdir(log_dir)
            if n.endswith(".json") or n.endswith(".parquet")
        ),
        default=float("-inf"),
    ) - grace_seconds
    keep_versions = range(max(0, latest.version - retain_versions), latest.version + 1)
    from pos_dlt_spark.sources.dv import dv_relative_path

    referenced: set[str] = set()
    for v in keep_versions:
        try:
            s = delta_snapshot(spark, path, v)
        except FileNotFoundError:
            continue  # pre-checkpoint version already unreconstructable
        referenced.update(rel for rel, _ in s.files)
        for a in s.adds.values():
            dv = a.get("deletionVector")
            if dv:
                rel = dv_relative_path(dv)
                if rel:
                    referenced.add(rel.replace("/", os.sep))
                elif dv.get("storageType") == "p":
                    # absolute-path DVs normally live OUTSIDE the table
                    # root (shallow clones pointing at the source), but a
                    # DEEP clone copies sidecars INSIDE its own root with
                    # 'p' storage — protect those from the walk below
                    ap = os.path.abspath(dv.get("pathOrInlineDv", ""))
                    rootp = os.path.abspath(path)
                    if ap.startswith(rootp + os.sep):
                        referenced.add(os.path.relpath(ap, rootp))
    # change-data (CDF) files of RETAINED commits stay readable; those of
    # vacuumed-out history are collected with their data files
    from pos_dlt_spark.sources.delta import _commit_actions, _list_log

    for v, p in _list_log(log_dir)[0]:
        if v in keep_versions:
            for a in _commit_actions(p):
                if "cdc" in a:
                    referenced.add(a["cdc"]["path"].replace("/", os.sep))
    deleted = []
    for root, dirs, files in os.walk(path):
        rel_root = os.path.relpath(root, path)
        parts = [] if rel_root == "." else rel_root.split(os.sep)
        if any(p == "_delta_log" or p.startswith("_staging") for p in parts):
            continue
        for n in files:
            if not (n.endswith(".parquet") or (n.startswith("deletion_vector_") and n.endswith(".bin"))):
                continue
            full = os.path.join(root, n)
            rel = os.path.relpath(full, path)
            if rel not in referenced and os.path.getmtime(full) < cutoff:
                os.remove(full)
                deleted.append(rel)
    return deleted


def delta_delete(
    spark,
    path: str,
    predicate: str,
    mode: str = "dv",
    inline_threshold: int = 512,
    checkpoint_interval: int = 10,
) -> tuple[int, int]:
    """DELETE rows matching the SQL ``predicate`` — the operation that
    makes real-world tables carry deletion vectors.

    ``mode='dv'`` (default, delta's modern path): NO data file is
    rewritten. Matching rows' file-absolute indices are computed in one
    distributed scan (``_metadata.row_index``), encoded as roaring-bitmap
    deletion vectors (sources/dv.py — inline below ``inline_threshold``
    serialized bytes, a ``deletion_vector_<uuid>.bin`` sidecar above),
    and the commit re-adds each affected file with its descriptor
    (remove + add of the same path, protocol upgraded to
    readerFeatures=[deletionVectors]). A file already carrying a DV gets
    the UNION of old and new indices. At 100 TB this is the difference
    between rewriting terabytes and writing kilobytes of bitmap.

    ``mode='rewrite'`` (classic copy-on-write): affected files are
    rewritten without the matching rows; no DV machinery involved.

    The bitmaps are built EXECUTOR-SIDE (matched indices shuffle to one
    group per file, union with the prior DV, encode there); the driver
    collects only the COMPRESSED bitmap bytes per touched file — driver
    memory rides bitmap size, never deleted-row count, symmetric with
    the read path. A delete concentrating hundreds of millions of rows
    in ONE file strains that file's single executor group and belongs
    in ``mode='rewrite'``, which stays fully distributed.

    Returns ``(committed version, rows deleted)``. A lost commit race
    aborts with :class:`DeltaCommitConflict` — re-run on the new
    snapshot."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import (
        _abs_file,
        _apply_deletion_vectors,
        scan_rels,
    )

    if mode not in ("dv", "rewrite"):
        raise ValueError(f"mode must be dv|rewrite, got {mode!r}")
    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
    if _append_only(snap.configuration):
        from pos_dlt_spark.sources.delta import DeltaProtocolError

        raise DeltaProtocolError("table is delta.appendOnly: DELETE refused")
    if not snap.files:
        return snap.version, 0

    # stats skipping on the MATCH scan (same conservative conjunct
    # extraction UPDATE uses): provably-disjoint files never scanned
    from pos_dlt_spark.sources.delta import skip_files

    preds = _skipping_predicates(predicate)
    scan_snap = skip_files(snap, preds)[0] if preds else snap
    if not scan_snap.files:
        return snap.version, 0
    scan = scan_rels(spark, scan_snap, None, with_meta=True)
    matches = scan.filter(F.expr(predicate)).select("__fp", "__ri")

    abs_to_rel = {
        os.path.abspath(_abs_file(path, rel)): rel for rel, _ in snap.files
    }
    if mode == "dv":
        # the bitmaps are built EXECUTOR-SIDE: matched row indices group
        # per file (one shuffle on the file id), each group unions with
        # the file's prior DV and encodes the roaring bitmap there; the
        # driver collects only (file, compressed bytes, newly-deleted
        # count) — driver memory rides bitmap bytes, never row count
        # (the read path's bound, now symmetric on the write path). A
        # delete wide enough to strain one executor's group (hundreds of
        # millions of rows in ONE file) belongs in mode='rewrite'.
        import numpy as np

        from pos_dlt_spark.sources.dv import (
            bitmap_cardinality,
            decode_dv_numpy,
            encode_dv_bitmap_np,
            make_dv_descriptor_bytes,
            read_dv_bytes,
        )

        prior_blobs: dict[str, bytes] = {}
        for rel, _pv in snap.files:
            dvd = snap.adds[rel].get("deletionVector")
            if dvd:
                prior_blobs[os.path.abspath(_abs_file(path, rel))] = read_dv_bytes(
                    path, dvd
                )
        bc_prior = spark.sparkContext.broadcast(prior_blobs)

        def _encode_group(pdf):
            import pandas as pd

            fp = pdf["__fp"].iloc[0]
            new_idx = np.unique(pdf["__ri"].to_numpy(dtype="int64"))
            prior_bytes = bc_prior.value.get(fp)
            if prior_bytes is not None:
                prior_arr = decode_dv_numpy(prior_bytes)
                n_new = int(
                    len(new_idx) - np.isin(new_idx, prior_arr, assume_unique=True).sum()
                )
                union = np.union1d(new_idx, prior_arr)
            else:
                n_new, union = len(new_idx), new_idx
            return pd.DataFrame(
                {"__fp": [fp], "dv": [encode_dv_bitmap_np(union)], "n_new": [n_new]}
            )

        rows = (
            matches.groupBy("__fp")
            .applyInPandas(_encode_group, schema="__fp string, dv binary, n_new long")
            .collect()
        )
        n_deleted = sum(int(r["n_new"]) for r in rows)
        if not rows or n_deleted == 0:
            return snap.version, 0  # nothing matched, or all dead already
        actions: list[dict] = [
            _merged_protocol(
                snap.protocol, ("deletionVectors",), ("deletionVectors",)
            )
        ]
        for r in sorted(rows, key=lambda r: r["__fp"]):
            rel = abs_to_rel.get(r["__fp"])
            if rel is None:
                raise ValueError(f"scan yielded unknown file {r['__fp']}")
            data = bytes(r["dv"])
            add = dict(snap.adds[rel])
            add["deletionVector"] = make_dv_descriptor_bytes(
                path, data, bitmap_cardinality(data), inline_threshold=inline_threshold
            )
            actions.append(fx.remove_action(rel))
            actions.append({"add": add})
    else:
        # classic copy-on-write: rewrite each file that has >=1 match,
        # keeping only non-matching rows; deletes of whole files become
        # plain removes (no replacement add)
        hit_rels = sorted(
            {
                abs_to_rel[r["__fp"]]
                for r in matches.select("__fp").distinct().collect()
            }
        )
        if not hit_rels:
            return snap.version, 0
        dv_touch = [
            rel for rel in hit_rels if snap.adds.get(rel, {}).get("deletionVector")
        ]
        old = scan_rels(spark, snap, [r for r in hit_rels if r not in set(dv_touch)])
        if dv_touch:
            dvpart = _apply_deletion_vectors(spark, snap, dv_touch)
            old = old.unionByName(dvpart) if old is not None else dvpart
        keep = old.filter(~F.coalesce(F.expr(predicate), F.lit(False)))
        n_deleted = old.count() - keep.count()
        adds = _stage_and_move(
            _to_physical(keep, snap), path, _physical_partition_by(snap)
        )
        actions = [fx.remove_action(rel) for rel in hit_rels] + adds

    from pos_dlt_spark.sources.delta_cdf import (
        CHANGE_TYPE,
        cdf_enabled,
        stage_change_files,
    )

    if cdf_enabled(snap):
        # change files hold the NEWLY deleted rows: live rows (prior DVs
        # applied — already-dead rows are not deleted again) matching the
        # predicate, tagged 'delete'. Under column mapping they carry
        # PHYSICAL names, like data files.
        dv_all = [
            rel for rel, _ in snap.files if snap.adds.get(rel, {}).get("deletionVector")
        ]
        live = scan_rels(spark, snap, [r for r, _ in snap.files if r not in set(dv_all)])
        if dv_all:
            dvpart = _apply_deletion_vectors(spark, snap, dv_all)
            live = live.unionByName(dvpart) if live is not None else dvpart
        changes = live.filter(F.expr(predicate)).withColumn(
            CHANGE_TYPE, F.lit("delete")
        )
        actions = stage_change_files(
            _to_physical(changes, snap), path, _physical_partition_by(snap)
        ) + actions

    actions = [
        fx.commit_info_action("DELETE", {"predicate": predicate, "mode": mode})
    ] + actions
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(
            f"version {version} was committed concurrently; delete must "
            "re-run against the new snapshot"
        )
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version, n_deleted


def _skipping_predicates(predicate: str) -> list[tuple[str, str, object]]:
    """Extract stats-skippable conjuncts from a SQL predicate string —
    the DML-side half of data skipping (delta's DataSkippingReader does
    the same conversion): DELETE/UPDATE prune provably-disjoint files
    from the log's per-file min/max BEFORE scheduling any scan task,
    which at 100 TB is the difference between a full-table match scan
    and touching the dozen files that can match. STRICTLY conservative:
    only top-AND-level conjuncts of the shapes ``col <cmp> literal``,
    ``col BETWEEN lit AND lit`` and ``col IN (lit, ...)`` contribute;
    any OR / NOT / function / non-literal makes that conjunct (or the
    whole predicate) contribute nothing, so pruning can only drop files
    the real filter — which still runs — could never match."""
    import re

    s = predicate.strip()
    if re.search(r"(?i)(?<![a-z0-9_])(or|not)(?![a-z0-9_])", s):
        return []

    def lit(tok: str):
        tok = tok.strip()
        m = re.fullmatch(r"'((?:[^']|'')*)'", tok)
        if m:
            return m.group(1).replace("''", "'")
        try:
            return int(tok)
        except ValueError:
            try:
                return float(tok)
            except ValueError:
                return None

    out: list[tuple[str, str, object]] = []

    def between_repl(m: "re.Match") -> str:
        a, b = lit(m.group(2)), lit(m.group(3))
        if a is not None and b is not None:
            out.append((m.group(1), ">=", a))
            out.append((m.group(1), "<=", b))
        return " 1 "  # neutral placeholder; parses to nothing below

    s = re.sub(
        r"(?i)([A-Za-z_]\w*)\s+between\s+(\S+)\s+and\s+(\S+)", between_repl, s
    )
    for conj in re.split(r"(?i)\s+and\s+", s):
        conj = conj.strip()
        while conj.startswith("(") and conj.endswith(")"):
            conj = conj[1:-1].strip()
        m = re.fullmatch(r"([A-Za-z_]\w*)\s*(==|=|<=|>=|<|>)\s*(.+)", conj)
        if m:
            v = lit(m.group(3))
            if v is not None:
                out.append((m.group(1), "=" if m.group(2) == "==" else m.group(2), v))
            continue
        m = re.fullmatch(r"(?i)([A-Za-z_]\w*)\s+in\s*\(([^()]*)\)", conj)
        if m:
            vals = [lit(t) for t in m.group(2).split(",")]
            if vals and all(v is not None for v in vals):
                out.append((m.group(1), "in", vals))
    return out


def delta_update(
    spark,
    path: str,
    predicate: str,
    set_exprs: dict[str, str],
    checkpoint_interval: int = 10,
) -> tuple[int, int]:
    """UPDATE rows matching the SQL ``predicate``, assigning each column
    in ``set_exprs`` its SQL expression — classic copy-on-write: only
    files holding >=1 match are rewritten (stats-equivalent pruning via
    the same matched-file scan DELETE uses), untouched files stay. SET
    expressions see the OLD row (standard UPDATE semantics — all
    assignments evaluate simultaneously against the pre-update values).
    Updating a partition column moves rows across partition directories
    naturally (the rewrite re-partitions by the table's layout).

    Generated columns not explicitly assigned are RECOMPUTED on the
    updated rows (their bases may have changed); explicitly assigned
    ones are validated row-by-row like every write. CHECK constraints
    apply to the updated rows. With CDF enabled the commit carries
    ``update_preimage``/``update_postimage`` change files.

    Returns ``(committed version, rows updated)``. A lost commit race
    aborts with :class:`DeltaCommitConflict` — re-run on the new
    snapshot."""
    from pyspark.sql import functions as F

    from pos_dlt_spark.sources.delta import (
        _abs_file,
        _apply_deletion_vectors,
        scan_rels,
    )

    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
    if _append_only(snap.configuration):
        from pos_dlt_spark.sources.delta import DeltaProtocolError

        raise DeltaProtocolError("table is delta.appendOnly: UPDATE refused")
    field_names = [f.name for f in snap.schema.fields]
    unknown = sorted(set(set_exprs) - set(field_names))
    if unknown:
        raise ValueError(f"SET assigns columns not in the table schema: {unknown}")
    if not set_exprs:
        raise ValueError("SET is empty: nothing to update")
    if not snap.files:
        return snap.version, 0

    # stats skipping on the MATCH scan: provably-disjoint files are never
    # read (the real filter still runs on whatever survives)
    from pos_dlt_spark.sources.delta import skip_files

    preds = _skipping_predicates(predicate)
    scan_snap = skip_files(snap, preds)[0] if preds else snap
    if not scan_snap.files:
        return snap.version, 0
    scan = scan_rels(spark, scan_snap, None, with_meta=True)
    matches = scan.filter(F.expr(predicate)).select("__fp")
    abs_to_rel = {
        os.path.abspath(_abs_file(path, rel)): rel for rel, _ in snap.files
    }
    hit_rels = sorted(
        {abs_to_rel[r["__fp"]] for r in matches.distinct().collect()}
    )
    if not hit_rels:
        return snap.version, 0

    # live rows of the touched files (prior DVs applied — dead rows are
    # neither updated nor carried into the rewrite)
    dv_touch = [
        rel for rel in hit_rels if snap.adds.get(rel, {}).get("deletionVector")
    ]
    old = scan_rels(spark, snap, [r for r in hit_rels if r not in set(dv_touch)])
    if dv_touch:
        dvpart = _apply_deletion_vectors(spark, snap, dv_touch)
        old = old.unionByName(dvpart) if old is not None else dvpart
    hit = F.coalesce(F.expr(predicate), F.lit(False))
    keep = old.filter(~hit).select(*field_names)
    upd_old = old.filter(hit).select(*field_names)
    n_updated = upd_old.count()
    if n_updated == 0:
        # files matched on the raw scan but every match was DV-dead
        return snap.version, 0
    # one simultaneous projection: every RHS sees the OLD row
    upd_new = upd_old.select(
        *[
            F.expr(set_exprs[c]).alias(c) if c in set_exprs else F.col(f"`{c}`")
            for c in field_names
        ]
    )
    # generated columns whose bases may have moved: recompute unless the
    # caller assigned them explicitly (then validate, like any write)
    gens = _generation_exprs(snap.schema)
    recompute = [g for g in gens if g not in set_exprs]
    if recompute:
        upd_new = upd_new.drop(*recompute)
    upd_new, check_generated = _generated(upd_new, snap.schema)
    upd_new, check_constraints = _constrained(upd_new, snap.configuration)
    upd_new = upd_new.select(*field_names)

    new_data = keep.unionByName(upd_new)
    adds = _stage_and_move(
        _to_physical(new_data, snap), path, _physical_partition_by(snap)
    )
    for check in (check_generated, check_constraints):
        if check is None:
            continue
        try:
            check()
        except BaseException:
            for a in adds:
                try:
                    os.remove(os.path.join(path, a["add"]["path"]))
                except OSError:
                    pass
            raise

    actions = [fx.remove_action(rel) for rel in hit_rels] + adds

    from pos_dlt_spark.sources.delta_cdf import (
        CHANGE_TYPE,
        cdf_enabled,
        stage_change_files,
    )

    if cdf_enabled(snap):
        changes = upd_old.withColumn(
            CHANGE_TYPE, F.lit("update_preimage")
        ).unionByName(upd_new.withColumn(CHANGE_TYPE, F.lit("update_postimage")))
        actions = stage_change_files(
            _to_physical(changes, snap), path, _physical_partition_by(snap)
        ) + actions

    actions = [
        fx.commit_info_action(
            "UPDATE", {"predicate": predicate, "set": dict(sorted(set_exprs.items()))}
        )
    ] + actions
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(
            f"version {version} was committed concurrently; update must "
            "re-run against the new snapshot"
        )
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version, n_updated


def delta_reorg_purge(
    spark, path: str, checkpoint_interval: int = 10
) -> tuple[int, int]:
    """REORG TABLE ... APPLY (PURGE): rewrite every file carrying a
    deletion vector into clean files with the dead rows physically
    dropped — the maintenance companion to ``delta_delete(mode='dv')``.
    Both the removes and the replacement adds commit with
    ``dataChange=false`` (the logical rows are unchanged — streaming
    replay and CDF ignore the commit, exactly like OPTIMIZE); a later
    VACUUM collects the purged files and their DV sidecars. Files whose
    DV kills every row are removed without a replacement.

    Returns ``(committed version, files purged)`` — ``(version, 0)``
    without a commit when no live file carries a DV."""
    from pos_dlt_spark.sources.delta import _apply_deletion_vectors

    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
    dv_rels = sorted(
        rel for rel, _ in snap.files if snap.adds.get(rel, {}).get("deletionVector")
    )
    if not dv_rels:
        return snap.version, 0
    live = _apply_deletion_vectors(spark, snap, dv_rels)
    adds = _stage_and_move(
        _to_physical(live, snap), path, _physical_partition_by(snap)
    )
    for a in adds:
        a["add"]["dataChange"] = False
    actions = (
        [fx.commit_info_action("REORG", {"applyPurge": True, "files": len(dv_rels)})]
        + [fx.remove_action(rel, data_change=False) for rel in dv_rels]
        + adds
    )
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(
            f"version {version} committed concurrently; re-run reorg"
        )
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version, len(dv_rels)


def _column_referenced(name: str, snap: DeltaSnapshot) -> list[str]:
    """CHECK constraints / generation expressions that mention ``name``
    as a standalone identifier — conservative word-boundary scan; a hit
    refuses the ALTER (renaming or dropping a referenced column would
    silently break the invariant for every later writer)."""
    import re

    pat = re.compile(
        rf"(?<![A-Za-z0-9_]){re.escape(name)}(?![A-Za-z0-9_])", re.IGNORECASE
    )
    hits = []
    for cname, expr in _table_constraints(snap.configuration).items():
        if pat.search(expr):
            hits.append(f"CHECK constraint '{cname}': {expr}")
    for gname, expr in _generation_exprs(snap.schema).items():
        if pat.search(expr):
            hits.append(f"generated column '{gname}': {expr}")
    return hits


def _commit_metadata_change(
    spark,
    path: str,
    snap: DeltaSnapshot,
    schema,
    configuration: dict[str, str],
    partition_columns: list[str],
    operation: str,
    params: dict,
    extra_actions: list[dict] | None = None,
    checkpoint_interval: int = 10,
) -> int:
    """One metadata-only commit (no data files touched): the new
    metaData action — same table id, evolved schema/configuration — plus
    optional protocol actions. Shared by the ALTER TABLE family."""
    actions = (
        [fx.commit_info_action(operation, params)]
        + list(extra_actions or [])
        + [
            fx.metadata_action(
                schema,
                partition_columns=partition_columns,
                table_id=snap.table_id,
                configuration=configuration,
            )
        ]
    )
    version = snap.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), version, actions):
        raise DeltaCommitConflict(
            f"version {version} committed concurrently; re-run the ALTER"
        )
    _maybe_checkpoint(spark, path, version, checkpoint_interval)
    return version


def delta_alter_add_column(
    spark,
    path: str,
    name: str,
    data_type,
    comment: str | None = None,
    checkpoint_interval: int = 10,
) -> int:
    """ALTER TABLE ... ADD COLUMN — metadata-only: existing files simply
    lack the column and every pinned-schema scan surfaces it as NULL
    (the protocol's schema-evolution contract; no file is rewritten).
    Under column mapping the new column mints a fresh physical name and
    field id (``delta.columnMapping.maxColumnId`` + 1), so it can never
    collide with a column that ever existed before. ``data_type`` is a
    Spark DataType or a DDL string (``'string'``, ``'decimal(10,2)'``).
    Returns the committed version."""
    from pyspark.sql.types import DataType, StructField, StructType

    snap = delta_snapshot(spark, path)
    _writer_supports(snap)
    if name in {f.name for f in snap.schema.fields}:
        raise ValueError(f"column {name!r} already exists")
    if isinstance(data_type, DataType):
        dt = data_type
    else:
        dt = StructType.fromDDL(f"`{name}` {data_type}").fields[0].dataType
    md: dict = {}
    if comment is not None:
        md["comment"] = comment
    conf = dict(snap.configuration)
    if snap.column_mapping != "none":
        known = list(snap.field_ids.values()) or [0]
        next_id = max(
            int(conf.get("delta.columnMapping.maxColumnId") or 0), max(known)
        ) + 1
        md["delta.columnMapping.id"] = next_id
        md["delta.columnMapping.physicalName"] = f"col-{uuid.uuid4()}"
        conf["delta.columnMapping.maxColumnId"] = str(next_id)
    schema = StructType(
        list(snap.schema.fields) + [StructField(name, dt, True, md)]
    )
    return _commit_metadata_change(
        spark, path, snap, schema, conf, snap.partition_columns,
        "ADD COLUMNS", {"column": name, "type": dt.simpleString()},
        checkpoint_interval=checkpoint_interval,
    )


def delta_alter_rename_column(
    spark, path: str, old: str, new: str, checkpoint_interval: int = 10
) -> int:
    """ALTER TABLE ... RENAME COLUMN — metadata-only, REQUIRES column
    mapping (the logical name changes while the physical name / field id
    stays, so every existing file keeps resolving; without a mapping the
    rename would orphan the data). Plain tables: run
    :func:`delta_enable_column_mapping` first. Refuses when a CHECK
    constraint or generation expression references the old name."""
    from pyspark.sql.types import StructField, StructType

    snap = delta_snapshot(spark, path)
    if snap.column_mapping == "none":
        from pos_dlt_spark.sources.delta import DeltaProtocolError

        raise DeltaProtocolError(
            "RENAME COLUMN requires column mapping (physical names decouple "
            "from logical) — run delta_enable_column_mapping(path) first"
        )
    names = {f.name for f in snap.schema.fields}
    if old not in names:
        raise ValueError(f"column {old!r} does not exist")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    refs = _column_referenced(old, snap)
    if refs:
        raise ValueError(
            f"column {old!r} is referenced; drop/redefine these first: {refs}"
        )
    schema = StructType(
        [
            StructField(new if f.name == old else f.name, f.dataType,
                        f.nullable, dict(f.metadata or {}))
            for f in snap.schema.fields
        ]
    )
    parts = [new if c == old else c for c in snap.partition_columns]
    return _commit_metadata_change(
        spark, path, snap, schema, dict(snap.configuration), parts,
        "RENAME COLUMN", {"from": old, "to": new},
        checkpoint_interval=checkpoint_interval,
    )


def delta_alter_drop_column(
    spark, path: str, name: str, checkpoint_interval: int = 10
) -> int:
    """ALTER TABLE ... DROP COLUMN — metadata-only, REQUIRES column
    mapping (the data stays in the files; the mapping simply stops
    exposing it, and a later re-add mints a FRESH physical name so the
    old bytes can never resurface). Refuses partition columns, the last
    remaining column, and columns referenced by constraints or
    generation expressions."""
    from pyspark.sql.types import StructType

    snap = delta_snapshot(spark, path)
    if snap.column_mapping == "none":
        from pos_dlt_spark.sources.delta import DeltaProtocolError

        raise DeltaProtocolError(
            "DROP COLUMN requires column mapping — run "
            "delta_enable_column_mapping(path) first"
        )
    if name not in {f.name for f in snap.schema.fields}:
        raise ValueError(f"column {name!r} does not exist")
    if name in snap.partition_columns:
        raise ValueError(f"column {name!r} is a partition column")
    if len(snap.schema.fields) == 1:
        raise ValueError("cannot drop the table's last column")
    refs = _column_referenced(name, snap)
    if refs:
        raise ValueError(
            f"column {name!r} is referenced; drop/redefine these first: {refs}"
        )
    schema = StructType([f for f in snap.schema.fields if f.name != name])
    return _commit_metadata_change(
        spark, path, snap, schema, dict(snap.configuration),
        snap.partition_columns, "DROP COLUMNS", {"column": name},
        checkpoint_interval=checkpoint_interval,
    )


def delta_enable_column_mapping(
    spark, path: str, checkpoint_interval: int = 10
) -> int:
    """Upgrade a plain table to column mapping mode 'name' (the
    protocol's upgrade path): every existing column's physical name is
    set to its CURRENT name — existing files keep resolving untouched —
    and field ids are minted 1..n. Unlocks RENAME / DROP COLUMN. No-op
    (returns the current version) when the table already maps names;
    id-mode tables are left as-is."""
    from pyspark.sql.types import StructField, StructType

    snap = delta_snapshot(spark, path)
    if snap.column_mapping != "none":
        return snap.version
    fields = []
    for i, f in enumerate(snap.schema.fields):
        md = dict(f.metadata or {})
        md["delta.columnMapping.id"] = i + 1
        md["delta.columnMapping.physicalName"] = f.name
        fields.append(StructField(f.name, f.dataType, f.nullable, md))
    conf = dict(snap.configuration)
    conf["delta.columnMapping.mode"] = "name"
    conf["delta.columnMapping.maxColumnId"] = str(len(fields))
    return _commit_metadata_change(
        spark, path, snap, StructType(fields), conf, snap.partition_columns,
        "UPGRADE COLUMN MAPPING", {"mode": "name"},
        extra_actions=[
            _merged_protocol(snap.protocol, ("columnMapping",), ("columnMapping",))
        ],
        checkpoint_interval=checkpoint_interval,
    )


def delta_log_cleanup(spark, path: str) -> list[str]:
    """Metadata retention (the log half of VACUUM): delete JSON commits at
    or before the newest COMPLETE checkpoint — they are redundant for
    state reconstruction (the checkpoint IS the folded state) and real
    tables clean them on the same rule. Commits after the checkpoint are
    never touched; with no checkpoint this is a no-op. Time travel to
    cleaned versions and timestamp-based resolution over them stop
    working — the protocol's own history-retention trade.

    Returns the deleted log file names."""
    from pos_dlt_spark.sources.delta import _checkpoint_complete, _list_log

    log_dir = os.path.join(path, "_delta_log")
    commits, checkpoints = _list_log(log_dir)
    usable = [v for v in checkpoints if _checkpoint_complete(checkpoints[v])]
    if not usable:
        return []
    horizon = max(usable)
    deleted = []
    for v, p in commits:
        if v <= horizon:
            os.remove(p)
            deleted.append(os.path.basename(p))
    return deleted


def delta_restore(spark, path: str, version: int | None = None, timestamp=None) -> int:
    """RESTORE TABLE ... TO VERSION/TIMESTAMP AS OF: commit a new version
    whose live set equals the target snapshot's — remove every currently
    live file not in it, re-add every file it had (possible while the
    files survive vacuum; a vacuumed restore target fails on the snapshot
    fold or at read, never silently). History is preserved: restore adds
    a commit, it never rewrites the log — delta's own semantics.

    Returns the committed version."""
    target = delta_snapshot(spark, path, version, timestamp=timestamp)
    current = delta_snapshot(spark, path)
    # no _writer_supports gate: restore is METADATA-ONLY (it re-points
    # the live set at existing files, writing no data), so even id-mode
    # column-mapping tables — whose data files this writer refuses to
    # produce — restore safely
    cur_live = {rel for rel, _ in current.files}
    tgt_live = {rel for rel, _ in target.files}
    # live identity includes the deletion vector: a DV delete changes the
    # table's rows without changing any file PATH
    def identity(s: DeltaSnapshot):
        return {
            (rel, json.dumps(s.adds[rel].get("deletionVector"), sort_keys=True))
            for rel, _ in s.files
        }

    if identity(current) == identity(target) and current.schema == target.schema:
        return current.version
    from pos_dlt_spark.sources.dv import dv_relative_path

    missing = [
        rel for rel in tgt_live if not os.path.exists(os.path.join(path, rel))
    ]
    for rel in sorted(tgt_live):
        dv = target.adds[rel].get("deletionVector")
        if dv:
            dvrel = dv_relative_path(dv)
            if dvrel and not os.path.exists(os.path.join(path, dvrel)):
                missing.append(dvrel)
    if missing:
        raise FileNotFoundError(
            f"restore target version {target.version} references vacuumed "
            f"files: {missing[:3]}{'...' if len(missing) > 3 else ''}"
        )
    actions = [
        fx.commit_info_action("RESTORE", {"version": target.version}),
        fx.metadata_action(
            target.schema,
            partition_columns=target.partition_columns,
            table_id=target.table_id,
            configuration=target.configuration,
        ),
    ]
    # remove the whole current live set then re-add the target's: paths
    # shared by both (possibly with different DVs) fold to the target's
    # add under path-keyed reconciliation and stay unambiguous for
    # (path, dvId)-keyed readers
    actions += [fx.remove_action(rel) for rel in sorted(cur_live)]
    actions += [{"add": target.adds[rel]} for rel in sorted(tgt_live)]
    new_version = current.version + 1
    if not _try_commit(os.path.join(path, "_delta_log"), new_version, actions):
        raise DeltaCommitConflict(
            f"version {new_version} was committed concurrently; re-run restore"
        )
    return new_version


def delta_clone(
    spark, src: str, dst: str, version: int | None = None, timestamp=None,
    deep: bool = False,
) -> int:
    """CLONE: create a new Delta table at ``dst`` from a source snapshot.

    SHALLOW (default): commit 0 REFERENCES the source snapshot's data
    files by absolute path — zero data copied, delta's own zero-copy
    dev/test-table primitive. The clone then evolves independently:
    appends/merges/deletes write new files under ``dst`` and only drop
    REFERENCES to source files (vacuum on the clone never deletes
    outside its own root — the referenced-set walk is rooted at
    ``dst``). DV sidecars resolve against the SOURCE root, so their
    descriptors convert to absolute ('p') storage.

    DEEP (``deep=True``): data files AND DV sidecars are COPIED under
    ``dst`` (relative references, fully self-contained — survives the
    source being vacuumed or dropped). The copy fans out across
    executors (one task per file batch); stats/partitionValues carry
    over from the source log unchanged since the bytes are identical.

    ``version=``/``timestamp=`` clone a time-travel snapshot. Returns
    the committed version (0)."""
    from urllib.parse import quote

    from pos_dlt_spark.sources.delta import _abs_file
    from pos_dlt_spark.sources.dv import dv_relative_path

    snap = delta_snapshot(spark, src, version, timestamp=timestamp)
    log_dir = os.path.join(dst, "_delta_log")
    if os.path.isdir(log_dir) and os.listdir(log_dir):
        raise ValueError(f"{dst} is already a Delta table")
    adds = []
    copies: list[tuple[str, str]] = []  # (absolute source, relative dest)
    for rel, _pv in snap.files:
        add = dict(snap.adds[rel])
        dv = add.get("deletionVector")
        if deep:
            # keep the source's relative layout (partition dirs intact)
            add["path"] = rel
            copies.append((os.path.abspath(_abs_file(src, rel)), rel))
            if dv and dv.get("storageType") in ("u", "p"):
                dvsrc = (
                    dv["pathOrInlineDv"]
                    if dv.get("storageType") == "p"
                    else os.path.abspath(os.path.join(src, dv_relative_path(dv)))
                )
                dvrel = f"deletion_vector_{uuid.uuid4().hex}.bin"
                copies.append((dvsrc, dvrel))
                add["deletionVector"] = {
                    **dv,
                    "storageType": "p",
                    # absolute under DST: self-contained, and the reader's
                    # 'p' resolution needs no table-root join
                    "pathOrInlineDv": os.path.abspath(os.path.join(dst, dvrel)),
                }
        else:
            # absolute, percent-encoded (the protocol's path encoding —
            # the reader unquotes before resolving)
            add["path"] = quote(os.path.abspath(_abs_file(src, rel)), safe="/")
            if dv and dv.get("storageType") == "u":
                dvrel = dv_relative_path(dv)
                add["deletionVector"] = {
                    **dv,
                    "storageType": "p",
                    "pathOrInlineDv": os.path.abspath(os.path.join(src, dvrel)),
                }
        adds.append({"add": add})
    if deep and copies:
        dst_abs = os.path.abspath(dst)
        for _s, r in copies:
            os.makedirs(
                os.path.dirname(os.path.join(dst_abs, r)) or dst_abs, exist_ok=True
            )

        def _copy_batch(it):
            import shutil as _sh

            n = 0
            for s, r in it:
                _sh.copyfile(s, os.path.join(dst_abs, r))
                n += 1
            yield n

        par = max(1, min(len(copies), spark.sparkContext.defaultParallelism))
        copied = sum(
            spark.sparkContext.parallelize(copies, par).mapPartitions(_copy_batch).collect()
        )
        if copied != len(copies):
            raise RuntimeError(f"deep clone copied {copied}/{len(copies)} files")
    actions = [
        fx.commit_info_action(
            "CLONE", {"source": src, "sourceVersion": snap.version}
        ),
        _merged_protocol(snap.protocol),
        fx.metadata_action(
            snap.schema,
            partition_columns=snap.partition_columns,
            configuration=snap.configuration or None,
        ),
    ] + adds
    if not _try_commit(log_dir, 0, actions):
        raise DeltaCommitConflict("commit 0 appeared concurrently during clone")
    return 0


def convert_to_delta(spark, parquet_dir: str) -> int:
    """CONVERT TO DELTA: impose a Delta log on an EXISTING parquet
    directory in place — commit 0 adds every data file with
    footer-derived stats; Hive-style ``col=value/`` subdirectories become
    the table's partition columns (types inferred by Spark's partition
    discovery on one schema-only read). No data file is rewritten or
    moved — the conversion is one metadata commit, exactly delta's own
    ``CONVERT TO DELTA`` contract. Fails if a log already exists.

    Returns the committed version (0)."""
    from urllib.parse import unquote

    log_dir = os.path.join(parquet_dir, "_delta_log")
    if os.path.isdir(log_dir) and os.listdir(log_dir):
        raise ValueError(f"{parquet_dir} is already a Delta table")
    full = spark.read.parquet(parquet_dir)
    schema = full.schema
    # partition columns = those Spark's discovery added beyond the files'
    # physical columns (sample one file's footer for the physical set)
    rels = []
    for root, _dirs, files in os.walk(parquet_dir):
        for n in sorted(files):
            if n.endswith(".parquet") and not n.startswith("_"):
                rels.append(os.path.relpath(os.path.join(root, n), parquet_dir))
    if not rels:
        raise ValueError(f"no parquet files under {parquet_dir}")
    import pyarrow.parquet as pq

    physical = set(pq.read_schema(os.path.join(parquet_dir, rels[0])).names)
    partition_columns = [f.name for f in schema.fields if f.name not in physical]

    adds = []
    for rel in rels:
        pvals: dict[str, str | None] = {}
        for seg in rel.split(os.sep)[:-1]:
            k, eq, v = seg.partition("=")
            if eq:
                pvals[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        missing = [c for c in partition_columns if c not in pvals]
        if missing:
            raise ValueError(
                f"file {rel} lacks partition segments for {missing}; "
                "convert requires a consistent Hive layout"
            )
        fpath = os.path.join(parquet_dir, rel)
        adds.append(
            fx.add_action(
                rel.replace(os.sep, "/"),
                size=os.path.getsize(fpath),
                partition_values={c: pvals[c] for c in partition_columns} or None,
                stats=_file_stats(fpath),
            )
        )
    actions = [
        fx.commit_info_action("CONVERT", {"numFiles": len(adds)}),
        fx.protocol_action(),
        fx.metadata_action(schema, partition_columns=partition_columns),
    ] + adds
    if not _try_commit(log_dir, 0, actions):
        raise DeltaCommitConflict("commit 0 appeared concurrently during convert")
    return 0
