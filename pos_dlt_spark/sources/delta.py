"""Read-only Delta Lake table reader built from the PUBLIC Delta
transaction-protocol specification (delta-io PROTOCOL.md) — no
delta-spark dependency.

The reference pipeline stores every DLT table as a Delta table and rides
Delta MERGE for CDC (reference `03_Bronze-to-Silver ETL.py:124-129,
379-384`); a user bringing an existing Delta table needs at minimum to
READ it. A Delta table is just parquet files plus an action log:

    table/
      _delta_log/00000000000000000000.json      # newline-delimited actions
      _delta_log/00000000000000000010.checkpoint.parquet   # optional
      _delta_log/_last_checkpoint                # optional pointer
      part-....parquet                           # data files

State reconstruction (protocol "Action Reconciliation"): start from the
newest checkpoint at version <= the requested one (its rows ARE the
folded state), then replay the JSON commits after it; the live file set
is `add` actions keyed by (path, deletion-vector id) minus later
`remove`s; the newest `metaData` wins and carries the table schema
(Spark StructType JSON) and partition columns; the newest `protocol`
gates reader compatibility.

Scale design: the log fold is DRIVER-SIDE METADATA, bounded by file
count, not data size — exactly how delta's own light-weight clients
(delta-rs, duckdb delta) read, and the checkpoint keeps it O(files since
last checkpoint). The DATA path stays fully distributed: the fold yields
a file list that feeds one `spark.read.parquet(*files)` scan with the
log's schema pinned (so column pruning / predicate pushdown / split
planning all work normally, and files written before a column was added
read as nulls — the protocol's schema-evolution-on-read). Partition
values live in the log, not the files; Hive-style layouts (what Delta
writers actually produce) recover them via ``basePath`` partition
discovery inside the same single scan, and non-Hive layouts fall back to
one scan per distinct partition tuple (bounded by partition count — the
same cardinality any partition listing already pays).

Supported: reader version 1 and 2 tables, version-3 readerFeatures
timestampNtz / columnMapping (name + id read) / v2Checkpoint (manifest +
sidecar fold, parquet or json manifests), classic single- and multi-part
checkpoints, and DELETION VECTORS on live files (post-DELETE tables
from modern writers): the descriptor's roaring bitmap is decoded
driver-side (sources/dv.py) and applied as a distributed row-index
anti-join against ``_metadata.row_index``. Unsupported features fail
loudly: column mapping id/name (physical column renames), unknown DV
storage types/encodings.
"""

from __future__ import annotations

import json
import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

_COMMIT_RE = re.compile(r"^(\d{20})\.json$")
_CKPT_RE = re.compile(r"^(\d{20})\.checkpoint(?:\.(\d+)\.(\d+))?\.parquet$")
# V2 checkpoints: a single MANIFEST file named with a writer-chosen uuid
# (json or parquet) whose actions include `sidecar` references to
# add/remove files under _delta_log/_sidecars/ — what modern delta-spark
# writes under the v2Checkpoint table feature. The uuid segment contains
# letters/dashes, so it can never collide with the classic multi-part
# `.NNNNNNNNNN.NNNNNNNNNN.` numeric pattern above.
_CKPT_V2_RE = re.compile(r"^(\d{20})\.checkpoint\.([0-9a-fA-F-]{8,})\.(parquet|json)$")

_SUPPORTED_READER_FEATURES = {
    "timestampNtz",
    "columnMapping",
    "deletionVectors",
    "v2Checkpoint",
}
# deletionVectors and v2Checkpoint are genuinely supported (read + write /
# read paths). columnMapping name/id modes are read-supported; the
# snapshot fold validates the mapping metadata and raises on gaps.


class DeltaProtocolError(Exception):
    """The table uses a protocol feature this reader cannot honor."""


@dataclass
class DeltaSnapshot:
    """Folded state of a Delta table at one version (driver-side metadata)."""

    path: str
    version: int
    schema: StructType
    partition_columns: list[str]
    configuration: dict[str, str]
    table_id: str | None = None  # metaData.id — stable across the table's life
    # column mapping (protocol "Column Mapping"): 'none' | 'name' | 'id'.
    # physical_names maps LOGICAL -> PHYSICAL column name; field_ids maps
    # LOGICAL name -> delta.columnMapping.id. files[...] partitionValues
    # are normalized to LOGICAL keys at fold time; adds stay raw.
    column_mapping: str = "none"
    physical_names: dict[str, str] = field(default_factory=dict)
    field_ids: dict[str, int] = field(default_factory=dict)
    # (relative file path, partition_values dict) for every live file
    files: list[tuple[str, dict[str, str | None]]] = field(default_factory=list)
    # full add actions keyed by relative path (per-file stats for skipping)
    adds: dict[str, dict] = field(default_factory=dict)
    # SetTransaction watermarks: appId -> highest committed version — the
    # protocol's idempotent-streaming-write primitive (a writer skips a
    # batch whose (appId, version) it has already committed)
    txns: dict[str, int] = field(default_factory=dict)

    @property
    def data_schema(self) -> StructType:
        """Table schema minus partition columns — what the parquet files hold."""
        return StructType(
            [f for f in self.schema.fields if f.name not in self.partition_columns]
        )


def _list_log(log_dir: str) -> tuple[list[tuple[int, str]], dict[int, list[str]]]:
    commits: list[tuple[int, str]] = []
    checkpoints: dict[int, list[str]] = {}
    for name in os.listdir(log_dir):
        m = _COMMIT_RE.match(name)
        if m:
            commits.append((int(m.group(1)), os.path.join(log_dir, name)))
            continue
        m = _CKPT_RE.match(name) or _CKPT_V2_RE.match(name)
        if m:
            checkpoints.setdefault(int(m.group(1)), []).append(os.path.join(log_dir, name))
    commits.sort()
    for parts in checkpoints.values():
        parts.sort()
    return commits, checkpoints


def _checkpoint_complete(parts: list[str]) -> bool:
    """A checkpoint is usable when a single-file part exists OR the
    multi-part set is COMPLETE per the declared ``<part>.<total>`` suffix.
    A partially-present multi-part checkpoint (interrupted copy/cleanup of
    an external table) would otherwise fold silently incomplete state —
    missing files, wrong schema — instead of failing or falling back."""
    multi: dict[int, set[int]] = {}
    for p in parts:
        name = os.path.basename(p)
        if _CKPT_V2_RE.match(name):
            return True  # v2 manifest: one file (sidecars checked at read)
        m = _CKPT_RE.match(name)
        if m is None:
            continue
        if m.group(2) is None:
            return True  # classic single-file checkpoint
        multi.setdefault(int(m.group(3)), set()).add(int(m.group(2)))
    return any(present == set(range(1, total + 1)) for total, present in multi.items())


def _check_protocol(proto: dict) -> None:
    if proto.get("minReaderVersion", 1) > 3:
        raise DeltaProtocolError(
            f"minReaderVersion {proto['minReaderVersion']} > 3 not supported"
        )
    unsupported = set(proto.get("readerFeatures") or ()) - _SUPPORTED_READER_FEATURES
    if unsupported:
        raise DeltaProtocolError(f"unsupported readerFeatures: {sorted(unsupported)}")


def _parquet_checkpoint_actions(path: str):
    """Yield action dicts from one checkpoint/sidecar parquet file
    (struct columns txn/add/remove/metaData/protocol, plus
    sidecar/checkpointMetadata in v2 manifests). Read via pyarrow on the
    driver: the checkpoint is METADATA (its size rides file count); a
    billion-file table would read it with a distributed scan instead,
    but then the whole driver-side fold strategy changes with it.

    The dominant column (``add`` — every live file) is decoded
    COLUMNARLY: one C-loop ``to_pylist`` per flat field + a zip into
    dicts, instead of pyarrow's generic per-row nested-struct walk
    (measured at 1M files: 46.7 s -> see SCALE.md — the walk was ~4x the
    whole JSON-replay fold). Emission order groups by action type, which
    is fold-equivalent: a checkpoint holds folded state (one add per
    live path, tombstones disjoint from adds), so reconciliation is
    order-insensitive within it."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    def as_dict(v):
        # parquet map type reads back as a list of (key, value) tuples
        return dict(v) if isinstance(v, list) else (v or {})

    tbl = pq.read_table(path)
    names = set(tbl.column_names)
    for key in ("metaData", "protocol", "txn", "remove", "sidecar", "checkpointMetadata"):
        if key not in names:
            continue
        for v in tbl.column(key).to_pylist():
            if v is None:
                continue
            if key == "metaData":
                v = {**v, "configuration": as_dict(v.get("configuration"))}
                if v.get("format") is not None:
                    v["format"] = {
                        **v["format"],
                        "options": as_dict(v["format"].get("options")),
                    }
            yield {key: v}
    if "add" not in names:
        return
    add_col = tbl.column("add")
    add_type = add_col.type
    field_names = [add_type.field(i).name for i in range(add_type.num_fields)]
    columns = {
        fn: pc.struct_field(add_col, fn).to_pylist() for fn in field_names
    }
    valid = pc.is_valid(add_col).to_pylist()
    for i, ok in enumerate(valid):
        if not ok:
            continue
        v = {fn: columns[fn][i] for fn in field_names}
        v["partitionValues"] = as_dict(v.get("partitionValues"))
        yield {"add": v}


def _checkpoint_actions(spark: SparkSession, parts: list[str]):
    """Yield fold-ready action dicts from a checkpoint: classic single /
    multi-part parquet, or a V2 MANIFEST (parquet or json) whose
    ``sidecar`` actions reference add/remove parquet files under
    ``_delta_log/_sidecars/`` — resolved and folded here; a missing
    sidecar fails loudly (a silent partial fold would drop files).
    ``checkpointMetadata`` rows are v2 markers with no fold effect."""

    def resolve(src: str, actions):
        log_dir = os.path.dirname(src)
        for a in actions:
            if "sidecar" in a:
                sc = os.path.join(log_dir, "_sidecars", a["sidecar"]["path"])
                if not os.path.exists(sc):
                    raise FileNotFoundError(
                        f"v2 checkpoint sidecar missing: {sc} (referenced by {src})"
                    )
                yield from _parquet_checkpoint_actions(sc)
            elif "checkpointMetadata" in a:
                continue
            else:
                yield a

    for part in parts:
        if part.endswith(".json"):
            yield from resolve(part, _commit_actions(part))
        else:
            yield from resolve(part, _parquet_checkpoint_actions(part))


def _commit_actions(path: str):
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if line:
                yield json.loads(line)


def _commit_info(commit_path: str) -> dict | None:
    """The commit's commitInfo action, if recorded (writers emit it first;
    scan the whole file to be safe — it is driver metadata either way)."""
    for a in _commit_actions(commit_path):
        if "commitInfo" in a:
            return a["commitInfo"]
    return None


def _commit_time(commit_path: str) -> float:
    """Commit wall-clock in epoch seconds: the commitInfo timestamp when
    present (survives file copies; what real Delta prefers), else the log
    file's mtime."""
    ci = _commit_info(commit_path)
    if ci and ci.get("timestamp") is not None:
        return int(ci["timestamp"]) / 1000.0
    return os.path.getmtime(commit_path)


def version_at_timestamp(path: str, ts) -> int:
    """TIMESTAMP AS OF resolution: the newest version whose commit landed
    at or before ``ts`` (epoch seconds, datetime, or ISO string) — commit
    time comes from the commitInfo action when present, else the log
    file's mtime (the same preference order real Delta applies). Versions
    whose JSON was cleaned up after a checkpoint cannot be
    timestamp-resolved (their commit time is gone with the file) — same
    limitation as the protocol's own history retention."""
    import datetime

    if isinstance(ts, str):
        ts = datetime.datetime.fromisoformat(ts)
    if isinstance(ts, datetime.datetime):
        ts = ts.timestamp()
    log_dir = os.path.join(path, "_delta_log")
    commits, _ = _list_log(log_dir)
    eligible = [v for v, p in commits if _commit_time(p) <= float(ts)]
    if not eligible:
        raise ValueError(
            f"no commit at or before timestamp {ts} in {path} "
            f"(earliest surviving commit: "
            f"{min((v for v, _ in commits), default=None)})"
        )
    return max(eligible)


def delta_history(spark: SparkSession, path: str) -> DataFrame:
    """DESCRIBE HISTORY: one row per surviving commit — version,
    timestamp, operation, operationParameters JSON, counts of
    add/remove/cdc actions. Driver metadata (the same walk the fold
    does); commits without a commitInfo (foreign minimal writers) show a
    null operation but still count their actions."""
    from pos_dlt_spark.tables import local_df

    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    commits, _ = _list_log(log_dir)
    rows = []
    for v, p in sorted(commits, reverse=True):
        ci = _commit_info(p) or {}
        n_add = n_remove = n_cdc = 0
        for a in _commit_actions(p):
            if "add" in a:
                n_add += 1
            elif "remove" in a:
                n_remove += 1
            elif "cdc" in a:
                n_cdc += 1
        rows.append(
            (
                v,
                float(_commit_time(p)),
                ci.get("operation") or "",
                json.dumps(ci.get("operationParameters") or {}, sort_keys=True),
                ci.get("engineInfo") or "",
                n_add,
                n_remove,
                n_cdc,
            )
        )
    return local_df(
        spark,
        rows,
        "version bigint, timestamp double, operation string, "
        "operationParameters string, engineInfo string, "
        "num_added_files int, num_removed_files int, num_change_files int",
    )


def delta_snapshot(
    spark: SparkSession, path: str, version: int | None = None, timestamp=None
) -> DeltaSnapshot:
    """Fold the action log into the live-file snapshot at ``version``
    (default: latest). ``timestamp=`` resolves TIMESTAMP AS OF instead
    (mutually exclusive with ``version``). Raises
    :class:`DeltaProtocolError` on features a plain parquet scan cannot
    honor."""
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    if timestamp is not None:
        if version is not None:
            raise ValueError("pass version OR timestamp, not both")
        version = version_at_timestamp(path, timestamp)
    commits, checkpoints = _list_log(log_dir)
    if not commits and not checkpoints:
        raise FileNotFoundError(f"empty _delta_log in {path}")
    latest = max(
        [v for v, _ in commits] + list(checkpoints), default=-1
    )
    target = latest if version is None else version
    if version is not None and version > latest:
        raise ValueError(f"version {version} > latest {latest}")

    # newest COMPLETE checkpoint at or before the target; a partial
    # multi-part set (interrupted copy) is skipped — the fold falls back to
    # an older complete checkpoint or full JSON replay, and only fails if
    # neither can reconstruct the version (the replay-gap check below).
    ckpt_version = next(
        (
            v
            for v in sorted((v for v in checkpoints if v <= target), reverse=True)
            if _checkpoint_complete(checkpoints[v])
        ),
        None,
    )

    live: dict[str, dict] = {}  # relative path -> add action
    meta: dict | None = None
    proto: dict | None = None
    txns: dict[str, int] = {}

    def apply(action: dict) -> None:
        nonlocal meta, proto
        if "metaData" in action:
            meta = action["metaData"]
        elif "protocol" in action:
            proto = action["protocol"]
            _check_protocol(proto)
        elif "add" in action:
            add = action["add"]
            live[add["path"]] = add
        elif "remove" in action:
            live.pop(action["remove"]["path"], None)
        elif "txn" in action:
            t = action["txn"]
            if t.get("appId") is not None and t.get("version") is not None:
                txns[t["appId"]] = max(txns.get(t["appId"], -1), int(t["version"]))

    if ckpt_version is not None:
        for action in _checkpoint_actions(spark, checkpoints[ckpt_version]):
            apply(action)
        replay = [(v, p) for v, p in commits if ckpt_version < v <= target]
    else:
        replay = [(v, p) for v, p in commits if v <= target]
        if not replay or replay[0][0] != 0:
            raise FileNotFoundError(
                f"cannot reconstruct version {target}: no checkpoint and commit 0 missing"
            )
    expected = (ckpt_version + 1) if ckpt_version is not None else 0
    for v, p in replay:
        if v != expected:
            raise FileNotFoundError(f"missing commit version {expected} in {log_dir}")
        expected = v + 1
        for action in _commit_actions(p):
            apply(action)

    if meta is None:
        raise DeltaProtocolError("no metaData action found in log")
    fmt = (meta.get("format") or {}).get("provider", "parquet")
    if fmt != "parquet":
        raise DeltaProtocolError(f"unsupported format provider: {fmt}")
    conf = meta.get("configuration") or {}
    cm = conf.get("delta.columnMapping.mode", "none") or "none"
    if cm not in ("none", "name", "id"):
        raise DeltaProtocolError(f"column mapping mode '{cm}' not supported")
    # deletion vectors on live files are SUPPORTED: the descriptor rides
    # the add action into the snapshot and the read path applies it as a
    # distributed row-index anti-join (see _apply_deletion_vectors);
    # unsupported DV encodings fail loudly at read time in sources/dv.py.

    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    physical_names: dict[str, str] = {}
    field_ids: dict[str, int] = {}
    if cm != "none":
        # column-mapping metadata rides the schema fields: physicalName is
        # the parquet column name ('name' mode resolves by it), id is the
        # parquet field id ('id' mode resolves by it — rename-proof)
        for f in schema.fields:
            md = f.metadata or {}
            pn = md.get("delta.columnMapping.physicalName")
            if pn:
                physical_names[f.name] = pn
            fid = md.get("delta.columnMapping.id")
            if fid is not None:
                field_ids[f.name] = int(fid)
        if cm == "name" and len(physical_names) < len(schema.fields):
            raise DeltaProtocolError(
                "column mapping 'name' but some fields lack "
                "delta.columnMapping.physicalName"
            )
        if cm == "id" and len(field_ids) < len(schema.fields):
            raise DeltaProtocolError(
                "column mapping 'id' but some fields lack delta.columnMapping.id"
            )
    phys2logical = {p: l for l, p in physical_names.items()}
    return DeltaSnapshot(
        path=path,
        version=target,
        schema=schema,
        partition_columns=list(meta.get("partitionColumns") or []),
        configuration=conf,
        table_id=meta.get("id"),
        column_mapping=cm,
        physical_names=physical_names,
        field_ids=field_ids,
        files=[
            # add.partitionValues are keyed by PHYSICAL name under column
            # mapping; normalize to logical so every downstream consumer
            # speaks one naming
            (p, {phys2logical.get(k, k): v for k, v in (a.get("partitionValues") or {}).items()})
            for p, a in sorted(live.items())
        ],
        adds=dict(sorted(live.items())),
        txns=txns,
    )


def replay_adds(
    spark: SparkSession,
    path: str,
    start_version: int = 0,
    end_version: int | None = None,
) -> list[tuple[int, list[str]]]:
    """Commit-ordered streaming replay plan: ``[(version, [abs file
    paths]), ...]`` of the DATA-CHANGE adds in each commit — the
    protocol-faithful backfill half of a Delta streaming source. Adds
    with ``dataChange: false`` are SKIPPED (they are compaction/OPTIMIZE
    rewrites of rows already delivered by earlier commits; replaying
    them would duplicate data — the same rule delta's own streaming
    source applies). Removes are never retractions on this path; a
    commit that removes-and-rewrites WITH dataChange true is an update
    the consumer's CDC semantics must absorb (exactly what
    ApplyChanges's latest-per-key merge does).

    Requires the replayed files to still exist — a VACUUM that physically
    deleted files removed before ``start_version``'s checkpoint horizon
    makes those commits unreplayable (the same constraint real Delta
    streaming reads have)."""
    log_dir = os.path.join(path, "_delta_log")
    commits, _ = _list_log(log_dir)
    out: list[tuple[int, list[str]]] = []
    for v, p in commits:
        if v < start_version or (end_version is not None and v > end_version):
            continue
        files = []
        for a in _commit_actions(p):
            if "add" not in a or not a["add"].get("dataChange", True):
                continue
            if a["add"].get("deletionVector"):
                # a DV-carrying add is a row-level DELETE of already-
                # delivered data; replaying the file would resurrect the
                # deleted rows. Real Delta streaming throws on change
                # commits by default (skipChangeCommits opts out) — same.
                raise DeltaProtocolError(
                    f"commit {v} deletes rows via a deletion vector; "
                    "streaming replay cannot represent row-level deletes"
                )
            files.append(_abs_file(path, a["add"]["path"]))
        if files:
            out.append((v, files))
    return out


def _abs_file(table_path: str, rel: str) -> str:
    # protocol: add.path is RELATIVE to the table root and URL-encoded;
    # absolute paths (shallow clones) pass through untouched
    from urllib.parse import unquote, urlparse

    rel = unquote(rel)
    if urlparse(rel).scheme or os.path.isabs(rel):
        return rel
    return os.path.join(table_path, rel)


def _hive_style(files: list[tuple[str, dict[str, str | None]]], part_cols: list[str]) -> bool:
    """True when every live file embeds every partition column Hive-style
    (``col=value/`` directory segments whose values agree with the log) —
    then ONE scan with basePath partition discovery reproduces the log's
    partition values."""
    from urllib.parse import unquote

    for rel, pvals in files:
        kv: dict[str, str | None] = {}
        for seg in rel.split("/")[:-1]:
            k, eq, v = seg.partition("=")
            if eq:
                kv[k] = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        for c in part_cols:
            if c not in kv or kv[c] != pvals.get(c):
                return False
    return True


def _stats_excludes(add: dict, col: str, op: str, value) -> bool:
    """True if the add action's per-file statistics PROVE no row of the
    file can satisfy ``col op value``. Conservative: missing/unparseable
    stats, or a column absent from them, keep the file."""
    raw = add.get("stats")
    if not raw:
        return False
    try:
        stats = json.loads(raw) if isinstance(raw, str) else raw
    except (TypeError, ValueError):
        return False
    mins = (stats.get("minValues") or {})
    maxs = (stats.get("maxValues") or {})
    lo, hi = mins.get(col), maxs.get(col)
    if lo is None or hi is None:
        return False
    try:
        if op == "=":
            return value < lo or value > hi
        if op == "<":
            return lo >= value
        if op == "<=":
            return lo > value
        if op == ">":
            return hi <= value
        if op == ">=":
            return hi < value
        if op == "in":
            return all(v < lo or v > hi for v in value)
    except TypeError:  # cross-type compare — stats unusable for this predicate
        return False
    return False


def skip_files(
    snap: DeltaSnapshot, predicates: list[tuple[str, str, object]]
) -> tuple[DeltaSnapshot, int]:
    """DATA SKIPPING from the transaction log: drop every live file whose
    ``add.stats`` (numRecords/minValues/maxValues, written by Delta
    writers) prove it cannot contain a matching row. This is the log-side
    half of Delta's scan pruning — at 100 TB it is the difference between
    listing a million files and scanning the dozen whose min/max straddle
    the predicate, BEFORE any task is scheduled. Purely driver-side
    metadata, conjunctive semantics (a file is dropped if ANY predicate
    excludes it), and strictly conservative: files without usable stats
    are kept, so the subsequent scan (which still applies the real
    filter) returns exactly the same rows with or without skipping.

    Returns (pruned snapshot, n_files_skipped)."""
    # predicates speak LOGICAL names; stats in column-mapping tables are
    # keyed by the physical parquet names
    preds = [
        (snap.physical_names.get(c, c), op, v) for c, op, v in predicates
    ]
    kept, skipped = [], 0
    for rel, pvals in snap.files:
        add = snap.adds.get(rel, {})
        if any(_stats_excludes(add, c, op, v) for c, op, v in preds):
            skipped += 1
        else:
            kept.append((rel, pvals))
    import dataclasses

    out = dataclasses.replace(
        snap,
        files=kept,
        adds={rel: snap.adds[rel] for rel, _ in kept if rel in snap.adds},
    )
    return out, skipped


def scan_rels(
    spark: SparkSession,
    snap: DeltaSnapshot,
    rels: list[str] | None = None,
    with_meta: bool = False,
) -> DataFrame | None:
    """Distributed scan of (a subset of) a snapshot's live files with the
    LOG's schema pinned and partition values recovered (Hive discovery in
    one scan when the layout allows, per-partition-tuple literal unions
    otherwise). With ``with_meta`` two helper columns ride along:
    ``__fp`` (normalized absolute file path) and ``__ri`` (the row's
    file-absolute index from ``_metadata.row_index`` — stable under
    row-group skipping, which is exactly what deletion vectors address).
    Returns None when the selection is empty."""
    from pyspark.sql.types import StructField as _SF
    from pyspark.sql.types import StructType as _ST

    path = snap.path
    wanted = [(rel, pv) for rel, pv in snap.files if rels is None or rel in set(rels)]
    if not wanted:
        return None
    out_cols = [f.name for f in snap.schema.fields]
    types = {f.name: f.dataType for f in snap.schema.fields}

    def meta_cols():
        # file_path arrives scheme-qualified (file:///…); normalize to a
        # plain absolute path so the DV exclusion join has one rendering
        return [
            F.regexp_replace(
                F.col("_metadata.file_path"), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/"
            ).alias("__fp"),
            F.col("_metadata.row_index").alias("__ri"),
        ]

    def read_files(fpaths: list[str], target, meta: bool) -> DataFrame:
        """One pinned-schema scan of data files, resolving COLUMN MAPPING:
        'name' reads under the physical parquet names and aliases back to
        logical; 'id' pins parquet field ids on the requested schema and
        lets Spark's native field-id resolution match columns regardless
        of their physical names (rename-proof, the mode's whole point).
        ``meta`` appends __fp/__ri BEFORE any projection — the _metadata
        pseudo-column only resolves against the scan itself."""
        extra = meta_cols() if meta else []
        if snap.column_mapping == "none":
            df = spark.read.schema(target).parquet(*fpaths)
            return df.select("*", *extra) if meta else df
        if snap.column_mapping == "name":
            phys = _ST(
                [_SF(snap.physical_names[f.name], f.dataType, True) for f in target.fields]
            )
            df = spark.read.schema(phys).parquet(*fpaths)
            return df.select(
                *[
                    F.col(f"`{snap.physical_names[f.name]}`").alias(f.name)
                    for f in target.fields
                ],
                *extra,
            )
        # id mode
        spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
        fields = [
            _SF(f.name, f.dataType, True, {"parquet.field.id": snap.field_ids[f.name]})
            for f in target.fields
        ]
        df = spark.read.schema(_ST(fields)).parquet(*fpaths)
        return df.select("*", *extra) if meta else df

    if not snap.partition_columns:
        return read_files(
            [_abs_file(path, rel) for rel, _ in wanted], snap.schema, with_meta
        )

    if snap.column_mapping == "none" and _hive_style(wanted, snap.partition_columns):
        df = spark.read.schema(snap.schema).option("basePath", path).parquet(
            *[_abs_file(path, rel) for rel, _ in wanted]
        )
        sel = [F.col(c).cast(types[c]).alias(c) for c in out_cols]
        return df.select(*sel, *meta_cols()) if with_meta else df.select(*sel)

    # non-Hive layout (and every column-mapping table — their directories
    # carry PHYSICAL names, so Hive discovery would resolve the wrong
    # columns): group files by partition tuple, union one pinned-schema
    # scan per tuple with the log's partition values as literals.
    groups: dict[tuple, list[str]] = {}
    for rel, pvals in wanted:
        key = tuple(pvals.get(c) for c in snap.partition_columns)
        groups.setdefault(key, []).append(_abs_file(path, rel))
    parts: list[DataFrame] = []
    for key, fpaths in sorted(groups.items(), key=lambda kv: tuple(map(str, kv[0]))):
        d = read_files(fpaths, snap.data_schema, with_meta)
        for c, v in zip(snap.partition_columns, key):
            lit = F.lit(None) if v is None else F.lit(v)
            d = d.withColumn(c, lit.cast(types[c]))
        cols_sel = out_cols + (["__fp", "__ri"] if with_meta else [])
        parts.append(d.select(*cols_sel))
    out = parts[0]
    for d in parts[1:]:
        out = out.unionByName(d)
    return out


def _apply_deletion_vectors(
    spark: SparkSession, snap: DeltaSnapshot, dv_rels: list[str]
) -> DataFrame:
    """Scan the DV-carrying files and drop their deleted rows via a
    broadcast row-index ANTI-JOIN — the Spark-native rendering of what
    delta's scan does with per-task bitmap filters. The bitmaps are
    decoded DRIVER-SIDE (sources/dv.py — metadata work bounded by DV
    size, like the log fold itself); the row filtering is one distributed
    JVM join keyed on (file, _metadata.row_index), no Python in the data
    path. Files without DVs never pay the join."""
    from pos_dlt_spark.sources.dv import read_dv_descriptor
    from pos_dlt_spark.tables import local_df

    pairs: list[tuple[str, int]] = []
    for rel in dv_rels:
        dv = snap.adds[rel]["deletionVector"]
        fp = os.path.abspath(_abs_file(snap.path, rel))
        pairs.extend((fp, int(i)) for i in read_dv_descriptor(snap.path, dv))
    scan = scan_rels(spark, snap, dv_rels, with_meta=True)
    if not pairs:
        return scan.drop("__fp", "__ri")
    excl = local_df(spark, pairs, "__xfp string, __xri bigint")
    out = scan.join(
        F.broadcast(excl),
        (F.col("__fp") == F.col("__xfp")) & (F.col("__ri") == F.col("__xri")),
        "left_anti",
    )
    return out.drop("__fp", "__ri")


def read_delta(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    prune: list[tuple[str, str, object]] | None = None,
    timestamp=None,
) -> DataFrame:
    """Read a Delta table as a DataFrame — the protocol fold picks the
    files; the scan is ordinary distributed parquet with the LOG's schema
    pinned (schema evolution on read: pre-evolution files yield nulls for
    added columns; dropped columns never appear even if old files carry
    them). ``version=`` time-travels to an earlier snapshot, served from
    the same log at zero extra storage. Live files carrying DELETION
    VECTORS (post-DELETE tables from modern writers) are read minus their
    deleted rows (see :func:`_apply_deletion_vectors`); files without DVs
    take the plain scan, untaxed.

    ``prune`` enables log-stats DATA SKIPPING (see :func:`skip_files`):
    ``[("col", op, value), ...]`` with op in ``= < <= > >= in``,
    conjunctive. It only drops files whose stats PROVE exclusion — the
    caller still applies the real ``.filter`` for row-level semantics;
    with or without ``prune`` the filtered result is identical (DV'd
    file stats describe the physical file, a superset of live rows, so
    skipping stays conservative). ``timestamp=`` is TIMESTAMP AS OF
    (see :func:`version_at_timestamp`)."""
    snap = delta_snapshot(spark, path, version, timestamp=timestamp)
    if prune:
        snap, _ = skip_files(snap, prune)
    if not snap.files:
        return spark.createDataFrame([], snap.schema)
    dv_rels = [
        rel for rel, _ in snap.files if snap.adds.get(rel, {}).get("deletionVector")
    ]
    plain = scan_rels(
        spark, snap, [rel for rel, _ in snap.files if rel not in set(dv_rels)]
    )
    if not dv_rels:
        return plain
    dvpart = _apply_deletion_vectors(spark, snap, dv_rels)
    return plain.unionByName(dvpart) if plain is not None else dvpart
