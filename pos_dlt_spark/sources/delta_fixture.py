"""Synthetic Delta-log builder for tests and gate queries.

This is NOT Delta write support: it emits protocol-shaped `_delta_log`
fixtures (JSON commits, classic checkpoint parquet, `_last_checkpoint`)
so :mod:`pos_dlt_spark.sources.delta` can be exercised against tables
whose byte layout follows the PUBLIC Delta protocol spec. It does no
atomic commit arbitration, no optimistic concurrency, no invariant
enforcement — a real writer's whole job. Kept separate from the reader
so the boundary is explicit.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql.types import StructType


def protocol_action(min_reader: int = 1, min_writer: int = 2, **extra) -> dict:
    return {"protocol": {"minReaderVersion": min_reader, "minWriterVersion": min_writer, **extra}}


def metadata_action(
    schema: StructType,
    partition_columns: list[str] | None = None,
    table_id: str | None = None,
    configuration: dict[str, str] | None = None,
) -> dict:
    return {
        "metaData": {
            "id": table_id or str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema.jsonValue()),
            "partitionColumns": partition_columns or [],
            "configuration": configuration or {},
            "createdTime": 0,
        }
    }


def add_action(
    rel_path: str,
    size: int = 0,
    partition_values: dict[str, str | None] | None = None,
    **extra,
) -> dict:
    return {
        "add": {
            "path": rel_path,
            "partitionValues": partition_values or {},
            "size": size,
            "modificationTime": 0,
            "dataChange": True,
            # None-valued extras are omitted, not emitted as JSON null
            # (e.g. stats=None for files whose footer pyarrow cannot
            # parse — VARIANT logical type)
            **{k: v for k, v in extra.items() if v is not None},
        }
    }


def remove_action(
    rel_path: str, data_change: bool = True, size: int | None = None
) -> dict:
    """``data_change=False`` marks a remove that reorganizes bytes without
    changing rows (OPTIMIZE/compaction) — the flag streaming replay and
    CDF derivation key on; emitting True for a compaction would make CDF
    report the whole rewritten file as deleted. ``size`` (the spec's
    optional remove field) lets the per-commit version checksum account
    tableSizeBytes incrementally — this engine's writers always pass it
    for live files."""
    out: dict = {"path": rel_path, "deletionTimestamp": 0, "dataChange": data_change}
    if size is not None:
        out["size"] = int(size)
    return {"remove": out}


def commit_info_action(operation: str, parameters: dict | None = None) -> dict:
    """commitInfo: the protocol's per-commit provenance record (operation
    name + parameters + wall-clock timestamp) — what DESCRIBE HISTORY
    reads and what in-commit-timestamp time travel prefers over file
    mtimes. Purely informational for state reconstruction (the fold
    ignores it)."""
    import time

    return {
        "commitInfo": {
            "timestamp": int(time.time() * 1000),
            "operation": operation,
            "operationParameters": {k: str(v) for k, v in (parameters or {}).items()},
            "engineInfo": "pos_dlt_spark delta_writer",
        }
    }


def domain_metadata_action(
    domain: str, configuration: str, removed: bool = False
) -> dict:
    """domainMetadata (protocol "Domain Metadata", writer feature):
    per-domain configuration string folded newest-wins; ``removed=True``
    tombstones the domain. Row tracking keeps its
    ``rowIdHighWaterMark`` in domain ``delta.rowTracking``."""
    return {
        "domainMetadata": {
            "domain": domain,
            "configuration": configuration,
            "removed": bool(removed),
        }
    }


def txn_action(app_id: str, version: int) -> dict:
    """SetTransaction: the protocol's idempotent-streaming-write marker —
    readers fold the highest version per appId; a writer skips re-committing
    a (appId, version) it has already recorded (exactly-once under
    micro-batch replay)."""
    return {"txn": {"appId": app_id, "version": version, "lastUpdated": 0}}


def write_commit(table_dir: str, version: int, actions: list[dict]) -> str:
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    path = os.path.join(log_dir, f"{version:020d}.json")
    with open(path, "w", encoding="utf-8") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    return path


def write_checkpoint(
    table_dir: str, version: int, actions: list[dict], parts: int = 1
) -> str:
    """Classic checkpoint: one parquet row per action, struct columns
    named like the actions. Real checkpoints use a map type for
    partitionValues; pyarrow renders maps back as (key, value) tuple
    lists, which the reader folds with dict() — both shapes round-trip.

    ``parts > 1`` writes the MULTI-PART layout real writers use past
    ~hundreds of thousands of files (``<v>.checkpoint.<i>.<n>.parquet``,
    1-based part numbers; actions split round-robin-by-slice — the
    protocol allows any distribution; the reader requires the COMPLETE
    set). ``_last_checkpoint`` records ``parts`` so readers can
    fast-path discovery. Returns the (first) part path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema = _action_arrow_schema()
    rows = _action_rows(actions, schema)
    log_dir = os.path.join(table_dir, "_delta_log")
    os.makedirs(log_dir, exist_ok=True)
    parts = max(1, int(parts))
    if parts == 1:
        path = os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=schema), path)
    else:
        per = -(-len(rows) // parts) if rows else 0
        path = ""
        for i in range(1, parts + 1):
            chunk = rows[(i - 1) * per : i * per] if per else []
            p = os.path.join(
                log_dir, f"{version:020d}.checkpoint.{i:010d}.{parts:010d}.parquet"
            )
            pq.write_table(pa.Table.from_pylist(chunk, schema=schema), p)
            path = path or p
    meta = {"version": version, "size": len(rows)}
    if parts > 1:
        meta["parts"] = parts
    with open(os.path.join(log_dir, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        fh.write(json.dumps(meta))
    return path


def _action_arrow_schema():
    import pyarrow as pa

    smap = pa.map_(pa.string(), pa.string())
    return pa.schema(
        [
            pa.field(
                "metaData",
                pa.struct(
                    [
                        ("id", pa.string()),
                        ("format", pa.struct([("provider", pa.string()), ("options", smap)])),
                        ("schemaString", pa.string()),
                        ("partitionColumns", pa.list_(pa.string())),
                        ("configuration", smap),
                        ("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "protocol",
                pa.struct(
                    [
                        ("minReaderVersion", pa.int32()),
                        ("minWriterVersion", pa.int32()),
                        # version-3/7 table-feature lists must survive the
                        # checkpoint: a checkpoint that folds a DV table but
                        # re-emits a bare (1,2) protocol leaves spec-compliant
                        # readers free to ignore the DV descriptors and
                        # resurrect deleted rows.
                        ("readerFeatures", pa.list_(pa.string())),
                        ("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("partitionValues", smap),
                        ("size", pa.int64()),
                        ("modificationTime", pa.int64()),
                        ("dataChange", pa.bool_()),
                        # per-file stats JSON must survive the checkpoint:
                        # real classic checkpoints carry it, and dropping it
                        # here would silently disable skip_files pruning (and
                        # delta_merge's file pruning) for every pre-checkpoint
                        # file after the first checkpoint crossing.
                        ("stats", pa.string()),
                        # deletion-vector descriptors must survive too: a
                        # checkpoint written after delta_delete(mode='dv')
                        # that dropped this struct would resurrect every
                        # DV-deleted row for all post-checkpoint snapshots.
                        (
                            "deletionVector",
                            pa.struct(
                                [
                                    ("storageType", pa.string()),
                                    ("pathOrInlineDv", pa.string()),
                                    ("offset", pa.int32()),
                                    ("sizeInBytes", pa.int32()),
                                    ("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                        # row tracking: each file's fresh-row-id base and
                        # default commit version must survive the
                        # checkpoint or every post-checkpoint read would
                        # re-derive DIFFERENT row ids
                        ("baseRowId", pa.int64()),
                        ("defaultRowCommitVersion", pa.int64()),
                        # clustering ZCube stamps (clusteringProvider /
                        # ZCUBE_ID / ZCUBE_ZORDER_BY) must survive the
                        # checkpoint or the first post-checkpoint
                        # incremental OPTIMIZE would re-cluster the whole
                        # table (every file reading as unstamped)
                        ("tags", smap),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("deletionTimestamp", pa.int64()),
                        ("dataChange", pa.bool_()),
                    ]
                ),
            ),
            pa.field(
                "txn",
                pa.struct(
                    [
                        ("appId", pa.string()),
                        ("version", pa.int64()),
                        ("lastUpdated", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "domainMetadata",
                pa.struct(
                    [
                        ("domain", pa.string()),
                        ("configuration", pa.string()),
                        ("removed", pa.bool_()),
                    ]
                ),
            ),
        ]
    )

def _action_rows(actions, schema):
    import pyarrow as pa

    def prune(v, typ):
        # keep only schema-known keys so from_pylist matches the schema
        if v is None:
            return None
        if pa.types.is_struct(typ):
            return {f.name: prune(v.get(f.name), f.type) for f in typ}
        if pa.types.is_map(typ):
            return dict(v)
        return v

    keys = tuple(schema.names)
    return [
        {k: prune(a.get(k), schema.field(k).type) for k in keys} for a in actions
    ]


def write_checkpoint_v2(
    table_dir: str, version: int, actions: list[dict], sidecar_parts: int = 2
) -> str:
    """V2 checkpoint: add/remove actions split across SIDECAR parquet
    files under ``_delta_log/_sidecars/``; a single uuid-named MANIFEST
    carries metaData/protocol/txn plus ``sidecar`` references and a
    ``checkpointMetadata`` marker — the layout delta-spark writes under
    the v2Checkpoint table feature. Returns the manifest path."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    log_dir = os.path.join(table_dir, "_delta_log")
    sc_dir = os.path.join(log_dir, "_sidecars")
    os.makedirs(sc_dir, exist_ok=True)

    file_actions = [a for a in actions if "add" in a or "remove" in a]
    top_actions = [a for a in actions if "add" not in a and "remove" not in a]

    action_schema = _action_arrow_schema()
    sidecar_refs = []
    n = max(1, sidecar_parts)
    per = -(-len(file_actions) // n) if file_actions else 0
    for i in range(n):
        chunk = file_actions[i * per : (i + 1) * per] if per else []
        if not chunk and i > 0:
            break
        name = f"{uuid.uuid4()}.parquet"
        p = os.path.join(sc_dir, name)
        pq.write_table(
            pa.Table.from_pylist(_action_rows(chunk, action_schema), schema=action_schema),
            p,
        )
        sidecar_refs.append(
            {"sidecar": {"path": name, "sizeInBytes": os.path.getsize(p),
                         "modificationTime": 0}}
        )

    smap = pa.map_(pa.string(), pa.string())
    manifest_schema = pa.schema(
        list(_action_arrow_schema())
        + [
            pa.field(
                "sidecar",
                pa.struct(
                    [
                        ("path", pa.string()),
                        ("sizeInBytes", pa.int64()),
                        ("modificationTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "checkpointMetadata",
                pa.struct([("version", pa.int64()), ("tags", smap)]),
            ),
        ]
    )
    manifest_actions = (
        [{"checkpointMetadata": {"version": version, "tags": {}}}]
        + top_actions
        + sidecar_refs
    )
    path = os.path.join(log_dir, f"{version:020d}.checkpoint.{uuid.uuid4()}.parquet")
    pq.write_table(
        pa.Table.from_pylist(_action_rows(manifest_actions, manifest_schema),
                             schema=manifest_schema),
        path,
    )
    with open(os.path.join(log_dir, "_last_checkpoint"), "w", encoding="utf-8") as fh:
        fh.write(json.dumps({"version": version, "size": len(manifest_actions)}))
    return path
