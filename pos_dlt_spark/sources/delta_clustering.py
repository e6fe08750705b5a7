"""Clustered tables (the public Delta protocol's "Clustered Table"
writer feature — Liquid Clustering's table-format surface):

- Clustering columns are TABLE METADATA, not directory layout: a
  ``domainMetadata`` action with domain ``delta.clustering`` whose
  configuration is ``{"clusteringColumns": [["col"], ...]}`` (arrays of
  PHYSICAL name paths, so column mapping renames don't break it).
- Writers declare the ``clustering`` writer feature (+
  ``domainMetadata``); readers need nothing — a clustered table reads
  like any other, which is exactly why the format beats Hive
  partitioning for high-cardinality keys at 100 TB (no small-files
  explosion, re-clusterable without rewriting the world).
- ``OPTIMIZE`` on a clustered table re-clusters on the declared columns
  (here: the existing multi-dimensional Z-order rewrite —
  ``delta_optimize`` auto-fills ``zorder_by`` from the domain) and is
  INCREMENTAL, matching real Liquid clustering: every file a recluster
  writes is STAMPED with a ZCube id and the clustering columns it was
  clustered on (``add.tags``: ``clusteringProvider=liquid``,
  ``ZCUBE_ID``, ``ZCUBE_ZORDER_BY`` — the same tags delta-spark's
  OptimizeExecutor writes), and a later bare OPTIMIZE rewrites ONLY the
  files that are unstamped (new appends), stamped for DIFFERENT columns
  (post-``ALTER ... CLUSTER BY``), or carrying deletion vectors — at a
  100 TB table the routine maintenance run is O(new data), not
  O(table). Each run's rewrite forms its own internally-z-ordered
  ZCube; stats skipping works per cube exactly like real Liquid.
  ``delta_optimize(..., full=True)`` is OPTIMIZE FULL: rewrite
  everything into one fresh cube (also the small-cube consolidation
  escape hatch — incremental runs never merge previously-stamped small
  cubes).
- ``ALTER TABLE ... CLUSTER BY`` swaps the domain in one commit; data
  files re-cluster lazily at the next OPTIMIZE — exactly the
  documented behavior.

Reference scope note: the reference pipeline relies on its platform's
managed-table clustering defaults (notebooks 02/04 create managed
tables); this is the open-protocol rendering of that surface.
"""

from __future__ import annotations

import json

CLUSTERING_DOMAIN = "delta.clustering"

# add.tags stamped on every file a recluster writes (the names
# delta-spark's clustered-table OPTIMIZE uses)
PROVIDER_TAG = "clusteringProvider"
ZCUBE_ID_TAG = "ZCUBE_ID"
ZCUBE_COLS_TAG = "ZCUBE_ZORDER_BY"


def clustering_physical_columns(snap) -> list[str]:
    """The domain's clustering columns as PHYSICAL names (what the
    stamps are compared against — rename-proof under column mapping)."""
    raw = snap.domain_metadata.get(CLUSTERING_DOMAIN)
    if not raw:
        return []
    try:
        paths = json.loads(raw).get("clusteringColumns") or []
    except (ValueError, TypeError):
        return []
    return [p[0] if isinstance(p, list) else p for p in paths]


def zcube_stamp(physical_cols: list[str], zcube_id: str) -> dict[str, str]:
    """The add.tags for one recluster run's output files."""
    return {
        PROVIDER_TAG: "liquid",
        ZCUBE_ID_TAG: zcube_id,
        ZCUBE_COLS_TAG: json.dumps([[c] for c in physical_cols]),
    }


def is_current_cluster_file(add: dict, physical_cols: list[str]) -> bool:
    """True iff this live file is already clustered on exactly the
    table's CURRENT clustering columns (and carries no DV) — the files
    an incremental OPTIMIZE skips."""
    if add.get("deletionVector"):
        return False
    tags = add.get("tags") or {}
    if isinstance(tags, list):  # parquet map read-back shape
        tags = dict(tags)
    return (
        tags.get(PROVIDER_TAG) == "liquid"
        and tags.get(ZCUBE_COLS_TAG) == json.dumps([[c] for c in physical_cols])
    )


def clustering_columns(snap) -> list[str]:
    """The snapshot's clustering columns as LOGICAL names ([] when the
    table is not clustered). Domain stores physical name paths."""
    raw = snap.domain_metadata.get(CLUSTERING_DOMAIN)
    if not raw:
        return []
    try:
        paths = json.loads(raw).get("clusteringColumns") or []
    except (ValueError, TypeError):
        return []
    p2l = {p: l for l, p in snap.physical_names.items()}
    out = []
    for path in paths:
        phys = path[0] if isinstance(path, list) else path
        out.append(p2l.get(phys, phys))
    return out


def clustering_domain_action(physical_cols: list[str]) -> dict:
    """The domainMetadata action declaring (or clearing, with ``[]``)
    the clustering columns, in the protocol's path-array form."""
    from pos_dlt_spark.sources import delta_fixture as fx

    return fx.domain_metadata_action(
        CLUSTERING_DOMAIN,
        json.dumps({"clusteringColumns": [[c] for c in physical_cols]}),
    )


def validate_cluster_by(cluster_by: list[str], schema, partition_by) -> None:
    names = {f.name for f in schema.fields}
    missing = sorted(set(cluster_by) - names)
    if missing:
        raise ValueError(f"CLUSTER BY columns not in the schema: {missing}")
    if partition_by:
        raise ValueError(
            "a clustered table cannot also be partitioned (CLUSTER BY "
            "replaces Hive partitioning; drop partition_by)"
        )
    if not cluster_by:
        raise ValueError("CLUSTER BY needs at least one column")


__all__ = [
    "CLUSTERING_DOMAIN",
    "PROVIDER_TAG",
    "ZCUBE_COLS_TAG",
    "ZCUBE_ID_TAG",
    "clustering_columns",
    "clustering_domain_action",
    "clustering_physical_columns",
    "is_current_cluster_file",
    "validate_cluster_by",
    "zcube_stamp",
]
