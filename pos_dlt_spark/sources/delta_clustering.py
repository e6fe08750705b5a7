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
  ``delta_optimize`` auto-fills ``zorder_by`` from the domain). Real
  Liquid clustering is INCREMENTAL (ZCube-stamped files are skipped by
  later OPTIMIZE runs); this engine's OPTIMIZE is the full re-cluster
  (OPTIMIZE FULL), the semantics-equivalent baseline, and file stats /
  skipping behave identically afterward.
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
    "clustering_columns",
    "clustering_domain_action",
    "validate_cluster_by",
]
