"""Incremental maintenance of a keyed view over a bucketed CDC target.

The reference recomputes gold IN FULL every 5 minutes (`04_Silver-to-Gold
ETL.sql` + the DLT schedule); that is O(silver) work per cycle no matter
how little changed. When (a) the silver target is an
``ApplyChanges(n_buckets=...)`` manifest table and (b) the view is
KEY-LOCAL — every output row depends only on input rows of the same key
(any groupBy-the-keys aggregate, latest-per-key, SCD2 history, per-key
feature extraction) — the view can be maintained per bucket: a gold
bucket is stale exactly when its silver bucket pointer changed.

``IncrementalKeyedView.refresh`` diffs the source manifest's bucket
pointers against the ones recorded in the view's own manifest at last
refresh (pointer strings double as version ids: every bucket rewrite
lands in a fresh ``epoch_<n>_g<v>`` directory), recomputes ONLY the
changed buckets through ``transform``, and commits the view with the
same atomic-manifest + one-generation-retention protocol readers already
rely on. Refresh cost tracks CHANGE key-spread, not view size — the
manifest equivalent of Delta's incremental MERGE-based gold, and the
piece that turns the reference's 5-minute full recompute into O(delta)
work at 100 TB.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_dlt_spark.operators.cdc import ApplyChanges


class IncrementalKeyedView:
    def __init__(
        self,
        source: ApplyChanges,
        target_path: str,
        transform: Callable[[DataFrame], DataFrame],
        keys: Sequence[str] | None = None,
    ) -> None:
        if source.n_buckets is None:
            raise ValueError("incremental view needs a bucketed (manifest) source")
        self.source = source
        self.transform = transform
        self.keys = list(keys) if keys is not None else list(source.keys)
        # Correctness condition for per-bucket maintenance: every input row
        # of one OUTPUT key must live in one source bucket, i.e. the
        # source's bucket-routing columns must be derivable from the view
        # keys. (Bucket silver by `store` alone — bucket_keys=["store"] —
        # and a store-level rollup becomes maintainable here.)
        if not set(source.bucket_keys) <= set(self.keys):
            raise ValueError(
                f"view keys {self.keys} must contain the source bucket_keys "
                f"{source.bucket_keys}: otherwise one output row mixes input "
                "from several buckets and per-bucket refresh is unsound"
            )
        # the view rides ApplyChanges' manifest plumbing (same layout,
        # same atomic commit + retention, same bucket routing as the
        # source so view buckets align 1:1); merge() is never used.
        self._t = ApplyChanges(
            target_path, keys=self.keys, sequence_by="__unused",
            n_buckets=source.n_buckets, bucket_keys=source.bucket_keys,
        )

    @property
    def target_path(self) -> str:
        return self._t.target_path

    def read(self, spark: SparkSession) -> DataFrame | None:
        return self._t.read_target(spark)

    def stale_buckets(self) -> list[int]:
        """Buckets whose source pointer changed since the last refresh."""
        src = self.source._read_manifest()
        if src is None:
            return []
        seen = ((self._t._read_manifest() or {}).get("source_buckets")) or {}
        return sorted(
            int(b) for b, p in src["buckets"].items() if seen.get(b) != p
        )

    def refresh(self, spark: SparkSession) -> list[int]:
        """Recompute stale buckets through ``transform`` and commit; returns
        the bucket ids refreshed (empty = view already current)."""
        src_manifest = self.source._read_manifest()
        if src_manifest is None:
            return []
        stale = self.stale_buckets()
        if not stale:
            return []
        view_manifest = self._t._read_manifest()
        src_paths = [
            os.path.join(self.source.target_path, src_manifest["buckets"][str(b)])
            for b in stale
        ]
        rows = spark.read.parquet(*src_paths)
        out = self.transform(rows)
        missing = [k for k in self.keys if k not in out.columns]
        if missing:
            raise ValueError(f"transform dropped key columns {missing}")
        return self._commit(spark, out, stale, view_manifest, src_manifest)

    def _commit(
        self,
        spark: SparkSession,
        out: DataFrame,
        stale: list[int],
        view_manifest: dict | None,
        src_manifest: dict,
        extra_meta: dict | None = None,
    ) -> list[int]:
        """Write the recomputed buckets and swap the manifest pointer —
        the shared atomic-commit + one-generation-GC tail of every
        incremental refresh."""
        out = self._t._with_bucket(out)

        version = (view_manifest["version"] + 1) if view_manifest else 0
        epoch_dir = f"epoch_r{version}_g{version}"
        (
            out.repartition("__bucket")
            .write.mode("overwrite")
            .partitionBy("__bucket")
            .parquet(os.path.join(self.target_path, epoch_dir))
        )
        buckets = dict(view_manifest["buckets"]) if view_manifest else {}
        retired = [buckets[str(b)] for b in stale if str(b) in buckets]
        for b in stale:
            rel = os.path.join(epoch_dir, f"__bucket={b}")
            if os.path.isdir(os.path.join(self.target_path, rel)):
                buckets[str(b)] = rel
            else:
                # the recompute produced no rows for this bucket: it has
                # no directory — drop its pointer instead of pointing at
                # a path that does not exist
                buckets.pop(str(b), None)
        manifest = {
            "version": version,
            "n_buckets": self._t.n_buckets,
            "keys": self.keys,
            "bucket_keys": self._t.bucket_keys,
            "sequence_by": "__view",
            "buckets": buckets,
            "retired": retired,
            "prev_buckets": dict(view_manifest["buckets"]) if view_manifest else None,
            "schema": None,
            # pointer map this refresh was computed from: the staleness
            # baseline for the next refresh
            "source_buckets": dict(src_manifest["buckets"]),
        }
        if extra_meta:
            manifest.update(extra_meta)
        self._t._commit_manifest(manifest)
        for rel in (view_manifest or {}).get("retired", ()):
            gone = os.path.join(self.target_path, rel)
            shutil.rmtree(gone, ignore_errors=True)
            parent = os.path.dirname(gone)
            try:
                if all(e.startswith("_") for e in os.listdir(parent)):
                    shutil.rmtree(parent, ignore_errors=True)
            except FileNotFoundError:
                pass
        return stale


def keyed_count_sum(keys: Sequence[str], value: str) -> Callable[[DataFrame], DataFrame]:
    """A ready-made key-local transform: per-key count + exact sum."""

    def fn(df: DataFrame) -> DataFrame:
        return df.groupBy(*keys).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col(value).cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )

    return fn


class IncrementalJoinedView(IncrementalKeyedView):
    """Incremental maintenance of a keyed view whose rows depend on BOTH a
    bucketed CDC target and an append-only fact table partitioned by the
    CDC flow's bucket key — the exact shape of the reference's gold query
    (`04_Silver-to-Gold ETL.sql:76-103`: ``latest_inventory_snapshot``
    LEFT JOIN ``inventory_change`` grouped by the CDC keys).

    Staleness is the union of two signals:

    - CDC side: the source manifest's bucket pointers, exactly as
      ``IncrementalKeyedView``.
    - fact side: a per-partition-value file signature (count + bytes)
      over the fact table's ``<col>=value`` directories, recorded in the
      view manifest at each refresh. Appends always add files, so the
      signature changes iff a partition received rows. (On Delta/Iceberg
      storage the commit log would supply this for free; the listing here
      is the parquet-dir equivalent and is metadata-only — it never reads
      row data.)

    A refresh recomputes only the stale buckets: it reads those buckets'
    CDC rows, prunes the fact scan to their partition values (partition
    pruning — the scan cost tracks the CHANGED key spread, not table
    size), runs ``transform(cdc_rows, fact_rows)`` and commits through
    the same atomic-manifest protocol. This is what turns the
    reference's 5-minute full gold recompute into O(delta) work at
    100 TB.

    Soundness needs every output key's inputs confined to one bucket:
    ``keys`` must contain the flow's bucket-routing columns AND the fact
    table must be partitioned by exactly that single routing column.
    """

    def __init__(
        self,
        source: ApplyChanges,
        target_path: str,
        transform: Callable[[DataFrame, DataFrame], DataFrame],
        aux_path: str,
        aux_partition_col: str,
        keys: Sequence[str] | None = None,
    ) -> None:
        super().__init__(source, target_path, lambda df: df, keys=keys)
        self.transform2 = transform
        if list(source.bucket_keys) != [aux_partition_col]:
            raise ValueError(
                f"aux table must be partitioned by the flow's single "
                f"bucket-routing column {source.bucket_keys}, got "
                f"{aux_partition_col!r}"
            )
        self.aux_path = aux_path
        self.aux_col = aux_partition_col

    # -- fact-side staleness ------------------------------------------------

    def _aux_signatures(self) -> dict[str, str]:
        """Per partition value: 'file_count:total_bytes' over its dir tree.
        Metadata-only (listing + stat); O(files of the fact table) —
        the commit-log-backed storage modes replace this with a pointer
        read."""
        sigs: dict[str, str] = {}
        prefix = self.aux_col + "="
        try:
            entries = sorted(os.listdir(self.aux_path))
        except FileNotFoundError:
            return sigs
        for e in entries:
            if not e.startswith(prefix):
                continue
            n = size = 0
            for root, _dirs, files in os.walk(os.path.join(self.aux_path, e)):
                for fname in files:
                    if fname.startswith(("_", ".")):
                        continue
                    n += 1
                    size += os.path.getsize(os.path.join(root, fname))
            sigs[e[len(prefix):]] = f"{n}:{size}"
        return sigs

    def _buckets_of_values(self, spark: SparkSession, vals: list[str]) -> set[int]:
        """Map raw partition-dir values to bucket ids with the SOURCE's own
        routing hash on the SOURCE's column type (int vs bigint hash
        differently in Spark — the cast must target the CDC schema)."""
        import json as _json

        from pyspark.sql.types import StructType

        src_manifest = self.source._read_manifest() or {}
        schema_json = src_manifest.get("schema")
        if schema_json:
            struct = StructType.fromJson(_json.loads(schema_json))
            dtype = struct[self.aux_col].dataType.simpleString()
        else:
            dtype = "string"
        df = spark.createDataFrame(
            [(v,) for v in vals], f"{self.aux_col} string"
        ).select(F.col(self.aux_col).cast(dtype).alias(self.aux_col))
        rows = (
            self.source._with_bucket(df)
            .select("__bucket").distinct().collect()
        )
        return {int(r["__bucket"]) for r in rows}

    # -- refresh ------------------------------------------------------------

    def refresh(self, spark: SparkSession) -> list[int]:
        src_manifest = self.source._read_manifest()
        if src_manifest is None:
            return []
        view_manifest = self._t._read_manifest()
        stale = set(self.stale_buckets())
        sigs = self._aux_signatures()
        seen = (view_manifest or {}).get("aux_sigs") or {}
        changed_vals = [v for v, s in sigs.items() if seen.get(v) != s]
        changed_vals += [v for v in seen if v not in sigs]
        if changed_vals:
            stale |= self._buckets_of_values(spark, changed_vals)
        # fact partitions can exist for keys with no CDC row (left-join
        # semantics: they produce no gold rows) — but their buckets may
        # hold OTHER keys, so the bucket set is still the right unit
        stale = sorted(b for b in stale if str(b) in src_manifest["buckets"])
        if not stale:
            return []
        src_paths = [
            os.path.join(self.source.target_path, src_manifest["buckets"][str(b)])
            for b in stale
        ]
        cdc_rows = spark.read.parquet(*src_paths)
        vals = [
            r[0] for r in cdc_rows.select(self.aux_col).distinct().collect()
        ]
        aux_rows = spark.read.parquet(self.aux_path)
        # typed isin over the partition column -> partition pruning: the
        # fact scan reads only the stale buckets' partition dirs
        aux_rows = aux_rows.filter(F.col(self.aux_col).isin(vals))
        out = self.transform2(cdc_rows, aux_rows)
        missing = [k for k in self.keys if k not in out.columns]
        if missing:
            raise ValueError(f"transform dropped key columns {missing}")
        return self._commit(
            spark, out, stale, view_manifest, src_manifest, {"aux_sigs": sigs}
        )
