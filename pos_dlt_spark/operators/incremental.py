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
            buckets[str(b)] = os.path.join(epoch_dir, f"__bucket={b}")
        self._t._commit_manifest(
            {
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
        )
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
