"""Count-min sketch: fixed-size approximate frequency counters.

The exact heavy-hitters query (`events_heavy_hitters`) shuffles one row
per distinct key; at 100 TB with an unbounded key domain (URLs, user
agents, n-grams) that shuffle IS the bottleneck. A count-min sketch
bounds the shuffle to ``d x w`` counter cells REGARDLESS of input size:
each partition's rows fold into at most ``d*w`` partial counts map-side,
and the estimate for any key is the minimum over its ``d`` hashed cells
— never an underestimate, overestimates bounded by ``2N/w`` with
probability ``1 - 2^-d`` (Cormode & Muthukrishnan 2005).

Design choices for the oracle gate:
- hashes are the engine-portable md5 ``phash`` (functions/__init__.py)
  with per-row salts, so DuckDB reproduces the sketch bit-for-bit;
- sketches are plain ``(r, b, cnt)`` DataFrames — counters ADD, so
  per-shard/per-day sketches merge by union + sum (:func:`cms_merge`),
  the same pre-aggregation story as the HLL sketches in
  `events_hll_mergeable_sketches`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_dlt_spark.functions import phash


def _cells(key_str, d: int, w: int, prefix: str):
    """Array of (r, b) cells a key increments: row r uses salt
    '<prefix><r>:'."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("r"),
                (phash(key_str, f"{prefix}{i}:") % w).alias("b"),
            )
            for i in range(d)
        ]
    )


def cms_build(
    df: DataFrame, key: str, d: int = 4, w: int = 1024, prefix: str = "cms"
) -> DataFrame:
    """Build a count-min sketch over ``df[key]`` -> (r, b, cnt) rows.

    One narrow projection + explode + hash aggregate: partial aggregation
    reduces every partition to <= d*w cells before the (tiny) shuffle.
    ``explode_outer`` rather than ``explode``: Catalyst's non-null
    constraint inference on ``explode`` can push the md5 expressions into
    the scan's DataFilters and serialize them into the file-scan task
    (see round notes on the decontamination query)."""
    key_str = F.col(key).cast("string")
    return (
        df.select(F.explode_outer(_cells(key_str, d, w, prefix)).alias("rb"))
        .select("rb.r", "rb.b")
        .groupBy("r", "b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimate(
    cms: DataFrame,
    probes: DataFrame,
    key: str,
    d: int = 4,
    w: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Estimated count for each probe key: min over its d cells.

    The sketch is <= d*w rows — broadcast it; the probe side never
    shuffles."""
    key_str = F.col(key).cast("string")
    cells = probes.select(
        "*", F.explode_outer(_cells(key_str, d, w, prefix)).alias("rb")
    ).select(*probes.columns, "rb.r", "rb.b")
    others = [c for c in probes.columns]
    return (
        cells.join(F.broadcast(cms), ["r", "b"])
        .groupBy(*others)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (d, w, prefix): counters
    add cell-wise. Union + re-aggregate — still <= d*w rows out."""
    return (
        a.unionByName(b)
        .groupBy("r", "b")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
