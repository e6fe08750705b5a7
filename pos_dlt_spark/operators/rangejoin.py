"""Bucketized interval (range) join.

``left JOIN right ON key AND r.ts BETWEEN l.ts - window AND l.ts`` is a
range join: Spark plans the equi-key part as a hash join but must then
expand every same-key pair before the residual time filter — O(n·m) per
key, which dies on hot keys at 100 TB. (The streaming engine handles the
same shape incrementally with watermark-bounded state; this is the batch
twin — reference sidesteps both with 5-minute recompute, `04:167`.)

The scalable rewrite quantizes time into buckets of the window width:

- every left row lands in bucket ``floor(ts / w)``;
- a right row at time t can only match left rows in buckets
  ``floor(t / w)`` and ``floor(t / w) + 1`` (because the interval is
  exactly one window wide), so the right side is exploded into those two
  replicas;
- equi-join on (key, bucket) + the exact residual range predicate.

The join becomes a plain hash equi-join whose per-group fan-in is bounded
by the rows in two adjacent time buckets, not all rows sharing the key —
the standard interval-bucketing trick (cf. interval joins in stream
processors and spatial grid joins). Cost: 2x replication of the right
side, pruned early by the bucket equality.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BUCKET = "__rj_bucket"


def interval_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    window: str,
) -> DataFrame:
    """Inner-join rows where ``right_time`` falls in
    ``[left_time - window, left_time]`` and the ``on`` keys match.

    ``window`` is an interval literal like ``'1 hour'``. Output columns:
    all of left's, then right's non-key columns (names must not collide).
    """
    on = list(on)
    clash = {c for c in right.columns if c not in on and c != right_time} & set(left.columns)
    if clash:
        raise ValueError(f"right columns collide with left columns: {sorted(clash)}")

    # Bucket width = the window in microseconds. Evaluated ONCE driver-side
    # (a LocalRelation plan, no scan) from a timezone-anchored literal: a bare
    # `timestamp '1970-01-01'` parses in the SESSION timezone, so on a UTC+N
    # session its unix_micros is -N hours and the width would come out short —
    # or negative, silently dropping every match via the bucket equi-join.
    [(width_micros,)] = left.sparkSession.sql(
        f"SELECT unix_micros(timestamp '1970-01-01 00:00:00+00:00' + INTERVAL {window})"
    ).collect()
    if width_micros is None or width_micros <= 0:
        raise ValueError(f"window must be a positive interval, got {window!r}")
    width = F.lit(width_micros)

    lb = F.floor(F.unix_micros(F.col(left_time)) / width)
    l_tagged = left.withColumn(_BUCKET, lb)

    rb = F.floor(F.unix_micros(F.col(right_time)) / width)
    r_tagged = right.withColumn(
        _BUCKET, F.explode(F.array(rb, rb + F.lit(1)))
    )

    residual = (F.col(right_time) >= F.col(left_time) - F.expr(f"INTERVAL {window}")) & (
        F.col(right_time) <= F.col(left_time)
    )
    joined = l_tagged.join(r_tagged, on=[*on, _BUCKET], how="inner").filter(residual)
    return joined.drop(_BUCKET)
