"""Explicit Bloom-filter semi-join reduction.

The canonical shuffle-reduction pattern for fact⋈dim joins at lake scale:
build a Bloom bitmap over the (filtered) dim keys, broadcast it as a plan
literal, and drop fact rows that cannot join BEFORE they reach the shuffle
— the fact side is usually 100-1000x the dim side, and at 100 TB most of
its rows lose the join, so the bits saved from the exchange dominate the
cost of k extra hashes per row in the scan stage.

Spark's own runtime Bloom filter (``InjectRuntimeFilter``,
``spark.sql.optimizer.runtime.bloomFilter.enabled``) does this
automatically for eligible shuffle joins; this explicit operator covers
the cases the optimizer can't: a build side produced by a separate job, a
filter reused across many queries (build once, apply everywhere), or a
deterministic bitmap you want to persist/ship. The final join stays EXACT
— Bloom false positives only cost a little shuffle, never correctness —
so oracle SQL for a bloom-prefiltered query is simply the plain join.

Determinism: positions come from ``xxhash64(key, seed)`` which is fixed in
Spark; the bitmap needs no cross-engine twin precisely because it is
transparent to results.

Scale notes:
- ``m_bits`` defaults to 2^20 (128 KiB bitmap, 16k int64 words): with
  k=5 that holds ~100k build keys under 1% false positives. The bitmap is
  embedded in the plan as ONE array literal referenced by a ``forall``
  lambda, so plan size stays ~m_bits/4 bytes of SQL text and the per-row
  work is k hash+index probes, all codegen'd JVM expressions.
- the build is a map-side ``bit_or`` partial aggregate over at most
  m_bits/64 groups — the collect is bounded by the bitmap size, never by
  the build row count.
- false-positive rate: (1 - e^{-kn/m})^k; callers sizing for a different
  n should keep m/n >= 10 at k=5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_M_BITS = 1 << 20
DEFAULT_K = 5


def _positions_sql(key_sql: str, m_bits: int, k: int) -> str:
    """k Bloom positions of ``key_sql`` as an array<bigint> SQL expression.

    Shared verbatim by build and probe so the hashed types line up.
    CONTRACT: ``xxhash64`` hashes each numeric width differently (an INT 5
    and a BIGINT 5 land on different positions), so callers pairing a
    build with a probe must pass byte-identical key TYPES, not just equal
    values. ``bloom_prefilter_join`` enforces this by casting integral
    keys to BIGINT on both sides; direct users of ``bloom_build`` /
    ``bloom_filter_expr`` carry the same obligation."""
    return (
        f"transform(sequence(0, {k - 1}), "
        f"i -> pmod(xxhash64({key_sql}, i), CAST({m_bits} AS BIGINT)))"
    )


def bloom_build(
    df: DataFrame, key: str, m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> list[int]:
    """Aggregate ``df[key]`` into a dense Bloom bitmap (m_bits/64 words).

    Distributed: explode each key into its k (word, mask) pairs, bit_or
    per word with map-side partial aggregation; only the <= m_bits/64
    non-zero words cross to the driver."""
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    pos = F.explode(F.expr(_positions_sql(key, m_bits, k))).alias("pos")
    rows = (
        df.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.bit_or("m").alias("bits"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["w"]] = r["bits"]
    return words


def bloom_filter_expr(
    key_sql: str, words: list[int], m_bits: int = DEFAULT_M_BITS, k: int = DEFAULT_K
) -> Column:
    """Membership test of ``key_sql`` against a built bitmap.

    Rendered as ONE SQL string — the bitmap is a single array literal bound
    inside a ``forall`` lambda, not m/64 py4j Column objects (the literal-
    elimination lesson from the IVF centroids)."""
    arr = "array(" + ",".join(f"{w}L" for w in words) + ")"
    return F.expr(
        f"forall({_positions_sql(key_sql, m_bits, k)}, "
        f"p -> ((shiftright(({arr})[CAST(p div 64 AS INT)], "
        f"CAST(p % 64 AS INT))) & 1L) = 1L)"
    )


def bloom_prefilter_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int | None = None,
    k: int = DEFAULT_K,
) -> DataFrame:
    """Exact inner equi-join with a Bloom pre-filter on the fact side.

    Two passes over ``dim`` (bitmap build + join build) — dim is the small
    side by contract. Result is identical to ``fact.join(dim, ...)``; the
    bitmap only thins the fact rows entering the join's exchange.

    ``m_bits=None`` auto-sizes to the dim's key count (one cheap action on
    the SMALL side): m = next power of two >= 8n, clamped to [2^14, 2^20]
    — ~1.6% false positives at k=5. Sizing matters both ways: undersized
    saturates (every probe passes, pure overhead), oversized pays plan
    size — the bitmap is an array literal, and a maxed 2^20 bitmap
    measured ~0.3 s extra warm plan/codegen cost per query vs right-sized
    (several seconds on a cold JVM).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = (ByteType, ShortType, IntegerType, LongType)
    ftype = fact.schema[fact_key].dataType
    dtype = dim.schema[dim_key].dataType
    if isinstance(ftype, integral) and isinstance(dtype, integral):
        # xxhash64 is width-sensitive: INT 5 and BIGINT 5 hash to different
        # positions. Widen both sides to BIGINT so build and probe agree
        # even when the fact/dim columns differ in integral width.
        fact_sql = f"CAST({fact_key} AS BIGINT)"
        dim_sql = f"CAST({dim_key} AS BIGINT)"
    elif ftype == dtype:
        fact_sql, dim_sql = fact_key, dim_key
    else:
        raise TypeError(
            f"bloom_prefilter_join keys must hash identically: "
            f"fact[{fact_key}]={ftype.simpleString()} vs "
            f"dim[{dim_key}]={dtype.simpleString()}"
        )
    if m_bits is None:
        n = dim.select(dim_key).distinct().count()
        m_bits = max(1 << 14, min(1 << 20, 1 << (8 * max(n, 1) - 1).bit_length()))
    words = bloom_build(dim, dim_sql, m_bits, k)
    pre = fact.filter(bloom_filter_expr(fact_sql, words, m_bits, k))
    return pre.join(dim, pre[fact_key] == dim[dim_key], "inner")
