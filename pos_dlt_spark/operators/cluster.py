"""Connected components over an edge DataFrame — duplicate-cluster
assembly for the dedup family.

LSH / SimHash / cosine near-dup stages emit *pairs* (``dedup.py``,
``similarity.py``); an actual dedup pipeline must then group pairs into
clusters and pick one canonical document per cluster. That grouping is
connected components, which Spark has no built-in operator for.

Algorithm: alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC 2014) — the standard
shuffle-only formulation:

- ``large-star``: every node points its *larger* neighbors at the minimum
  of its neighborhood (including itself).
- ``small-star``: every node points its *smaller* neighbors (and itself)
  at the minimum of its smaller neighborhood.

Each round is a fixed number of hash aggregations + equi-joins (no
driver-side graph state, no per-node Python), and the edge set converges
to a star forest — every node directly attached to its component's
minimum id — in O(log^2 n) rounds (O(log n) in practice; a path graph of
2^k nodes converges in ~k rounds, vs ~2^k for naive min propagation).
That is what makes this viable at 100 TB: iteration count scales with the
*logarithm* of the largest cluster, not its diameter.

Scale notes:
- each round ends in ``localCheckpoint(eager=True)`` to truncate lineage —
  without it the plan doubles per round and Catalyst analysis time
  explodes by round ~10.
- convergence is detected with a one-pass signature aggregate
  ``(count, bit_xor(xxhash64(u, v)))`` — one cheap action per round instead
  of a full ``exceptAll`` self-compare; when the signature goes stable a
  single exact set-difference verifies the fixpoint (so a hash collision
  can cost one extra round, never a wrong answer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _directed_big_small(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Orient every edge large->small as (u, v), u > v; drop self-loops."""
    u, v = F.col(src), F.col(dst)
    return (
        edges.select(
            F.greatest(u, v).alias("u"),
            F.least(u, v).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v of u with v > u, m = min(N(u) + {u}).

    Input/output edges are big->small oriented: since v > u >= m, the
    emitted (v, m) keeps the orientation invariant.
    """
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every smaller neighbor v of u plus (u, m), with
    m = min of u's smaller neighborhood. Input must be big->small."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    nbrs = (
        edges.join(mins, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    selfs = mins.select(F.col("u"), F.col("m").alias("v"))
    return nbrs.union(selfs).filter(F.col("u") != F.col("v")).distinct()


def _signature(edges: DataFrame) -> tuple[int, int]:
    # bit_xor, not sum: overflow-free under ANSI mode and order-independent.
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """(id, component) for every node incident to at least one edge;
    ``component`` is the minimum node id of the connected component.

    Nodes with no edges (after self-loop removal) do not appear — a dedup
    pipeline left-joins this result back onto the corpus and coalesces the
    missing components to the node's own id (see
    ``queries_ml.dedup_duplicate_clusters``).

    Size-adaptive: when the deduped edge set is at most
    ``driver_threshold`` rows (known from the first signature pass — no
    extra job), a driver-side union-find answers in one collect instead of
    log-many shuffle rounds; identical output. Near-dup edge sets are
    usually a sliver of the corpus, so this path serves most real runs;
    the star algorithm is the unbounded path (``driver_threshold=0``
    forces it — the operator tests run both)."""
    e = _directed_big_small(edges, src, dst).localCheckpoint(eager=True)
    sig = _signature(e)
    if sig[0] <= driver_threshold:
        rows = [(int(r["u"]), int(r["v"])) for r in e.collect()]
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in rows:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = [(x, find(x)) for x in parent]
        from pos_dlt_spark.tables import local_df

        return local_df(e.sparkSession, out, "id long, component long")
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig2 = _signature(e2)
        if sig2 == sig:
            # signature match is necessary, not sufficient: confirm the
            # fixpoint exactly once with a real set difference.
            if e2.exceptAll(e).isEmpty() and e.exceptAll(e2).isEmpty():
                e = e2
                break
        e, sig = e2, sig2
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")
    # star forest: leaves point at roots; roots are their own component.
    leaves = e.select(F.col("u").alias("id"), F.col("v").alias("component"))
    roots = e.select(F.col("v").alias("id"), F.col("v").alias("component")).distinct()
    return leaves.union(roots).distinct()


def duplicate_clusters(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Cluster near-duplicate pairs: (doc_id, component, cluster_size, keep)
    with keep=1 on the canonical (minimum-id) member of each cluster.

    ``cluster_size`` rides the components result (one extra hash aggregate
    on the component key — small, already shuffled by key)."""
    cc = connected_components(pairs, id_a, id_b)
    sizes = cc.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("id").alias("doc_id"),
            "component",
            "cluster_size",
            (F.col("id") == F.col("component")).cast("int").alias("keep"),
        )
    )


# -- PageRank (iterative link analysis, integer-exact) -----------------------


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
    damping_num: int = 17,
    damping_den: int = 20,
) -> DataFrame:
    """Simplified PageRank (Page et al. 1999) over a directed edge list,
    in EXACT INTEGER micro-units so every engine computes bit-identical
    ranks: rank_0 = 1e6 per node; per iteration each node sends
    ``floor(rank / out_degree)`` along its out-edges and
    ``rank' = floor(0.15 * 1e6) + floor(d_num * inbound_sum / d_den)``
    (damping 17/20 = 0.85 as an integer ratio — no float accumulation
    order anywhere, the kmeans/micro-nats discipline). Dangling-node mass
    is dropped, not redistributed (the common simplified variant);
    callers wanting the stochastic-complete version add a sink edge set.

    Scale shape: per iteration ONE equi-join (ranks x edges on src — both
    shuffle-partitioned on the same key) and ONE hash aggregate on dst
    with map-side partial sums, so a hot page (in-degree skew) collapses
    map-side exactly like any groupBy; rank state is localCheckpoint'ed
    per iteration to truncate lineage (the connected-components lesson).
    Iteration count is fixed and small — the 100 TB cost is
    iters x (join + agg), embarrassingly rebalanceable.

    Returns (node, rank_micro bigint, rank double)."""
    # e_deg (edges with the src out-degree attached) feeds every
    # iteration's contrib join, nodes every iteration's left join —
    # without persistence the caller's edge-construction plan (often a
    # join itself) re-executes ~2x per iteration (measured 6.4 s -> 2.5 s
    # on the gate graph). Attaching the degree to the edge list ONCE
    # hoists the loop-invariant ranks x out_deg join out of every
    # iteration (3 joins -> 0 on the gate config): floor(rank/deg)
    # distributes identically whether computed per src node or per edge.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    # rename the join key so the per-iteration re-join against ranks is
    # unambiguous (ranks shares nodes' lineage — Spark's self-join check
    # rejects the raw column reference otherwise)
    w_deg = Window.partitionBy("src")
    e_deg = (
        e.withColumn("deg", F.count(F.lit(1)).over(w_deg))
        .select(F.col("src").alias("ed_src"), "dst", "deg")
        .persist()
    )
    base = 1_000_000
    teleport = (base * (damping_den - damping_num)) // damping_den  # floor(0.15e6)
    ranks = nodes.select("node", F.lit(base).cast("bigint").alias("rank"))
    # nodes without inbound edges used to be reinstated with a LEFT JOIN
    # per iteration; a zero-contribution row per node folded into the
    # same inbound aggregate keeps every node with identical sums and
    # drops that join — per iteration: ONE join + ONE aggregate.
    zero = nodes.select("node", F.lit(0).cast("bigint").alias("c"))
    for _ in range(iters):
        # integer DIV, not floor(a / b): Spark's `/` on bigints is DOUBLE
        # division, which silently loses exactness past 2^53; DIV stays
        # integral at any magnitude and truncation == floor for the
        # nonnegative values here (DuckDB's // matches).
        contrib = (
            ranks.join(e_deg, ranks.node == F.col("ed_src"), "inner")
            .select(
                F.col("dst").alias("node"),
                F.expr("CAST(rank DIV deg AS BIGINT)").alias("c"),
            )
            .unionByName(zero)
            .groupBy("node")
            .agg(F.sum("c").alias("inbound"))
        )
        ranks = contrib.select(
            "node",
            F.expr(
                f"CAST({teleport} + (inbound * {damping_num})"
                f" DIV {damping_den} AS BIGINT)"
            ).alias("rank"),
        ).localCheckpoint(eager=False)
    return ranks.select(
        "node",
        F.col("rank").alias("rank_micro"),
        (F.col("rank").cast("double") / base).alias("rank"),
    )
