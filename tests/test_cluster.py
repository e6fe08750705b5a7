"""Connected components (operators/cluster.py) vs a plain union-find."""

import random

import pytest
from pyspark.sql import functions as F

from pos_dlt_spark.operators.cluster import connected_components, duplicate_clusters


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize every node's component to the min id of its set
    comp = {}
    for x in list(parent):
        comp.setdefault(find(x), []).append(x)
    return {x: root for root, members in comp.items() for x in members}


def _check(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    want = set(_union_find([e for e in edges if e[0] != e[1]]).items())
    # both paths: driver fast path (default) and forced distributed stars
    for thresh in (100_000, 0):
        got = {
            (r["id"], r["component"])
            for r in connected_components(df, "src", "dst", driver_threshold=thresh).collect()
        }
        assert got == want, f"threshold={thresh}"


def test_two_triangles_and_bridge(spark):
    _check(spark, [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (3, 10), (20, 21)])


def test_path_graph_log_rounds(spark):
    # a 64-node path: naive min-propagation needs ~63 rounds; the
    # alternating algorithm must finish far under the max_iter=50 guard.
    _check(spark, [(i, i + 1) for i in range(64)])


def test_self_loops_and_duplicates_ignored(spark):
    _check(spark, [(5, 5), (1, 2), (2, 1), (1, 2), (7, 7)])


def test_reversed_and_shuffled_ids(spark):
    random.seed(7)
    ids = random.sample(range(1000, 9999), 60)
    edges = []
    for i in range(0, 60, 6):  # ten 6-cliques-ish chains
        chunk = ids[i : i + 6]
        edges += list(zip(chunk, chunk[1:]))
    random.shuffle(edges)
    edges = [(b, a) if random.random() < 0.5 else (a, b) for a, b in edges]
    _check(spark, edges)


def test_random_graph_matches_union_find(spark):
    random.seed(42)
    nodes = list(range(200))
    edges = [(random.choice(nodes), random.choice(nodes)) for _ in range(150)]
    edges = [e for e in edges if e[0] != e[1]]
    _check(spark, edges)


def test_duplicate_clusters_canonical_and_sizes(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    rows = {r["doc_id"]: r for r in duplicate_clusters(pairs).collect()}
    assert rows[3]["component"] == 1 and rows[3]["cluster_size"] == 3
    assert rows[11]["component"] == 10 and rows[11]["cluster_size"] == 2
    assert rows[23]["cluster_size"] == 4
    keeps = {d for d, r in rows.items() if r["keep"] == 1}
    assert keeps == {1, 10, 20}


def test_pagerank_hand_computed_triangle(spark):
    """A->B, A->C, B->C, C->A for two iterations, every value derived by
    hand in integer micro-units (teleport 150000, damping 17/20, DIV)."""
    from pos_dlt_spark.operators.cluster import pagerank
    from pos_dlt_spark.tables import local_df

    edges = local_df(
        spark, [(1, 2), (1, 3), (2, 3), (3, 1)], "src long, dst long"
    )
    got = {r.node: r.rank_micro for r in pagerank(edges, iters=2).collect()}
    assert got == {1: 1_361_250, 2: 575_000, 3: 1_063_750}


def test_pagerank_dangling_mass_dropped(spark):
    """Dangling nodes (no out-edges) receive rank but leak their own —
    the documented simplified variant."""
    from pos_dlt_spark.operators.cluster import pagerank
    from pos_dlt_spark.tables import local_df

    edges = local_df(spark, [(1, 2)], "src long, dst long")
    got = {r.node: r.rank_micro for r in pagerank(edges, iters=1).collect()}
    assert got == {1: 150_000, 2: 1_000_000}
