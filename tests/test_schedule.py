"""Training-schedule operators (corpus.epoch_shuffle /
mixture_interleave): permutation validity, epoch independence,
restart-determinism, and mixture proportions holding in every prefix."""

import pytest

from pyspark.sql import functions as F

from pos_dlt_spark.operators import corpus as C


@pytest.fixture(scope="module")
def docs(spark):
    return spark.range(200).select(F.col("id").alias("doc_id"))


def test_epoch_shuffle_is_a_permutation(docs):
    out = C.epoch_shuffle(docs, epoch=1, n_parts=8).collect()
    assert sorted(r["position"] for r in out) == list(range(200))
    assert len({r["doc_id"] for r in out}) == 200


def test_epochs_give_different_orders_but_reruns_agree(docs):
    e1 = {r["doc_id"]: r["position"] for r in C.epoch_shuffle(docs, 1, n_parts=8).collect()}
    e2 = {r["doc_id"]: r["position"] for r in C.epoch_shuffle(docs, 2, n_parts=8).collect()}
    e1b = {r["doc_id"]: r["position"] for r in C.epoch_shuffle(docs, 1, n_parts=4).collect()}
    assert e1 != e2  # fresh permutation per epoch
    assert e1 == e1b  # independent of partitioning -> restartable


def test_mixture_proportions_in_prefixes(spark):
    a = spark.range(300).select(F.col("id").alias("doc_id"))
    b = spark.range(1000, 1100).select(F.col("id").alias("doc_id"))
    out = C.mixture_interleave([(a, "big", 3), (b, "small", 1)], n_parts=8)
    rows = sorted(out.collect(), key=lambda r: r["position"])
    assert [r["position"] for r in rows] == list(range(400))
    # in every aligned prefix, 'big' holds ~3/4 share (exact integer
    # virtual time: after 4k steps, exactly 3k big + k small)
    for cut in (40, 100, 200, 396):
        share = sum(1 for r in rows[:cut] if r["source"] == "big") / cut
        assert abs(share - 0.75) < 0.05, (cut, share)


def test_mixture_rejects_bad_weight(spark):
    a = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="positive"):
        C.mixture_interleave([(a, "x", 0)])


def test_weighted_sample_prefers_heavy_rows(spark):
    """Statistical sanity + mechanics: k per group, no replacement, and
    across groups the heavy-weight rows win far more often than light
    ones (weight 100 vs 1)."""
    from pyspark.sql import functions as F

    # group = i % 20, so members step by 20; weight must vary WITHIN a
    # group -> key it off i // 20 (10 heavy + 10 light per group)
    rows = [(i, "g%d" % (i % 20), 100 if (i // 20) % 2 == 0 else 1) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    out = C.weighted_sample(df, k=3, weight_col="w", by="grp", pre_buckets=4).collect()
    assert len(out) == 60 and len({r["doc_id"] for r in out}) == 60
    per_group = {}
    for r in out:
        per_group.setdefault(r["grp"], []).append(r["doc_id"])
    assert all(len(v) == 3 for v in per_group.values())
    heavy = sum(1 for r in out if r["w"] == 100)
    assert heavy >= 45, heavy  # E[heavy] ~ 59/60 at 100:1 odds


def test_weighted_sample_two_phase_equals_single_window(spark):
    from pyspark.sql import functions as F

    rows = [(i, "g", (i % 7) + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, w long")
    two = {r["doc_id"] for r in C.weighted_sample(df, 10, "w", by="grp", pre_buckets=16).collect()}
    one = {r["doc_id"] for r in C.weighted_sample(df, 10, "w", by="grp", pre_buckets=None).collect()}
    assert two == one
