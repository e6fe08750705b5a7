"""Count-min sketch properties: one-sided error, exactness under no
collisions, and cell-wise mergeability."""

from pyspark.sql import functions as F

from pos_dlt_spark.operators.sketch import cms_build, cms_estimate, cms_merge


def _freq_df(spark, freqs: dict[str, int]):
    rows = [(k,) for k, n in freqs.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates_and_bounds(spark):
    freqs = {f"key{i}": (i % 7) + 1 for i in range(200)}
    df = _freq_df(spark, freqs)
    cms = cms_build(df, "k", d=4, w=64)  # deliberately collision-heavy
    probes = df.select("k").distinct()
    est = {r["k"]: r["cms_est"] for r in cms_estimate(cms, probes, "k", d=4, w=64).collect()}
    n_total = sum(freqs.values())
    for k, exact in freqs.items():
        assert est[k] >= exact, f"{k}: CMS underestimated {est[k]} < {exact}"
        # generous 2N/w-style sanity bound (not the probabilistic tight one)
        assert est[k] <= exact + 2 * n_total * 4 // 64 + 1

    # sketch never exceeds its fixed size
    assert cms.count() <= 4 * 64


def test_cms_exact_when_wide(spark):
    freqs = {"a": 3, "b": 1, "c": 10}
    df = _freq_df(spark, freqs)
    cms = cms_build(df, "k", d=4, w=4096)  # 3 keys in 4096 buckets: no collisions
    probes = df.select("k").distinct()
    est = {r["k"]: r["cms_est"] for r in cms_estimate(cms, probes, "k", d=4, w=4096).collect()}
    assert est == freqs


def test_cms_merge_equals_build_on_union(spark):
    f1 = {"a": 2, "b": 5}
    f2 = {"b": 1, "c": 4}
    d1, d2 = _freq_df(spark, f1), _freq_df(spark, f2)
    merged = cms_merge(cms_build(d1, "k", d=3, w=32), cms_build(d2, "k", d=3, w=32))
    direct = cms_build(d1.unionByName(d2), "k", d=3, w=32)
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in direct.collect()}


def test_cms_estimate_broadcasts_the_sketch(spark):
    df = _freq_df(spark, {"a": 2, "b": 3})
    cms = cms_build(df, "k", d=2, w=16)
    plan = cms_estimate(cms, df.select("k").distinct(), "k", d=2, w=16)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
