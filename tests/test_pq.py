"""Product-quantization properties: exact reconstruction when every
vector is a codebook entry, Lloyd monotonicity, and code-table shape."""

from pyspark.sql import functions as F

from pos_dlt_spark.operators import similarity as S

DIM, M = 4, 2


def _corpus(spark, n):
    # deterministic, varied, all sub-slices distinct
    rows = [
        (i, [((i * 7 + j * 3) % 11) / 5.0 - 1.0 + i * 0.01 for j in range(DIM)])
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_pq_exact_when_every_vector_is_a_code(spark):
    """ksub == corpus size and iters=0: each vector's nearest sub-centroid
    is itself, reconstruction is exact, so PQ-ADC must equal brute force
    bit-for-bit (same fixed-order double expression)."""
    emb = _corpus(spark, 8)
    books = S.pq_fit(emb, dim=DIM, m=M, ksub=8, iters=0)
    probes = emb.filter(F.col("vec_id") < 3)
    bf = {tuple(r) for r in S.brute_force_topk(emb, probes, k=4).collect()}
    pq = {tuple(r) for r in S.pq_topk(emb, probes, books, dim=DIM, k=4).collect()}
    assert pq == bf


def _quant_err(spark, emb, books):
    sub = DIM // M
    rows = emb.select("vec_id", S.quantized(F.col("embedding")).alias("q")).collect()
    err = 0
    for r in rows:
        for j in range(M):
            s = list(r.q[j * sub : (j + 1) * sub])
            best = min(
                sum((x - c) ** 2 for x, c in zip(s, cv)) for _, cv in books[j]
            )
            err += best
    return err


def test_pq_lloyd_reduces_quantization_error(spark):
    emb = _corpus(spark, 24)
    e0 = _quant_err(spark, emb, S.pq_fit(emb, dim=DIM, m=M, ksub=4, iters=0))
    e2 = _quant_err(spark, emb, S.pq_fit(emb, dim=DIM, m=M, ksub=4, iters=2))
    assert e2 <= e0


def test_pq_encode_shape(spark):
    emb = _corpus(spark, 12)
    books = S.pq_fit(emb, dim=DIM, m=M, ksub=4, iters=1)
    enc = S.pq_encode(emb, books, dim=DIM)
    assert enc.columns == ["vec_id", "c0", "c1", "ansq"]
    rows = enc.collect()
    assert len(rows) == 12
    for r in rows:
        assert 0 <= r.c0 < 4 and 0 <= r.c1 < 4 and r.ansq >= 0
