"""Source/sink format breadth: the engine round-trips parquet, ORC, JSON,
CSV and XML (native in Spark 4) with explicit schemas (Avro needs the
external spark-avro package — not bundled, documented as out of scope)."""

import pytest
from pyspark.sql import functions as F


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv", "xml"])
def test_format_roundtrip(spark, tmp_path, fmt):
    df = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("grp"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
        (F.col("id") * 1.5).alias("score"),
    )
    path = str(tmp_path / fmt)
    w = df.write.format(fmt).mode("overwrite")
    if fmt == "csv":
        w = w.option("header", "true")
    if fmt == "xml":
        w = w.option("rowTag", "row")
    w.save(path)
    r = spark.read.format(fmt)
    if fmt == "csv":
        r = r.option("header", "true").schema(df.schema)
    elif fmt in ("json", "xml"):
        r = r.schema(df.schema)
    if fmt == "xml":
        r = r.option("rowTag", "row")
    back = r.load(path)
    # file sources surface everything nullable; names + types must survive
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in df.schema.fields
    ]
    got = sorted(tuple(x) for x in back.collect())
    want = sorted(tuple(x) for x in df.collect())
    assert got == want


def test_orc_predicate_pushdown(spark, tmp_path):
    path = str(tmp_path / "orc_pd")
    spark.range(10_000).selectExpr("id AS k", "id % 100 AS v").write.format("orc").save(path)
    df = spark.read.format("orc").load(path).filter(F.col("k") < 10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(k), LessThan(k,10)]" in plan or "LessThan(k,10)" in plan
    assert df.count() == 10


def test_csv_malformed_record_modes(spark, tmp_path):
    """Corrupt-input policy knobs on the CSV source: PERMISSIVE null-fills
    and captures the raw line in the corrupt-record column, DROPMALFORMED
    silently drops, FAILFAST raises — the three dirty-lake behaviors."""
    p = tmp_path / "dirty.csv"
    p.write_text("k,v\n1,10\nnot_an_int,20\n3,thirty\n4,40\n")
    schema = "k long, v long, _corrupt string"

    perm = (
        spark.read.option("header", "true").option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .schema(schema).csv(str(p))
    ).collect()
    assert len(perm) == 4
    bad = [r for r in perm if r["_corrupt"] is not None]
    assert {r["_corrupt"] for r in bad} == {"not_an_int,20", "3,thirty"}
    assert all(r["k"] in (1, 4) for r in perm if r["_corrupt"] is None)

    dropped = (
        spark.read.option("header", "true").option("mode", "DROPMALFORMED")
        .schema("k long, v long").csv(str(p))
    ).collect()
    assert sorted((r["k"], r["v"]) for r in dropped) == [(1, 10), (4, 40)]

    import pytest as _pytest

    failfast = (
        spark.read.option("header", "true").option("mode", "FAILFAST")
        .schema("k long, v long").csv(str(p))
    )
    with _pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        failfast.collect()
