"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column names,
and values (order-insensitive, column-name-sorted — like the driver's
value-hash).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)

    def norm(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NULL"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return f"{v:.1f}"
            return f"{v:.12g}"
        if isinstance(v, pd.Timestamp):
            return v.strftime("%Y-%m-%d %H:%M:%S.%f")
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist"):
            seq = v.tolist() if hasattr(v, "tolist") else list(v)
            return "[" + ",".join(str(norm(x)) for x in seq) + "]"
        return str(v)

    out = df.apply(lambda col: col.map(norm))
    return out.sort_values(by=list(out.columns), ignore_index=True)


def compare(name: str, spark_df, oracle_pd: pd.DataFrame) -> list[str]:
    errors: list[str] = []
    spark_pd = spark_df.toPandas()
    if len(spark_pd) != len(oracle_pd):
        errors.append(f"row count: spark={len(spark_pd)} oracle={len(oracle_pd)}")
    s_cols, o_cols = sorted(spark_pd.columns), sorted(oracle_pd.columns)
    if s_cols != o_cols:
        errors.append(f"columns: spark={s_cols} oracle={o_cols}")
        return errors
    a, b = canon(spark_pd), canon(oracle_pd)
    if not a.equals(b):
        diff_mask = ~(a == b).all(axis=1) if len(a) == len(b) else None
        if diff_mask is not None and diff_mask.any():
            i = diff_mask.idxmax()
            errors.append(
                f"values differ; first diff row {i}:\n  spark : {a.loc[i].to_dict()}\n  oracle: {b.loc[i].to_dict()}"
            )
        else:
            errors.append("values differ (row sets)")
    return errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as e

    if os.environ.get("SPARK_GRAFT_TUNED"):
        # fast local iteration path only — NOT what the driver runs
        from pos_dlt_spark.session import get_spark

        spark = get_spark("check_oracle")
    else:
        # Mirror the driver: a VANILLA session with none of session.py's
        # confs, so any query that silently depends on a builder-time conf
        # (the round-1 nanosAsLong bug) fails here first. local[32]/32
        # shuffle partitions only keep the mirror fast; they are sizing, not
        # semantics.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("check_oracle_vanilla")
            .master("local[32]")
            .config("spark.sql.shuffle.partitions", "32")
            .config("spark.driver.memory", "8g")
            .getOrCreate()
        )
    con = duckdb_conn(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries: {sorted(unknown)}")
            return 2
        qs = {n: f for n, f in qs.items() if n in only}
    failed = []
    timings: dict[str, float] = {}
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                odf = con.execute(oracles[name]).fetchdf()
                errs = compare(name, sdf, odf)
            else:
                n = sdf.count()
                errs = [] if n >= 0 else ["no rows"]
                print(f"  (rows-only) {name}: {n} rows")
        except Exception as ex:  # noqa: BLE001
            errs = [f"EXCEPTION: {type(ex).__name__}: {ex}"]
        timings[name] = time.time() - t0
        if errs:
            failed.append(name)
            print(f"FAIL {name}  [{timings[name]:.1f}s]")
            for err in errs:
                print(f"  {err}")
        else:
            print(f"OK   {name}  [{timings[name]:.1f}s]")
    slow = sorted(timings.items(), key=lambda kv: -kv[1])[:8]
    print("\nslowest (spark+duckdb per query): " + ", ".join(f"{n}={t:.1f}s" for n, t in slow))
    print(f"{len(qs) - len(failed)}/{len(qs)} queries match at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
