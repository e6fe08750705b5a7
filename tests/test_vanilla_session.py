"""Driver-condition regression test.

Round 1 shipped a bug where every events-table query depended on a
SparkSession builder conf (`spark.sql.legacy.parquet.nanosAsLong`) that
only our own session.py set — the grading driver's vanilla session crashed
with PARQUET_TYPE_ILLEGAL on all 10 of them. This test reproduces the
driver's exact conditions: a subprocess (so the tuned in-process test
session can't mask anything), a foreign cwd, `__spark_entry__` loaded by
file path, and a bare ``SparkSession.builder.getOrCreate()``.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

DRIVER_SCRIPT = r"""
import importlib.util
spec = importlib.util.spec_from_file_location("__spark_entry__", {entry!r})
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.appName("vanilla_driver_test")
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
qs = m.queries()
# one events-table query (the round-1 failure class) + the flagship entry
rows = qs["events_distinct_pairs"](spark, {sf_dir!r}).count()
assert rows > 0, "events_distinct_pairs returned no rows"
rows = m.entry(spark).count()
assert rows >= 0
print("VANILLA_OK", rows)
"""


def test_events_query_on_vanilla_session_from_foreign_cwd(tmp_path):
    script = DRIVER_SCRIPT.format(
        entry=os.path.join(REPO, "__spark_entry__.py"), sf_dir=SF_DIR
    )
    proc = subprocess.run(
        [sys.executable, "-c", script],
        cwd=str(tmp_path),  # foreign cwd: the driver does not cd into the repo
        capture_output=True,
        text=True,
        timeout=300,
        env={k: v for k, v in os.environ.items() if k != "PYTHONPATH"},
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "VANILLA_OK" in proc.stdout
