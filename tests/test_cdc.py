"""apply_changes sequence semantics (reference `03:379-384`; SURVEY §3.3):
intra-batch latest-per-key, out-of-order rejection, idempotent re-runs."""

from datetime import datetime

import pytest

from pos_dlt_spark.operators.cdc import ApplyChanges, latest_per_key

KEYS = ["store_id", "item_id"]
COLS = ["store_id", "item_id", "date_time", "quantity"]


def df_of(spark, rows):
    return spark.createDataFrame(rows, COLS)


def as_dict(df):
    return {(r.store_id, r.item_id): (r.date_time, r.quantity) for r in df.collect()}


@pytest.fixture
def ac(tmp_path):
    return ApplyChanges(str(tmp_path / "target"), keys=KEYS, sequence_by="date_time")


def test_latest_per_key_picks_max_sequence(spark):
    df = df_of(
        spark,
        [
            (1, 1, datetime(2021, 1, 1), 10),
            (1, 1, datetime(2021, 1, 3), 30),
            (1, 1, datetime(2021, 1, 2), 20),
            (2, 1, datetime(2021, 1, 1), 5),
        ],
    )
    out = as_dict(latest_per_key(df, KEYS, "date_time"))
    assert out == {(1, 1): (datetime(2021, 1, 3), 30), (2, 1): (datetime(2021, 1, 1), 5)}


def test_merge_intra_batch_latest_and_insert(spark, ac):
    batch = df_of(
        spark,
        [
            (1, 1, datetime(2021, 1, 1), 10),
            (1, 1, datetime(2021, 1, 5), 50),  # later within same batch wins
            (2, 2, datetime(2021, 1, 2), 7),
        ],
    )
    out = as_dict(ac.merge(None, batch))
    assert out == {(1, 1): (datetime(2021, 1, 5), 50), (2, 2): (datetime(2021, 1, 2), 7)}


def test_merge_out_of_order_older_row_ignored(spark, ac):
    target = df_of(spark, [(1, 1, datetime(2021, 1, 5), 50)])
    older = df_of(spark, [(1, 1, datetime(2021, 1, 2), 99)])
    out = as_dict(ac.merge(target, older))
    assert out == {(1, 1): (datetime(2021, 1, 5), 50)}


def test_merge_newer_row_updates(spark, ac):
    target = df_of(spark, [(1, 1, datetime(2021, 1, 5), 50)])
    newer = df_of(spark, [(1, 1, datetime(2021, 1, 9), 70)])
    out = as_dict(ac.merge(target, newer))
    assert out == {(1, 1): (datetime(2021, 1, 9), 70)}


def test_merge_exact_tie_keeps_existing_target_row(spark, ac):
    target = df_of(spark, [(1, 1, datetime(2021, 1, 5), 50)])
    tie = df_of(spark, [(1, 1, datetime(2021, 1, 5), 99)])
    out = as_dict(ac.merge(target, tie))
    assert out == {(1, 1): (datetime(2021, 1, 5), 50)}


def test_merge_idempotent_reapply(spark, ac):
    batch = df_of(spark, [(1, 1, datetime(2021, 1, 5), 50), (2, 2, datetime(2021, 1, 2), 7)])
    once = ac.merge(None, batch)
    twice = ac.merge(once, batch)
    assert as_dict(once) == as_dict(twice)


def test_streaming_upsert_end_to_end(spark, tmp_path, ac):
    """Drive process_batch like foreachBatch would, across three epochs."""
    b1 = df_of(spark, [(1, 1, datetime(2021, 1, 1), 10), (1, 2, datetime(2021, 1, 1), 20)])
    b2 = df_of(spark, [(1, 1, datetime(2021, 1, 6), 60)])  # update
    b3 = df_of(spark, [(1, 1, datetime(2021, 1, 3), 99), (1, 3, datetime(2021, 1, 2), 30)])
    for i, b in enumerate([b1, b2, b3]):
        ac.process_batch(b, i)
    out = as_dict(spark.read.parquet(ac.target_path))
    assert out == {
        (1, 1): (datetime(2021, 1, 6), 60),  # out-of-order b3 row ignored
        (1, 2): (datetime(2021, 1, 1), 20),
        (1, 3): (datetime(2021, 1, 2), 30),
    }


def test_bucketed_merge_same_result_as_full_rewrite(spark, tmp_path):
    """n_buckets changes the storage/IO strategy only — final state must be
    identical to the full-rewrite mode across multi-batch out-of-order
    replay."""
    batches = [
        [(1, 1, datetime(2021, 1, 2), 20), (2, 2, datetime(2021, 1, 1), 5)],
        [(1, 1, datetime(2021, 1, 1), 10),  # out-of-order: must lose
         (3, 3, datetime(2021, 1, 4), 40)],
        [(2, 2, datetime(2021, 1, 9), 9), (1, 1, datetime(2021, 1, 8), 80)],
    ]
    full = ApplyChanges(str(tmp_path / "full"), keys=KEYS, sequence_by="date_time")
    buck = ApplyChanges(
        str(tmp_path / "buck"), keys=KEYS, sequence_by="date_time", n_buckets=4
    )
    for i, rows in enumerate(batches):
        full.process_batch(df_of(spark, rows), i)
        buck.process_batch(df_of(spark, rows), i)
    assert as_dict(full.read_target(spark)) == as_dict(buck.read_target(spark))
    assert as_dict(buck.read_target(spark)) == {
        (1, 1): (datetime(2021, 1, 8), 80),
        (2, 2): (datetime(2021, 1, 9), 9),
        (3, 3): (datetime(2021, 1, 4), 40),
    }


def test_bucketed_merge_leaves_untouched_buckets_alone(spark, tmp_path):
    """A batch touching one key must not rewrite parquet files in other
    buckets — the property that makes merge cost track batch key-spread
    instead of target size."""
    import glob
    import os as _os

    ac = ApplyChanges(
        str(tmp_path / "t"), keys=KEYS, sequence_by="date_time", n_buckets=8
    )
    # seed many keys so several buckets exist
    seed = [(k, k, datetime(2021, 1, 1), k) for k in range(1, 30)]
    ac.process_batch(df_of(spark, seed), 0)
    files_before = {
        f: _os.path.getmtime(f)
        for f in glob.glob(str(tmp_path / "t" / "__bucket=*" / "*.parquet"))
    }
    assert len({_os.path.dirname(f) for f in files_before}) > 1  # multiple buckets

    ac.process_batch(df_of(spark, [(1, 1, datetime(2021, 2, 1), 99)]), 1)
    files_after = {
        f: _os.path.getmtime(f)
        for f in glob.glob(str(tmp_path / "t" / "__bucket=*" / "*.parquet"))
    }
    # every bucket dir except the touched one kept identical files+mtimes
    from pyspark.sql import functions as F

    touched = (
        df_of(spark, [(1, 1, datetime(2021, 2, 1), 99)])
        .select(F.pmod(F.hash("store_id", "item_id"), F.lit(8)).alias("b"))
        .collect()[0][0]
    )
    touched_dir = str(tmp_path / "t" / f"__bucket={touched}")
    for f, mtime in files_before.items():
        if not f.startswith(touched_dir):
            assert f in files_after and files_after[f] == mtime, f
    # and the merge actually landed
    assert as_dict(ac.read_target(spark))[(1, 1)] == (datetime(2021, 2, 1), 99)
