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
