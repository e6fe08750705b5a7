"""Tick-sentinel invariance (r13): every session-resumable streaming gate
appends a sentinel delta to its landing before each RESUMED run so the
steady tick measures real per-batch work — and MUST still return rows
bit-identical to its first (full-replay) call, because the driver's
oracle hashes results and any drift would be a correctness regression.

This is the regression net for the sentinel design: disjoint key domains
(negative ids, '__tick__' labels, far-future event times) plus the
per-gate result filters.
"""

from __future__ import annotations

import os

import pytest

SF = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")

RESUMABLE = [
    "streaming_hourly_rollup",
    "streaming_cdc_latest_state",
    "streaming_cdc_bucketed_state",
    "streaming_stream_static_join",
    "streaming_stream_stream_join",
    "streaming_corpus_ingest",
    "streaming_distinct_keys",
    "streaming_user_running_stats",
    "streaming_incremental_gold",
    "streaming_update_mode_rollup",
    "streaming_stream_stream_left_join",
    "streaming_sessionized_native",
    "streaming_ann_index_build",
    "streaming_delta_replay_counts",
    "pos_scd2_inventory_history_flow",
    "pipeline_append_flows",
]


def _canon(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(str(v) for v in row) for row in df.select(*cols).collect())


@pytest.mark.parametrize("name", RESUMABLE)
def test_resumed_tick_result_identical(spark, name):
    from pos_dlt_spark.queries import REGISTRY
    import pos_dlt_spark.queries_streaming  # noqa: F401  (registers gates)

    q = REGISTRY[name]
    first = _canon(q.fn(spark, SF))
    assert len(first) > 0
    resumed = _canon(q.fn(spark, SF))
    assert resumed == first, f"{name}: resumed tick changed the result"


def test_tick_sentinel_rows_actually_flow(spark):
    """The sentinel machinery must add real input (not a no-op): after a
    resumed call, the gate's landing contains more files than after the
    first call — i.e. the resumed availableNow cycle had new data."""
    from pos_dlt_spark import queries_streaming as qs
    from pos_dlt_spark.queries import REGISTRY

    q = REGISTRY["streaming_distinct_keys"]
    q.fn(spark, SF).count()
    land = qs._LANDING_CACHE[(os.path.abspath(SF), "distinct_keys")]
    n_before = len([f for f in os.listdir(land) if f.endswith(".parquet")])
    q.fn(spark, SF).count()
    n_after = len([f for f in os.listdir(land) if f.endswith(".parquet")])
    assert n_after > n_before
