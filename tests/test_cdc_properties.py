"""Property-based tests (hypothesis) for the CDC apply-changes merge —
SURVEY §7.2 calls this the hardest correctness piece: for ANY event set
and ANY micro-batch partitioning of it, folding the batches through
ApplyChanges.merge must equal the one-shot batch latest_per_key oracle,
and replaying any batch must change nothing (idempotence).

Rows are (key, seq, payload); duplicated (key, seq) pairs are generated on
purpose — ties must resolve by the payload tiebreaker, and a re-delivered
older row must never displace a newer one.
"""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pos_dlt_spark.operators.cdc import ApplyChanges, latest_per_key

ROWS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=4),  # key: few keys -> collisions
        st.integers(min_value=0, max_value=9),  # seq: small range -> ties
        st.integers(min_value=0, max_value=99),  # payload/tiebreaker
    ),
    min_size=1,
    max_size=24,
)
CUTS = st.lists(st.integers(min_value=1, max_value=23), max_size=3, unique=True)


def _expected(rows):
    """Driver-side oracle: latest (seq, payload) per key."""
    best = {}
    for k, s, p in rows:
        if k not in best or (s, p) > best[k]:
            best[k] = (s, p)
    return {(k, *v) for k, v in best.items()}


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["k", "seq", "payload"]),
        "k long, seq long, payload long",
    )


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS, cuts=CUTS)
def test_merge_equals_oracle_for_any_batching(spark, rows, cuts):
    ac = ApplyChanges("unused", keys=["k"], sequence_by="seq", tiebreakers=["payload"])
    bounds = sorted({c for c in cuts if c < len(rows)})
    batches, prev = [], 0
    for b in [*bounds, len(rows)]:
        if rows[prev:b]:
            batches.append(rows[prev:b])
        prev = b

    state = None
    for batch in batches:
        state = ac.merge(state, _df(spark, batch))
    got = {(r.k, r.seq, r.payload) for r in state.collect()}
    assert got == _expected(rows)

    # idempotence: replaying any earlier batch changes nothing
    replay = ac.merge(state, _df(spark, batches[0]))
    assert {(r.k, r.seq, r.payload) for r in replay.collect()} == _expected(rows)


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(rows=ROWS)
def test_latest_per_key_matches_python_oracle(spark, rows):
    out = latest_per_key(_df(spark, rows), ["k"], "seq", tiebreakers=["payload"])
    assert {(r.k, r.seq, r.payload) for r in out.collect()} == _expected(rows)
