"""duplicate_ngram_spans semantics on hand-built docs: cross-doc n-grams
mark spans, overlapping/adjacent gram windows merge into one maximal span,
within-doc-only repetition does not count (min_docs=2), short docs are
skipped."""

import pytest

from pos_dlt_spark.operators.corpus import duplicate_ngram_spans


@pytest.fixture(scope="module")
def docs(spark):
    shared = "a b c d"  # the duplicated 4-token phrase
    rows = [
        # doc 0 and 1 share "a b c d" at different offsets
        (0, f"x1 x2 {shared} y1 y2 y3"),
        (1, f"z1 {shared} z2 z3 z4 z5"),
        # doc 2: two occurrences of the shared phrase, gap > n between them
        (2, f"{shared} g1 g2 g3 g4 g5 g6 {shared}"),
        # doc 3: within-doc repetition ONLY (its phrase appears nowhere else)
        (3, "q1 q2 q3 q4 q1 q2 q3 q4 q5 q6"),
        # doc 4: too short to carry an n-gram
        (4, "a b"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def spans_of(df, doc_id):
    return sorted(
        (r["span_start"], r["span_end"])
        for r in df.collect()
        if r["doc_id"] == doc_id
    )


@pytest.fixture(scope="module")
def result(docs):
    return duplicate_ngram_spans(docs, n=4, min_docs=2).cache()


def test_cross_doc_spans_found(result):
    assert spans_of(result, 0) == [(2, 6)]
    assert spans_of(result, 1) == [(1, 5)]


def test_separated_occurrences_stay_two_spans(result):
    assert spans_of(result, 2) == [(0, 4), (10, 14)]


def test_within_doc_only_excluded(result):
    assert spans_of(result, 3) == []


def test_short_doc_skipped(result):
    assert spans_of(result, 4) == []


def test_adjacent_windows_merge(spark):
    # "a b c d e" shared: grams at pos 0 and 1 overlap -> ONE span of 5
    rows = [(0, "a b c d e t1 t2"), (1, "s1 a b c d e s2")]
    df = duplicate_ngram_spans(
        spark.createDataFrame(rows, ["doc_id", "text"]), n=4, min_docs=2
    )
    assert spans_of(df, 0) == [(0, 5)]
    assert spans_of(df, 1) == [(1, 6)]
