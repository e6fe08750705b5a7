"""Property-based tests for the round-2 operators: salted_join must be
row-identical to the plain join for ANY input and salt, and
connected_components must equal a union-find for ANY edge list on BOTH
execution paths (driver fast path + distributed stars)."""

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pos_dlt_spark.operators.cluster import connected_components
from pos_dlt_spark.operators.skew import salted_join

LEFT = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 99)),  # (k, lv): hot keys likely
    min_size=0, max_size=30,
)
RIGHT = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 99)),  # (k, rv): dup keys allowed
    min_size=0, max_size=10,
)
EDGES = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0, max_size=25,
)

_SETTINGS = settings(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(left=LEFT, right=RIGHT, salt=st.sampled_from([1, 3, 8]), how=st.sampled_from(["inner", "left"]))
@_SETTINGS
def test_salted_join_row_identical(spark, left, right, salt, how):
    ldf = spark.createDataFrame(left, "k long, lv long") if left else spark.createDataFrame([], "k long, lv long")
    rdf = spark.createDataFrame(right, "k long, rv long") if right else spark.createDataFrame([], "k long, rv long")
    got = Counter(tuple(r) for r in salted_join(ldf, rdf, ["k"], salt=salt, how=how).collect())
    want = Counter(tuple(r) for r in ldf.join(rdf, ["k"], how).collect())
    assert got == want


def _uf(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@given(edges=EDGES, forced_distributed=st.booleans())
@_SETTINGS
def test_connected_components_matches_union_find(spark, edges, forced_distributed):
    df = (
        spark.createDataFrame(edges, "src long, dst long")
        if edges
        else spark.createDataFrame([], "src long, dst long")
    )
    thresh = 0 if forced_distributed else 100_000
    got = {
        (r["id"], r["component"])
        for r in connected_components(df, "src", "dst", driver_threshold=thresh).collect()
    }
    assert got == set(_uf(edges).items())


# -- duplicate_ngram_spans vs brute force -----------------------------------

DOCS = st.lists(
    st.lists(st.sampled_from("abcde"), min_size=0, max_size=12),  # small alphabet -> collisions likely
    min_size=1, max_size=8,
)


def _brute_spans(docs, n):
    """Reference: positional n-grams, cross-doc duplicated grams, merged
    [p, p+n) intervals chaining while next.pos <= prev.pos + n."""
    grams = {}  # gram -> set(doc)
    pos = {}  # doc -> [p, ...]
    for d, toks in enumerate(docs):
        for p in range(len(toks) - n + 1):
            grams.setdefault(tuple(toks[p : p + n]), set()).add(d)
    for d, toks in enumerate(docs):
        ps = [
            p
            for p in range(len(toks) - n + 1)
            if len(grams[tuple(toks[p : p + n])]) >= 2
        ]
        if ps:
            pos[d] = ps
    out = set()
    for d, ps in pos.items():
        start, end = ps[0], ps[0] + n
        for p in ps[1:]:
            if p <= end:  # p - prev <= n  <=>  p <= prev + n; end tracks prev+n
                end = p + n
            else:
                out.add((d, start, end))
                start, end = p, p + n
        out.add((d, start, end))
    return out


@given(docs=DOCS, n=st.sampled_from([2, 3]))
@_SETTINGS
def test_duplicate_spans_equal_brute_force(spark, docs, n):
    from pos_dlt_spark.operators.corpus import duplicate_ngram_spans

    rows = [(i, " ".join(t)) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in duplicate_ngram_spans(df, n=n, min_docs=2).collect()
    }
    # brute force works on the same whitespace tokens; empty docs tokenize
    # to [''] (split of ''), mirroring tokens()'s behavior on empty text
    toks = [t if t else [""] for t in docs]
    assert got == _brute_spans(toks, n)


# -- BPE trainer vs pure-Python reference ------------------------------------

WORD = st.text(alphabet="ab", min_size=1, max_size=4)
DOC = st.lists(WORD, min_size=1, max_size=5).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=6)


def _py_bpe(texts, n_merges):
    wf = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            wf[w] += 1
    seqs = {w: list(w) for w in wf}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for w, f in wf.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += f
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((l, r, c))
        for w, s in seqs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges, seqs


@given(corpus=CORPUS)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_trainer_equals_python_reference(spark, corpus):
    from pos_dlt_spark.operators.corpus import bpe_apply_merges, bpe_learn_merges

    df = spark.createDataFrame(list(enumerate(corpus)), "doc_id long, text string")
    merges = bpe_learn_merges(df, n_merges=3)
    want_merges, seqs = _py_bpe(corpus, 3)
    assert merges == want_merges
    got = {r.doc_id: (r.n_words, r.n_subwords) for r in bpe_apply_merges(df, merges).collect()}
    for i, t in enumerate(corpus):
        words = t.strip().lower().split()
        assert got[i] == (len(words), sum(len(seqs[w]) for w in words))


# -- global_cumsum vs single global window ------------------------------------

ROWS = st.lists(
    st.tuples(st.integers(0, 10_000), st.integers(-1000, 1000)),
    min_size=0, max_size=60, unique_by=lambda t: t[0],
)


@given(rows=ROWS, n_parts=st.sampled_from([1, 3, 8]))
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_global_cumsum_equals_window_any_input(spark, rows, n_parts):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pos_dlt_spark.operators.corpus import global_cumsum

    df = (
        spark.createDataFrame(rows, "k long, v long")
        if rows
        else spark.createDataFrame([], "k long, v long")
    )
    got = {
        (r.k, r.cum)
        for r in global_cumsum(df, [F.col("v").desc(), F.col("k")], "v", n_parts=n_parts).collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {(r.k, r.cum) for r in df.withColumn("cum", F.sum("v").over(w)).collect()}
    assert got == want


# -- profile_table vs pandas reference ---------------------------------------

PROF_ROWS = st.lists(
    st.tuples(
        st.one_of(st.none(), st.integers(-5, 5)),
        st.one_of(st.none(), st.sampled_from(["x", "y", "z"])),
    ),
    min_size=0, max_size=40,
)


@given(rows=PROF_ROWS)
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_profile_table_matches_python(spark, rows):
    from pos_dlt_spark.operators.profile import profile_table

    df = (
        spark.createDataFrame(rows, "a long, b string")
        if rows
        else spark.createDataFrame([], "a long, b string")
    )
    got = {r.column: r for r in profile_table(df, ["a", "b"]).collect()}
    for col, idx in (("a", 0), ("b", 1)):
        vals = [r[idx] for r in rows]
        nn = [v for v in vals if v is not None]
        if not rows:
            assert col not in got  # empty input profiles to zero rows
            continue
        g = got[col]
        assert g.n_rows == len(vals)
        assert g.n_nulls == len(vals) - len(nn)
        assert g.n_distinct == len(set(nn))
        if col == "a":
            assert g.min_num == (float(min(nn)) if nn else None)
            assert g.max_num == (float(max(nn)) if nn else None)
        else:
            assert g.min_str == (min(nn) if nn else None)
            assert g.max_str == (max(nn) if nn else None)
