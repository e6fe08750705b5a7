"""Corpus-assembly queries: dataset split, sequence packing, benchmark
decontamination, TF-IDF terms — the operators/corpus.py surface wired into
the oracle gate over the `documents` table.

Determinism notes (same rules as queries.py's header):
- split buckets come from the portable md5 phash, identical in DuckDB;
- packing's distributed prefix sum must equal the oracle's single global
  window cumsum — that equality IS the correctness claim;
- tf-idf scores are tf * ln(N/df) with the log's argument built by ONE
  division, mirrored verbatim in the oracle; ties break on the token
  string, and double values ride the gate's 12-digit canonicalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_dlt_spark.functions import phash_sql
from pos_dlt_spark.operators import corpus as C
from pos_dlt_spark.queries import query
from pos_dlt_spark.queries_ml import _HSH_CTE, _SH_CTE, _TOKS_CTE
from pos_dlt_spark.tables import load_table

_BUCKET_SQL = phash_sql("CAST(doc_id AS VARCHAR)", C.SPLIT_SALT) + " % 100"
_NTOK_SQL = r"CAST(len(regexp_split_to_array(trim(lower(text)), '\s+')) AS BIGINT)"
PACK_BUDGET = 512
BENCH_MAX_ID = 25  # docs 0..24 stand in for the benchmark/eval set
MIN_SHARED = 5


@query(
    "corpus_split_assign",
    oracle=f"""
    SELECT doc_id,
           CAST({_BUCKET_SQL} AS BIGINT) AS split_bucket,
           CASE WHEN {_BUCKET_SQL} < 80 THEN 'train'
                WHEN {_BUCKET_SQL} < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def corpus_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment by salted id hash
    (content-free: re-cleaning text never moves a doc across splits)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.split_assign(docs).select("doc_id", "split_bucket", "split")


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH toks AS (SELECT doc_id, {_NTOK_SQL} AS n_tokens FROM documents),
    c AS (
        SELECT doc_id, n_tokens,
               SUM(n_tokens) OVER (ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS cb
        FROM toks)
    SELECT doc_id, n_tokens,
           CAST(cb // {PACK_BUDGET} AS BIGINT) AS bin_id,
           CAST(cb % {PACK_BUDGET} AS BIGINT) AS bin_offset
    FROM c
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pack documents into {budget}-token bins in id order. The Spark side
    computes the running sum with a DISTRIBUTED per-id-range prefix sum (no
    global single-partition window); the oracle is the naive global window
    cumsum — their equality is exactly the operator's correctness claim."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.pack_sequences(docs, budget=PACK_BUDGET, n_parts=16)


@query(
    "corpus_decontamination",
    oracle=f"""
    WITH {_TOKS_CTE}, {_SH_CTE}, {_HSH_CTE},
    t AS (SELECT doc_id AS train_id, unnest(hsh) AS h FROM hs_t WHERE doc_id >= {BENCH_MAX_ID}),
    b AS (SELECT doc_id AS bench_id, len(hsh) AS bench_size, unnest(hsh) AS h
          FROM hs_t WHERE doc_id < {BENCH_MAX_ID})
    SELECT train_id, bench_id,
           CAST(COUNT(*) AS BIGINT) AS n_shared_shingles,
           CAST(COUNT(*) AS DOUBLE) / CAST(bench_size AS DOUBLE) AS bench_overlap
    FROM t JOIN b USING (h)
    GROUP BY train_id, bench_id, bench_size
    HAVING COUNT(*) >= {MIN_SHARED}
    """,
)
def corpus_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: train docs (id >= 25) sharing >= 5 word
    3-gram shingles with any benchmark doc (id < 25), via a broadcast
    equi-join on shingle hash — never an all-pairs comparison. The corpus's
    planted near-duplicates make the expected leaks."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    bench = docs.filter(F.col("doc_id") < BENCH_MAX_ID)
    train = docs.filter(F.col("doc_id") >= BENCH_MAX_ID)
    return C.contamination_pairs(train, bench, min_shared=MIN_SHARED)


SAMPLE_RATES = {"en": 30, "de": 100, "es": 100, "fr": 100, "zh": 100}
_SAMPLE_BUCKET_SQL = phash_sql("CAST(doc_id AS VARCHAR)", C.SAMPLE_SALT) + " % 100"
_RATE_SQL = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in sorted(SAMPLE_RATES.items())
) + " ELSE 0 END"


@query(
    "corpus_stratified_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_SAMPLE_BUCKET_SQL} < {_RATE_SQL}
    """,
)
def corpus_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language sampling that downweights the
    over-represented language (en at 30%, others kept) — the corpus-mix
    control step. Pure per-row hash filter: no RNG seed, no shuffle,
    membership reproducible in any engine."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.stratified_sample(docs, SAMPLE_RATES).select("doc_id", "lang")


_GRAMS_SQL = (
    "CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks)-1), "
    "i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]) "
    "ELSE [array_to_string(toks, ' ')] END"
)


@query(
    "corpus_repeated_ngrams",
    oracle=f"""
    WITH {_TOKS_CTE},
    g AS (SELECT doc_id, {_GRAMS_SQL} AS grams FROM toks_t)
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_ngrams,
           CAST(len(list_distinct(grams)) AS BIGINT) AS n_distinct_ngrams,
           1.0 - CAST(len(list_distinct(grams)) AS DOUBLE) / CAST(len(grams) AS DOUBLE)
             AS repeated_ratio
    FROM g
    """,
)
def corpus_repeated_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc repeated word-3-gram ratio (Gopher-style repetition
    filter) — per-row array expression, one tokenize pass, no shuffle."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.repeated_ngram_ratio(docs)


@query(
    "corpus_vocab",
    oracle=f"""
    WITH tok AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS token
        FROM documents),
    c AS (
        SELECT token, CAST(COUNT(*) AS BIGINT) AS n_occurrences
        FROM tok GROUP BY 1 HAVING COUNT(*) >= 5)
    SELECT token, n_occurrences,
           CAST(row_number() OVER (ORDER BY n_occurrences DESC, token) AS BIGINT)
             AS vocab_id
    FROM c
    """,
)
def corpus_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-vocabulary build: corpus-wide token counts (min_count=5),
    ids by frequency rank. The Spark side assigns ids with the DISTRIBUTED
    global_rank (range partition + local row_number + prefix offsets); the
    oracle is the naive global window — their equality is the operator's
    correctness claim, mirroring corpus_pack_sequences."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.build_vocab(docs, min_count=5)


@query(
    "corpus_tfidf_top_terms",
    oracle=f"""
    WITH {_TOKS_CTE},
    tok AS (SELECT doc_id, unnest(toks) AS token FROM toks_t),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n_t AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
    s AS (
        SELECT doc_id, token, tf, df,
               CAST(tf AS DOUBLE) * ln((SELECT n FROM n_t) / CAST(df AS DOUBLE)) AS score
        FROM tf JOIN dfreq USING (token))
    SELECT doc_id, token, tf, df, score, CAST(rank AS INTEGER) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, token) AS rank
          FROM s) r
    WHERE rank <= 3
    """,
)
def corpus_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by classic tf * ln(N/df),
    token-name tiebreak; double scores ride the gate's 12-digit
    canonicalization like the cosine queries."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.tfidf_top_terms(docs, k=3)


@query(
    "corpus_bigram_pmi",
    oracle=f"""
    WITH {_TOKS_CTE},
    uc AS (
        SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w
        FROM (SELECT unnest(toks) AS w FROM toks_t)
        GROUP BY w),
    n_t AS (SELECT CAST(SUM(c_w) AS BIGINT) AS n FROM uc),
    bg AS (
        SELECT list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1]) AS bs
        FROM toks_t WHERE len(toks) >= 2),
    bc AS (
        SELECT bigram,
               split_part(bigram, ' ', 1) AS w1,
               split_part(bigram, ' ', 2) AS w2,
               CAST(COUNT(*) AS BIGINT) AS c_ab
        FROM (SELECT unnest(bs) AS bigram FROM bg)
        GROUP BY bigram),
    m_t AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS m FROM bc)
    SELECT bigram, c_ab,
           ln(CAST(c_ab * n * n AS DOUBLE) / CAST(m * ua.c_w * ub.c_w AS DOUBLE)) AS pmi
    FROM bc, n_t, m_t
    JOIN uc ua ON bc.w1 = ua.w
    JOIN uc ub ON bc.w2 = ub.w
    WHERE c_ab >= {MIN_SHARED}
    ORDER BY pmi DESC, bigram
    LIMIT 50
    """,
)
def corpus_bigram_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: top-50 adjacent word pairs by PMI (min support
    {MIN_SHARED}) — exact integer counts end-to-end, one double division +
    ln per surviving bigram (operators/corpus.bigram_pmi)."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.bigram_pmi(docs, min_count=MIN_SHARED, top_n=50)


_CAP_RANK_SQL = phash_sql("CAST(doc_id AS VARCHAR)", "domaincap:")


@query(
    "corpus_domain_cap",
    oracle=f"""
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source ORDER BY {_CAP_RANK_SQL}, doc_id
               ) AS rk
        FROM documents) t
    WHERE rk <= 100
    """,
)
def corpus_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (corpus-mix balancing: no source may
    contribute more than K docs). Selection ranks by a salted portable
    hash, then doc_id — deterministic, content-free (re-cleaning text
    never changes who survives), and uniformly random within each source
    for any K. The rank window partitions by source, so a giant domain
    sorts only its own rows; at real scale swap row_number for a two-phase
    per-partition pre-cap (cap*partitions) before the window if a single
    domain exceeds one task's memory."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.domain_cap(docs, cap=100).select("doc_id", "source", "rk")


SPAN_N = 8
_TOKS_SQL = r"regexp_split_to_array(trim(lower(text)), '\s+')"


@query(
    "corpus_duplicate_spans",
    oracle=f"""
    WITH toks_t AS (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents),
    pos_t AS (SELECT doc_id, toks, unnest(range(0, len(toks)-{SPAN_N}+1)) AS pos
              FROM toks_t WHERE len(toks) >= {SPAN_N}),
    g AS (SELECT doc_id, pos,
                 {phash_sql(f"array_to_string(toks[pos+1:pos+{SPAN_N}], ' ')")} AS gh
          FROM pos_t),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(DISTINCT doc_id) >= 2),
    d AS (SELECT g.doc_id, g.pos FROM g JOIN dup USING (gh)),
    f AS (SELECT doc_id, pos,
                 CASE WHEN lag(pos) OVER w IS NULL
                           OR pos - lag(pos) OVER w > {SPAN_N}
                      THEN 1 ELSE 0 END AS ns
          FROM d WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
    s AS (SELECT *, SUM(ns) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS sid FROM f)
    SELECT doc_id, MIN(pos) AS span_start,
           MAX(pos) + {SPAN_N} AS span_end,
           MAX(pos) + {SPAN_N} - MIN(pos) AS span_tokens
    FROM s GROUP BY doc_id, sid
    """,
)
def corpus_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-level exact-substring duplication (corpus.
    duplicate_ngram_spans): maximal token spans covered by word 8-grams
    occurring in >= 2 documents — the span analogue of suffix-array
    training-data dedup, as two equi-partitioned shuffles (gram hash agg,
    per-doc interval merge). The oracle rebuilds the same spans with
    DuckDB window CTEs over the identical md5 gram hash."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    return C.duplicate_ngram_spans(docs, n=SPAN_N, min_docs=2)


_EPOCH = 1
_EP_KEY = phash_sql("CAST(doc_id AS VARCHAR)", f"{C.EPOCH_SALT}{_EPOCH}:")


@query(
    "corpus_epoch_shuffle",
    oracle=f"""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY {_EP_KEY}, doc_id) - 1 AS BIGINT) AS position,
           {_EP_KEY} AS shuffle_key
    FROM documents
    """,
)
def corpus_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic epoch-1 training shuffle (corpus.epoch_shuffle):
    position is a pure function of (epoch, doc_id) — restartable,
    engine-portable, and a fresh permutation per epoch — computed with
    the two-phase distributed rank, no global single-partition sort. The
    oracle is the naive global window over the same salted hash."""
    docs = load_table(spark, sf_dir, "documents")
    return C.epoch_shuffle(docs, epoch=_EPOCH)


_MIX = (("en", 3), ("de", 1), ("fr", 1))


def _mix_oracle() -> str:
    branches = []
    for name, w in _MIX:
        key = phash_sql("CAST(doc_id AS VARCHAR)", f"mix:{name}:")
        branches.append(f"""
        SELECT '{name}' AS source, doc_id,
               (row_number() OVER (ORDER BY {key}, doc_id) * 1000000) // {w} AS vt,
               row_number() OVER (ORDER BY {key}, doc_id) - 1 AS sr
        FROM documents WHERE lang = '{name}'""")
    return f"""
    WITH u AS ({" UNION ALL ".join(branches)})
    SELECT source, doc_id,
           CAST(row_number() OVER (ORDER BY vt, source, sr) - 1 AS BIGINT) AS position
    FROM u
    """


@query("corpus_mixture_interleave", oracle=_mix_oracle())
def corpus_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture schedule (corpus.mixture_interleave): en/de/fr
    sub-corpora interleave 3:1:1 by integer virtual time over per-source
    deterministic shuffles — the step that turns N cleaned sources into
    one proportioned training stream without concatenation artifacts.
    Both rank levels are the distributed two-phase row_number."""
    docs = load_table(spark, sf_dir, "documents")
    sources = [
        (docs.filter(F.col("lang") == name), name, w) for name, w in _MIX
    ]
    return C.mixture_interleave(sources)


_WS_KEY = (
    f"ln((CAST({phash_sql('CAST(doc_id AS VARCHAR)', C.SAMPLE_WS_SALT)} + 1 AS DOUBLE))"
    " / 4294967296.0) / CAST(ntok AS DOUBLE)"
)


@query(
    "corpus_weighted_sample",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, {_NTOK_SQL} AS ntok FROM documents),
    s AS (SELECT doc_id, lang, ntok, {_WS_KEY} AS key FROM w),
    r AS (SELECT lang, doc_id, ntok,
                 row_number() OVER (PARTITION BY lang ORDER BY key DESC, doc_id) AS rk
          FROM s)
    SELECT lang, doc_id, CAST(ntok AS BIGINT) AS n_tokens
    FROM r WHERE rk <= 5
    """,
)
def corpus_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (corpus.weighted_sample,
    Efraimidis–Spirakis): 5 docs per language, probability proportional
    to token count, keys ln(u)/w from the salted md5 uniform — no RNG
    state, identical IEEE op chain in both engines, two-phase windows so
    a giant language never funnels through one task."""
    docs = load_table(spark, sf_dir, "documents", spread=True)
    from pos_dlt_spark.operators.text import tokens as _tk

    with_w = docs.select(
        "doc_id", "lang", F.size(_tk(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    return C.weighted_sample(
        with_w, k=5, weight_col="n_tokens", by="lang", pre_buckets=8
    ).select("lang", "doc_id", "n_tokens")
