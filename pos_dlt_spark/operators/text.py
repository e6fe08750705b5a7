"""Text-analysis operators for training-data pipelines (SURVEY §7.4 /
BASELINE.json north star): token counting, quality scoring, language ID,
document fingerprinting.

Everything is built from JVM-side column expressions (split / filter /
transform / aggregate) — no Python UDFs — so the operators run inside
whole-stage codegen and scale linearly with no shuffle: each is a pure
per-row map over the documents table.

Portability: the same computations are expressible in ANSI SQL (see the
oracle strings in queries.py); hashes are md5-based (identical across
engines) rather than murmur3 (engine-specific).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal per-language stopword lists for the heuristic language ID.
# Order matters: ties resolve by this priority.
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "that", "it", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "los", "se", "no"],
    "de": ["der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"],
    "fr": ["le", "la", "les", "de", "et", "un", "est", "que", "pour", "dans"],
    "zh": ["de5", "le5", "shi4", "zai4", "you3"],  # romanized placeholders
}

LANG_PRIORITY = ["en", "es", "de", "fr", "zh"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def bpe_ish_tokens(text_colname: str) -> Column:
    """A BPE-ish sub-word split: words plus punctuation as separate tokens
    (the regex keeps letter runs, digit runs, and single punctuation marks —
    roughly what a byte-pair vocabulary's word-boundary pre-tokenizer does).
    """
    return F.expr(
        f"regexp_extract_all(lower({text_colname}), '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0)"
    )


def n_tokens(text: Column) -> Column:
    return F.size(tokens(text))


def punct_count(text: Column) -> Column:
    """Count of non-alphanumeric, non-space characters (portable character
    class, not [[:punct:]] which differs between regex engines)."""
    lowered = F.lower(text)
    return F.length(lowered) - F.length(F.regexp_replace(lowered, "[^a-z0-9\\s]", ""))


def stopword_count(text: Column, lang: str = "en") -> Column:
    words = STOPWORDS[lang]
    lit_words = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(lit_words, t)))


def quality_score(text: Column) -> Column:
    """The composite quality score in [0, ~1] as a standalone column
    expression (fixed evaluation order, pure double arithmetic ->
    engine-portable) — usable directly as a streaming-side filter."""
    ntok = n_tokens(text).cast("bigint")
    nchars = F.length(text).cast("bigint")
    npunct = punct_count(text).cast("bigint")
    nstop = stopword_count(text, "en").cast("bigint")
    stop_ratio = nstop.cast("double") / ntok
    punct_ratio = npunct.cast("double") / nchars
    return (
        F.least(ntok.cast("double") / F.lit(100.0), F.lit(1.0)) * F.lit(0.4)
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * F.lit(0.4)
        + (F.lit(1.0) - F.least(punct_ratio * F.lit(10.0), F.lit(1.0))) * F.lit(0.2)
    )


def quality_features(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite score in [0, ~1].

    Heuristics follow the usual LLM-corpus filters (C4/Gopher-style):
    too-short docs, punctuation-free or punctuation-heavy docs, and
    stopword-free docs are penalized.
    """
    text = F.col(text_col)
    ntok = n_tokens(text).cast("bigint")
    nchars = F.length(text).cast("bigint")
    npunct = punct_count(text).cast("bigint")
    nstop = stopword_count(text, "en").cast("bigint")
    mean_word_len = (nchars.cast("double") / ntok)
    stop_ratio = nstop.cast("double") / ntok
    punct_ratio = npunct.cast("double") / nchars
    score = quality_score(text)
    return df.select(
        F.col(id_col),
        ntok.alias("n_tokens"),
        nchars.alias("n_chars_computed"),
        npunct.alias("n_punct"),
        nstop.alias("n_stopwords"),
        mean_word_len.alias("mean_word_len"),
        stop_ratio.alias("stopword_ratio"),
        punct_ratio.alias("punct_ratio"),
        score.alias("quality_score"),
    )


def langid(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: count stopword hits per language, pick the
    argmax with a fixed priority order for ties ('und' when no hits)."""
    text = F.col(text_col)
    scores = {lang: stopword_count(text, lang) for lang in LANG_PRIORITY}
    out = df.select(
        F.col(id_col), *[scores[lang].alias(f"score_{lang}") for lang in LANG_PRIORITY]
    )
    # chained CASE in priority order: first language whose score is maximal
    max_score = F.greatest(*[F.col(f"score_{lang}") for lang in LANG_PRIORITY])
    pred = F.when(max_score == 0, F.lit("und"))
    for lang in LANG_PRIORITY:
        pred = pred.when(F.col(f"score_{lang}") == max_score, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: md5 of whitespace-normalized lowercase text
    (exact-dup key) plus a 32-bit rolling polynomial hash over tokens
    (order-sensitive, so reordered-word docs get different fingerprints
    while whitespace/case changes do not)."""
    text = F.col(text_col)
    normalized = F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")
    from pos_dlt_spark.functions import phash

    rolling = F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * F.lit(31) + phash(t)) % F.lit(2147483647),
    )
    return df.select(
        F.col(id_col),
        F.md5(normalized.cast("binary")).alias("md5_fingerprint"),
        rolling.alias("rolling_hash"),
    )


# -- PII / boilerplate scrubbing --------------------------------------------
# Conservative regex subset (char classes, +/*/{m,n}, alternation) that
# parses identically under Java regex (Spark) and RE2 (DuckDB/Go tools), so
# a lakehouse twin of this scrub produces byte-identical text. No
# lookarounds (RE2 lacks them).
SCRUB_PATTERNS = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "url": (r"https?://[^\s]+", "<URL>"),
    "ipv4": (r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "<IP>"),
    "phone": (r"\+?[0-9][0-9() .-]{7,}[0-9]", "<PHONE>"),
    "long_number": (r"[0-9]{9,}", "<NUM>"),
}
# order matters: URLs before IPs (a URL may contain an IP), emails before
# phone (digits in local parts), specific before generic number runs
SCRUB_ORDER = ("url", "email", "ipv4", "phone", "long_number")


def scrub_pii(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = SCRUB_ORDER,
    out_col: str | None = None,
) -> DataFrame:
    """Replace emails/URLs/IPs/phone numbers/long digit runs with typed
    placeholder tokens, and count each replacement per row (``n_<kind>``
    columns) so a pipeline can quantify and threshold PII density instead
    of scrubbing blind.

    Pure per-row JVM regexp expressions — one projection, no UDF, no
    shuffle; at 100 TB this runs at scan speed inside whole-stage codegen.
    Counts are computed against the PRE-scrub text with the same ordered
    masking (a URL's digits must not also count as a phone), by measuring
    each pattern on the text as scrubbed by the preceding kinds."""
    out_col = out_col or f"{text_col}_scrubbed"
    work = df
    cur = F.col(text_col)
    tmp_cols = []
    for i, kind in enumerate(kinds):
        pat, token = SCRUB_PATTERNS[kind]
        tmp = f"__scrub_{i}"
        work = work.withColumn(
            f"n_{kind}", F.size(F.regexp_extract_all(cur, F.lit(pat), F.lit(0)))
        ).withColumn(tmp, F.regexp_replace(cur, pat, token))
        cur = F.col(tmp)
        tmp_cols.append(tmp)
    work = work.withColumn(out_col, cur)
    return work.drop(*tmp_cols)


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Model-based quality scoring with a corpus-fit unigram LM: each
    document's mean token log-probability under Laplace-smoothed corpus
    frequencies, ln((c+1)/(N+V)). Low scores flag rare-token-heavy junk
    (mojibake, hex dumps); implausibly high scores flag degenerate
    repetition — the classic cheap filter between heuristics and a real
    LM perplexity pass.

    Exactness: per-token log-probs are quantized to integer micro-nats
    (floor(ln(p)*1e6) as bigint) BEFORE summation, so the per-doc
    aggregation is exact integer arithmetic — no double-sum order
    nondeterminism — and only the final mean performs float division.
    Engine-portable modulo a < 1e-10-probability ulp-at-grid-boundary on
    ln(); the oracle mirrors the formula verbatim.

    Scale: token frequencies are a groupBy(token) agg (map-side combined);
    the (doc, token) tf table joins the vocab on token — broadcastable
    while the vocab fits, an equi-shuffle join beyond; corpus totals ride
    a 1-row crossJoin, never a collect.
    """
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    # vocab derives from tf (occurrence count == sum of per-doc tf), so the
    # tokenize/explode/first-exchange subtree is byte-identical in both
    # branches and executes ONCE under ReuseExchange instead of once per
    # consumer.
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    totals = vocab.agg(
        F.sum("c").alias("N"), F.count(F.lit(1)).alias("V")
    )
    lp_micro = F.expr(
        "CAST(floor(ln(CAST(c + 1 AS DOUBLE) / CAST(N + V AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    scored = (
        tf.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .withColumn("lp_micro", lp_micro)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("lp_micro")).alias("sum_lp_micro"),
        )
        .withColumn(
            "avg_logprob",
            F.expr(
                "CAST(sum_lp_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1e6"
            ),
        )
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam_num: int = 7,
    lam_den: int = 10,
) -> DataFrame:
    """Interpolated-bigram LM quality scoring — one tier above
    :func:`unigram_logprob` and the last stop before real perplexity:
    each within-document transition scores
    ``ln(λ·P_bi(w|prev) + (1-λ)·P_uni(w))`` with Laplace smoothing on
    both terms and λ = lam_num/lam_den. Repetitive junk scores HIGH
    (predictable transitions), shuffled-word salad scores LOW even when
    its unigrams are common — exactly the failure mode unigram scoring
    can't see.

    Portability: the inner probability is composed as a fixed-order chain
    of IEEE double ops mirrored verbatim in the oracle SQL, then quantized
    to integer micro-nats BEFORE the per-doc sum — the aggregation is
    exact integer math, summation order free.

    Scale: bigram counts are a groupBy((prev,w)) agg; transitions join the
    bigram, unigram, and context tables on their keys (equi-shuffles,
    broadcastable while the vocab fits); corpus totals ride a 1-row
    crossJoin. Docs with < 2 tokens have no transitions and drop out.
    """
    # ONE tokenize/explode pass: each token row carries its predecessor
    # (NULL at position 0), so unigram, transition, bigram and context
    # counts ALL derive from the same (id, prev, tok) aggregate — the
    # shared exchange executes once (ReuseExchange) where the previous
    # shape re-tokenized the corpus once per consumer (4 parquet scans).
    # Position-0 rows keep unigram counts complete (every token appears
    # exactly once as `tok`) and are excluded from transitions by the
    # prev-NULL filter, which cannot misfire: split() never yields NULL
    # tokens.
    toks = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    pairs0 = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(__toks, (t, i) -> struct("
                "CASE WHEN i = 0 THEN CAST(NULL AS STRING) "
                "ELSE __toks[i - 1] END AS prev, t AS tok))"
            )
        ).alias("p"),
    ).select(id_col, F.col("p.prev").alias("prev"), F.col("p.tok").alias("tok"))
    tf0 = pairs0.groupBy(id_col, "prev", "tok").agg(F.count(F.lit(1)).alias("tf"))

    uni = tf0.groupBy("tok").agg(F.sum("tf").alias("cu"))
    totals = uni.agg(F.sum("cu").alias("N"), F.count(F.lit(1)).alias("V"))
    tf = tf0.filter(F.col("prev").isNotNull())
    bi = tf.groupBy("prev", "tok").agg(F.sum("tf").alias("cb"))
    ctx = bi.groupBy("prev").agg(F.sum("cb").alias("cp"))

    lam = f"(CAST({lam_num} AS DOUBLE) / CAST({lam_den} AS DOUBLE))"
    p_bi = "(CAST(cb + 1 AS DOUBLE) / CAST(cp + V AS DOUBLE))"
    p_uni = "(CAST(cu + 1 AS DOUBLE) / CAST(N + V AS DOUBLE))"
    lp_micro = F.expr(
        f"CAST(floor(ln({lam} * {p_bi} + (1.0 - {lam}) * {p_uni}) * 1000000) AS BIGINT)"
    )
    scored = (
        tf.join(bi, ["prev", "tok"])
        .join(ctx, "prev")
        .join(uni, "tok")
        .crossJoin(F.broadcast(totals))
        .withColumn("lp_micro", lp_micro)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_transitions"),
            F.sum(F.col("tf") * F.col("lp_micro")).alias("sum_lp_micro"),
        )
        .withColumn(
            "avg_logprob",
            F.expr("CAST(sum_lp_micro AS DOUBLE) / CAST(n_transitions AS DOUBLE) / 1e6"),
        )
    )


def dsir_logratio(
    df: DataFrame,
    target_filter: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Data Selection with Importance Resampling (DSIR, Xie et al. 2023,
    arXiv:2302.03169), unigram variant: score every document by its
    log importance ratio ln(p_target(doc) / p_raw(doc)) under two
    Laplace-smoothed unigram LMs — the target LM fit on the rows matching
    ``target_filter`` (the small high-quality slice being imitated), the
    raw LM fit on the whole corpus. High scores = looks like the target;
    feed ``log_ratio_micro`` to :func:`~pos_dlt_spark.operators.corpus.
    weighted_sample` (after exp/shift) or threshold it to select.

    Both LMs smooth with the FULL corpus vocabulary size V, so a token
    absent from the target slice still gets a finite ln((0+1)/(N_t+V))
    and the ratio stays defined — one left join, no OOV special case.

    Exactness: per-token log-probs quantize to integer micro-nats before
    the per-doc sum (the :func:`unigram_logprob` discipline) — exact
    integer aggregation, engine-portable; only ``avg_log_ratio`` divides.

    Scale: two token-frequency aggregates (map-side combined) + one
    tf-to-vocab equi-join — identical shape to :func:`unigram_logprob`;
    the target LM rides the same vocab table via a left join, so the
    marginal cost of the second LM is one more broadcastable dim.
    """
    toks = df.select(
        F.col(id_col), target_filter.alias("__t"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    # __t is doc-constant, so grouping on it is free; both vocab counts
    # then derive from the SAME (id, __t, tok) aggregate and the heavy
    # tokenize/explode/first-exchange subtree executes once
    # (ReuseExchange) instead of once per consumer.
    tf0 = toks.groupBy(id_col, "__t", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf0.select(id_col, "tok", "tf")
    vocab = tf0.groupBy("tok").agg(
        F.sum("tf").alias("c_all"),
        F.sum(F.when(F.col("__t"), F.col("tf")).otherwise(F.lit(0))).alias("c_t"),
    )
    totals = vocab.agg(
        F.sum("c_all").alias("N_all"),
        F.sum("c_t").alias("N_t"),
        F.count(F.lit(1)).alias("V"),
    )
    lp_t = F.expr(
        "CAST(floor(ln(CAST(c_t + 1 AS DOUBLE) / CAST(N_t + V AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    lp_all = F.expr(
        "CAST(floor(ln(CAST(c_all + 1 AS DOUBLE) / CAST(N_all + V AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    scored = (
        tf.join(vocab, "tok")
        .crossJoin(F.broadcast(totals))
        .withColumn("d_micro", lp_t - lp_all)
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("d_micro")).alias("log_ratio_micro"),
        )
        .withColumn(
            "avg_log_ratio",
            F.expr("CAST(log_ratio_micro AS DOUBLE) / CAST(n_tokens AS DOUBLE) / 1e6"),
        )
    )


def nb_classify(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 2000,
) -> DataFrame:
    """Multinomial Naive Bayes text classifier — the model-BASED router/
    quality filter of an LLM data pipeline (fastText-style source or
    language routing), complementing the heuristic :func:`langid` and
    the importance-weighting :func:`dsir_logratio`.

    Train: whitespace tokens of ``train``; vocabulary = top
    ``vocab_size`` tokens by document frequency (token-asc tiebreak,
    ranked via :func:`~pos_dlt_spark.operators.corpus.global_rank` — no
    single-partition window over the token table); per-(token, label)
    counts and label totals are exact INTEGER aggregates. Score: each
    vocab-token occurrence of a test doc contributes the Laplace-
    smoothed log-likelihood ``ln((cnt+1)/(tot_label+V))`` QUANTIZED to
    micro-nats (``floor(ln(...)*1e6)`` BIGINT — the :func:`dsir_logratio`
    determinism pattern: every term derives from fixed integers, so the
    per-(doc,label) SUM is order-independent bigint arithmetic, immune
    to float reassociation across partitions/engines); the class prior
    rides the same quantization. Prediction = argmax by
    ``(score_micro DESC, label ASC)`` — a total order, no float rank.

    Scale shape: vocabulary, per-class counts, totals and priors are
    bounded MODEL ARTIFACTS (≤ vocab_size × n_labels rows) broadcast to
    one scan of the test corpus; the only wide shuffles are the train
    token aggregate and the per-(doc,label) sum. Test docs containing
    ZERO vocabulary tokens have no likelihood evidence and are omitted
    (callers route them to the heuristic fallback).

    Assumes ONE label per training doc id (true of every corpus here):
    document frequency counts distinct (id, label) pairs per token, so a
    doc id repeated under two labels would inflate df for its tokens and
    shift the vocabulary ranking — dedupe train on ``id_col`` first if
    duplicate ids are possible.

    Returns ``(id_col, pred_<label_col>, score_micro, n_vocab_tok)``.
    """
    from pos_dlt_spark.operators.corpus import global_rank

    tok = F.explode(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    ).alias("tok")
    tr = train.select(F.col(id_col), F.col(label_col).alias("__lbl"), tok).filter(
        F.col("tok") != ""
    )
    # ONE pinned tokenize pass over the training half: document frequency
    # and per-(token, label) counts both derive from the (id, label, tok)
    # aggregate — a doc has one label, so its row count per token IS the
    # distinct-doc count. Without the pin, vocabulary ranking (an eager
    # two-phase global_rank), the vocab-size count and the final plan each
    # re-tokenized the corpus from the parquet scan.
    trf = tr.groupBy(id_col, "__lbl", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = trf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        global_rank(dfreq, [F.col("df").desc(), F.col("tok").asc()], rank_col="__r")
        .filter(F.col("__r") <= vocab_size)
        .select("tok")
    )
    counts = (
        trf.join(F.broadcast(vocab), "tok")
        .groupBy("tok", "__lbl")
        .agg(F.sum("tf").alias("cnt"))
    )
    totals = counts.groupBy("__lbl").agg(F.sum("cnt").alias("tot"))
    priors = train.groupBy(F.col(label_col).alias("__lbl")).agg(
        F.count(F.lit(1)).alias("nd")
    )
    n_train = train.count()  # 1-row aggregate, bounded
    v_actual = vocab.count()  # model-artifact cardinality (<= vocab_size)

    # test tokens pre-aggregated to (doc, tok, tf): the class grid and the
    # ln() term then run per DISTINCT (doc, token) instead of per token
    # occurrence — the per-occurrence sum is recovered exactly as tf*term
    # (the term depends only on (tok, class)).
    te = (
        test.select(F.col(id_col), tok)
        .filter(F.col("tok") != "")
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(F.broadcast(vocab), "tok")
    )
    # every (vocab-token x class) contributes one quantized term; absent
    # (token, class) counts smooth to cnt=0
    classes = priors.select("__lbl", "nd", F.lit(n_train).alias("n_all"))
    grid = te.crossJoin(F.broadcast(classes)).join(
        F.broadcast(counts), ["tok", "__lbl"], "left"
    )
    term = F.expr(
        f"CAST(floor(ln(CAST(coalesce(cnt, 0) + 1 AS DOUBLE) / "
        f"CAST(tot + {int(v_actual)} AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    prior_micro = F.expr(
        "CAST(floor(ln(CAST(nd AS DOUBLE) / CAST(n_all AS DOUBLE)) * 1000000) AS BIGINT)"
    )
    scored = (
        grid.join(F.broadcast(totals), "__lbl")
        .withColumn("__term", term)
        .groupBy(id_col, "__lbl", "nd", "n_all")
        .agg(
            F.sum(F.col("tf") * F.col("__term")).alias("__ll"),
            F.sum("tf").alias("n_vocab_tok"),
        )
        .withColumn("score_micro", F.col("__ll") + prior_micro)
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("score_micro").desc(), F.col("__lbl").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("__lbl").alias(f"pred_{label_col}"),
            "score_micro",
            "n_vocab_tok",
        )
    )
