"""Deduplication operators (exact + near-dup) for training-data pipelines.

Design for 100 TB: every variant is shuffle-minimal —
- exact: one hash-partition on the content hash (no sort of full text);
- MinHash/LSH: signatures via explode+groupBy (one shuffle), candidate
  generation via band-bucket equi-join (hash join on small keys), never an
  O(n²) cross join;
- SimHash: per-doc bit arithmetic, candidates via rotated-prefix buckets.

All signature math is built-in expressions (xxhash64 family) — JVM-side,
no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import normalize_text


def exact_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact dedup: keep the lowest-id document per identical (normalized)
    content. Shuffles on the 64-bit content hash, not the text itself."""
    content = normalize_text(F.col(text_col)) if normalize else F.col(text_col)
    h = F.xxhash64(content)
    w = Window.partitionBy(h).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


_MAX_TOKENS = 1 << 20


def shingles(col: Column, n: int = 3) -> Column:
    """Word n-gram shingle set of a normalized text column (distinct).

    Built as a chain of ``zip_with(toks, slice(toks, k+1, …), concat)`` —
    lambda arguments are array *elements*, so the token array is computed
    once per row. (The obvious ``transform(sequence, i -> slice(toks,
    i+1, n))`` re-evaluates the whole split-normalize expression per
    element — ~10× slower.) Shorter-than-n docs yield one partial gram,
    matching the index-based semantics.
    """
    toks = F.split(normalize_text(col), " ")
    g = toks
    for k in range(1, n):
        g = F.zip_with(
            g, F.slice(toks, k + 1, _MAX_TOKENS), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    full = F.filter(g, lambda x: x.isNotNull())
    partial = F.array(F.array_join(toks, " "))
    return F.array_distinct(F.when(F.size(toks) < n, partial).otherwise(full))


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    xxhash64(shingle, seed_i).

    Strategy: ONE codegen'd xxhash64 of the shingle *string*, then
    ``num_hashes`` independent permutations ``xxhash64(h, i)`` — each a
    fixed-width (long, int) hash, JVM codegen'd, reduced by min in a
    single hash aggregate. Re-hashing the 8-byte value is ~as cheap as
    the linear ``a*h + b`` permutation it replaces but cannot overflow,
    so it is safe under ``spark.sql.ansi.enabled=true`` (Spark 4
    default) where signed-64 wraparound raises ARITHMETIC_OVERFLOW.
    Partial (map-side) aggregation collapses each partition to one
    num_hashes-long row per doc before the shuffle, so shuffle volume is
    O(#docs), not O(#shingles).
    """
    sh = df.select(
        F.col(id_col), F.explode(shingles(F.col(text_col), shingle_n)).alias("__sh")
    ).select(F.col(id_col), F.xxhash64("__sh").alias("__h"))
    aggs = [
        F.min(F.xxhash64(F.col("__h"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    sigs = sh.groupBy(id_col).agg(*aggs)
    return sigs.select(
        F.col(id_col),
        F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    max_bucket_size: int | None = 1000,
) -> DataFrame:
    """Candidate near-duplicate pairs via banded LSH: split the signature
    into ``bands`` bands of ``num_hashes//bands`` rows, hash each band,
    self-join on (band_idx, band_hash). Output: (id_a, id_b) with a < b,
    plus the estimated Jaccard from full-signature agreement.

    ``max_bucket_size`` is the hot-bucket safety valve for real corpora:
    a degenerate band bucket holding m documents (boilerplate, empty
    docs, templated text) contributes m²/2 candidate pairs, so one hot
    bucket can turn the equi-join quadratic at 100 TB. Buckets larger
    than the cap are dropped *before* the self-join (the count runs over
    the same (band_idx, band_hash) partitioning the join shuffles on, so
    AQE reuses the exchange). Near-dup semantics degrade gracefully —
    docs in a dropped bucket still pair through their other bands.
    ``None`` disables the cap."""
    rows = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    band_entries = sigs.select(
        F.col(id_col),
        F.col("sig"),
        F.posexplode(
            F.array(
                *[
                    # variadic fixed-width hash of the band's signature
                    # slice — no string materialization per band
                    F.xxhash64(*[F.col("sig")[b * rows + r] for r in range(rows)])
                    for b in range(bands)
                ]
            )
        ).alias("band_idx", "band_hash"),
    )
    if max_bucket_size is not None:
        bw = Window.partitionBy("band_idx", "band_hash")
        band_entries = (
            band_entries.withColumn("__bsz", F.count(F.lit(1)).over(bw))
            .filter(F.col("__bsz") <= max_bucket_size)
            .drop("__bsz")
        )
    a = band_entries.alias("a")
    b = band_entries.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    est = (
        F.size(
            F.filter(
                F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                lambda v: v,
            )
        )
        / F.lit(float(num_hashes))
    )
    return pairs.select("id_a", "id_b", F.round(est, 6).alias("est_jaccard"))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.0,
    max_shingle_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard for candidate pairs, computed distributively:
    explode shingles, self-join on shingle (co-occurrence count = |A∩B|),
    join per-doc sizes for |A∪B|. No cross join — the shuffle key is the
    shingle, so common shingles dominate cost.

    ``max_shingle_df`` caps that cost: a stopword shingle appearing in d
    documents yields d²/2 co-occurrence rows, so one hot 3-gram ("of the
    and"-class boilerplate) is quadratic at corpus scale. Shingles whose
    document frequency exceeds the cap are excluded from BOTH the
    intersection join and the per-doc set sizes, i.e. the result is the
    exact Jaccard over the reduced shingle universe (the standard
    df-filtered similarity; hot shingles carry no similarity signal
    anyway). ``None`` disables the cap."""
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), shingle_n)).alias("sh"),
    )
    if max_shingle_df is not None:
        dfw = Window.partitionBy("sh")
        sh = (
            sh.withColumn("__df", F.count(F.lit(1)).over(dfw))
            .filter(F.col("__df") <= max_shingle_df)
            .drop("__df")
        )
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), (F.col("a.sh") == F.col("b.sh")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 6
            ),
        )
        .select("id_a", "id_b", "jaccard")
    )
    if threshold > 0:
        out = out.filter(F.col("jaccard") >= threshold)
    return out


def dup_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over near-duplicate pairs: the step after
    pair generation in a real dedup pipeline — transitively group pairs
    into clusters and tag every document with its cluster's minimum id
    (the canonical representative; ``doc_id == cluster_id`` rows are the
    keepers).

    Min-label propagation: every node starts labeled with its own id and
    repeatedly takes the min of its label and its neighbors' labels —
    converges in O(component diameter) joins, which for near-dup graphs
    (tiny, dense components) is a handful of iterations. Each iteration
    is one shuffle on the edge key; ``localCheckpoint`` truncates the
    growing lineage. At web scale the same loop applies (GraphFrames'
    alternating large/small-star halves the iteration count but the
    per-iteration plan is identical).
    """
    e_fwd = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e_rev = pairs.select(F.col("id_b").alias("a"), F.col("id_a").alias("b"))
    edges = e_fwd.union(e_rev)
    labels = df.select(F.col(id_col).alias("id"), F.col(id_col).alias("label"))
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.b == labels.id)
            .groupBy("a")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr, labels.id == nbr.a, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.withColumnRenamed("label", "new_label")
            .join(labels, "id")
            .filter(F.col("new_label") != F.col("label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(
        F.col("id").alias(id_col), F.col("label").alias("cluster_id")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document: for each token hash, each bit
    contributes +1/-1; the sign of the per-bit sum forms the fingerprint.

    Pure Spark: explode tokens → for each bit position, sum the signed
    contribution ((hash >> bit) & 1 → ±1) — one groupBy(id) with ``bits``
    conditional sums, then assemble the integer. One shuffle."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(
                F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1
            ).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(bits)
    ]
    sums = toks.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(bits):
        bit = F.when(
            F.col(f"b{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))
        fp = bit if fp is None else fp.bitwiseOR(bit)
    return sums.select(F.col(id_col), fp.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    blocks: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: pigeonhole the 64 bits into ``blocks``
    segments — any pair within ``max_hamming`` (< blocks) shares at least
    one identical segment → equi-join per segment, then exact Hamming
    filter via bit_count(xor)."""
    fps = simhash(df, text_col, id_col)
    seg_bits = 64 // blocks
    segs = fps.select(
        F.col(id_col),
        F.col("simhash"),
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), i * seg_bits)
                    .bitwiseAND(F.lit((1 << seg_bits) - 1).cast("long"))
                    for i in range(blocks)
                ]
            )
        ).alias("seg_idx", "seg"),
    )
    pairs = (
        segs.alias("a")
        .join(
            segs.alias("b"),
            (F.col("a.seg_idx") == F.col("b.seg_idx"))
            & (F.col("a.seg") == F.col("b.seg"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("fp_a"),
            F.col("b.simhash").alias("fp_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
