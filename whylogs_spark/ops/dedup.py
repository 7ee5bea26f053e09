"""Deduplication operators for large-scale corpora.

All variants are expressed as declarative DataFrame plans:

* ``exact_dedup`` — hash-groupBy on a normalized fingerprint. One shuffle
  on the fingerprint; survives any scale (the shuffle key is the dedup
  key, skew only if the corpus is mostly one document).
* ``minhash_signatures`` / ``minhash_lsh_pairs`` / ``minhash_dedup`` —
  MinHash + LSH banding (Broder 1997; Leskovec et al., "Mining of Massive
  Datasets" ch.3). Signatures are computed WITHOUT exploding shingles:
  ``array_min(transform(shingles, xxhash64(concat(s, seed))))`` keeps the
  whole signature computation inside whole-stage codegen. Only band keys
  (docs × bands rows, each a few bytes) are shuffled — never shingle sets.
* ``simhash_signatures`` — 64-bit SimHash (Charikar 2002) via bit-vote
  aggregation over token hashes, again with higher-order functions.
* ``ngram_jaccard_pairs`` — exact n-gram Jaccard verification for a
  candidate pair set (used as the verify stage after LSH).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from whylogs_spark.core.util import ensure_parallelism


def normalized_text(c: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


# ------------------------------------------------------------------ exact
def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id document per distinct normalized text.

    Window + row_number over the fingerprint: one shuffle, fully
    distributed, deterministic winner.
    """
    fp = F.xxhash64(normalized_text(F.col(text_col)))
    w = Window.partitionBy(fp).orderBy(F.col(id_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def duplicate_stats(
    df: DataFrame, text_col: str = "text", group_by: Optional[List[str]] = None
) -> DataFrame:
    """Per-group duplicate statistics (n_docs, n_unique, n_dup_docs)."""
    fp = F.xxhash64(normalized_text(F.col(text_col))).alias("__fp")
    keys = group_by or []
    base = df.select(*keys, fp)
    agg = base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("__fp").alias("n_unique"),
    )
    return agg.withColumn("n_dup_docs", F.col("n_docs") - F.col("n_unique"))


# ---------------------------------------------------------------- shingles
def word_shingles(c: Column, n: int = 3) -> Column:
    """Distinct word n-grams of the normalized text (empty-safe)."""
    toks = F.split(normalized_text(c), " ")
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(
        F.array_distinct(F.array(F.concat_ws(" ", toks))))


def char_shingles(c: Column, n: int = 5) -> Column:
    t = normalized_text(c)
    k = F.length(t) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
        lambda i: F.substring(t, i, n),
    )
    return F.array_distinct(grams)


# ----------------------------------------------------------------- minhash
def hashed_word_shingles(
    c: Column, n: int = 3
) -> Column:
    """Distinct word-n-gram hashes (array<long>) of the normalized text.

    Tokens are hashed ONCE (xxhash64 on strings), n-grams combine the n
    token hashes with another xxhash64 over longs — so the expensive
    string hashing is O(#tokens), not O(#shingles × signature width).
    """
    toks = F.split(normalized_text(c), " ")
    th = F.transform(toks, lambda t: F.xxhash64(t))
    k = F.size(toks) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(0))),
        lambda i: F.xxhash64(*[F.get(th, i + j) for j in range(n)]),
    )
    short = F.array(F.xxhash64(F.concat_ws(" ", toks)))
    return F.when(k >= 1, F.array_distinct(grams)).otherwise(short)


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, minhash_sig: array<long>[num_hashes]).

    Shape: explode shingle hashes -> hash-aggregate ``min(xxhash64(h, i))``
    per id. Everything stays in whole-stage codegen; map-side partial
    aggregation reduces each partition to one 8*num_hashes-byte row per
    doc before the (tiny) shuffle. This beats evaluating num_hashes
    ``array_min(transform(...))`` passes per row ~3x and its shuffle
    volume is docs x signature bytes, never shingles.
    """
    ex = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(
            hashed_word_shingles(F.col(text_col), shingle_words)
        ).alias("__h"),
    )
    agg = ex.groupBy(id_col).agg(
        *[
            F.min(F.xxhash64("__h", F.lit(i))).alias(f"__m{i}")
            for i in range(num_hashes)
        ]
    )
    return agg.select(
        F.col(id_col),
        F.array(*[f"__m{i}" for i in range(num_hashes)]).alias(
            "minhash_sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding + exact verify.

    rows/bands r=num_hashes/bands -> s-curve threshold ~ (1/b)^(1/r).
    Shuffle volume: docs x bands band-key rows, then the (small) candidate
    pair set joins back to shingle sets for exact Jaccard — the join is on
    ids, broadcast-able when candidates are few.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold.
    """
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_words)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[
                        F.col("minhash_sig")[b * rows_per_band + r]
                        for r in range(rows_per_band)
                    ]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.explode(band_structs).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")

    # One shuffle: group bucket members, expand in-bucket pairs with
    # higher-order funcs. Buckets larger than `max_bucket` are dropped
    # (their members are near-certain dups of each other AND of smaller
    # buckets' members via other bands; at 100 TB an O(bucket²) expansion
    # of a degenerate bucket would dominate the job).
    max_bucket = 2048
    ids = F.array_sort(F.collect_list("__id"))
    grouped = (
        banded.groupBy("band", "bucket")
        .agg(ids.alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    pair_arr = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    pairs = (
        grouped.select(F.explode(pair_arr).alias("p"))
        .select("p.id_a", "p.id_b")
        .distinct()
    )

    shingled = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        hashed_word_shingles(F.col(text_col), shingle_words).alias("__sh"),
    )
    verified = (
        pairs.join(
            shingled.withColumnRenamed("__id", "id_a")
            .withColumnRenamed("__sh", "sh_a"),
            "id_a",
        )
        .join(
            shingled.withColumnRenamed("__id", "id_b")
            .withColumnRenamed("__sh", "sh_b"),
            "id_b",
        )
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Drop near-duplicates: for every verified pair, the higher id loses.

    (Single-link clusters collapse to their minimum id over one iteration;
    chains longer than one hop are rare at high thresholds — iterate
    externally if full transitive closure is needed.)
    """
    pairs = minhash_lsh_pairs(
        df, text_col, id_col, num_hashes, bands, shingle_words,
        jaccard_threshold)
    losers = pairs.select(F.col("id_b").alias(id_col)).distinct()
    return df.join(losers, id_col, "left_anti")


# ---------------------------------------------------------- n-gram jaccard
def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    char: bool = False,
    threshold: float = 0.0,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for ALL candidate pairs sharing at
    least one n-gram (inverted-index join — never a full cross product).

    Explodes distinct n-grams, self-joins on the gram (the inverted
    index), counts shared grams per pair, then |A∪B| = |A|+|B|-|A∩B|.
    Shuffle volume is O(total n-grams); degenerate grams shared by huge
    numbers of docs would square — acceptable for verify-stage corpora;
    for whole-corpus use prefer the MinHash path which bounds work.
    """
    gram_fn = char_shingles if char else word_shingles
    grams = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        gram_fn(F.col(text_col), n).alias("__g"),
    ).withColumn("__sz", F.size("__g"))
    exploded = grams.select(
        "__id", "__sz", F.explode("__g").alias("gram"))
    joined = (
        exploded.alias("x")
        .join(
            exploded.alias("y"),
            (F.col("x.gram") == F.col("y.gram"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .groupBy(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            F.col("x.__sz").alias("sz_a"),
            F.col("y.__sz").alias("sz_b"),
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    return (
        joined.withColumn(
            "jaccard",
            F.col("inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# ------------------------------------------------- embedding-cosine near-dup
def embedding_neardup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine similarity >= threshold (exact, O(n²) join).

    The baseline verifier; at scale, feed LSH-bucketed candidates instead
    (similarity.with_lsh_buckets) and verify only within buckets.
    """
    norm = F.sqrt(F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda a, x: a + x.cast("double") * x.cast("double")))
    vecs = ensure_parallelism(df).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm.alias("__n"),
    )
    pairs = (
        vecs.alias("x")
        .join(vecs.alias("y"), F.col("x.__id") < F.col("y.__id"))
        .withColumn(
            "cosine",
            F.aggregate(
                F.zip_with(
                    F.col("x.__v"), F.col("y.__v"),
                    lambda a, b: a.cast("double") * b.cast("double")),
                F.lit(0.0), lambda a, x: a + x)
            / (F.col("x.__n") * F.col("y.__n")),
        )
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("x.__id").alias("id_a"),
            F.col("y.__id").alias("id_b"),
            "cosine",
        )
    )
    return pairs


# ----------------------------------------------------------------- simhash
def simhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 64,
) -> DataFrame:
    """(id, simhash: long) — 64-bit SimHash over whitespace tokens.

    For each bit position b: vote = sum over tokens of
    (+1 if bit b of xxhash64(token) else -1); bit set if vote > 0.
    Same explode + hash-aggregate shape as ``minhash_signatures``: one
    codegen'd aggregation with map-side combine, shuffle = docs x 8 bytes.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    ex = ensure_parallelism(df).select(
        F.col(id_col),
        F.explode(F.transform(toks, lambda t: F.xxhash64(t))).alias("__h"),
    )
    votes = ex.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("__h"), b).bitwiseAND(F.lit(1)) == 1,
                    1,
                ).otherwise(-1)
            ).alias(f"__v{b}")
            for b in range(bits)
        ]
    )
    sig = None
    for b in range(bits):
        # two's complement: setting bit 63 of a signed long == adding -2^63
        bit_val = -(2 ** 63) if b == 63 else 2 ** b
        bc = F.when(
            F.col(f"__v{b}") > 0, F.lit(bit_val).cast("long")
        ).otherwise(F.lit(0).cast("long"))
        sig = bc if sig is None else sig + bc
    return votes.select(F.col(id_col), sig.alias("simhash"))


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures stored as longs."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
