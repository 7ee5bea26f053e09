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
def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 64,
    shingle_words: int = 3,
) -> DataFrame:
    """(id, sig: array<long>[num_hashes]) — all JVM-side, no shuffle."""
    sh = word_shingles(F.col(text_col), shingle_words)

    def seeded(i: int):
        # factory closure: keeps the lambda unary (a 2-arg lambda would be
        # interpreted by Spark as the (element, index) form)
        return lambda s: F.xxhash64(s, F.lit(i))

    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__sh"), seeded(i)))
            for i in range(num_hashes)
        ]
    )
    return (
        df.withColumn("__sh", sh)
        .filter(F.size("__sh") > 0)
        .withColumn("minhash_sig", sig)
        .drop("__sh")
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
                    F.concat_ws(
                        ",",
                        *[
                            F.col("minhash_sig")[b * rows_per_band + r]
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    banded = sigs.select(
        F.col(id_col).alias("__id"),
        F.explode(band_structs).alias("bb"),
    ).select("__id", "bb.band", "bb.bucket")

    pairs = (
        banded.alias("x")
        .join(
            banded.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.__id") < F.col("y.__id")),
        )
        .select(
            F.col("x.__id").alias("id_a"), F.col("y.__id").alias("id_b")
        )
        .distinct()
    )

    shingled = df.select(
        F.col(id_col).alias("__id"),
        word_shingles(F.col(text_col), shingle_words).alias("__sh"),
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


# ----------------------------------------------------------------- simhash
def simhash_signatures(
    df: DataFrame, text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens, fully in Spark SQL exprs.

    For each bit position b: vote = sum over tokens of
    (+1 if bit b of xxhash64(token) else -1); bit set if vote > 0.
    """
    toks = F.split(normalized_text(F.col(text_col)), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_vote(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)

    bit_cols = []
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0), bit_vote(b))
        # two's complement: setting bit 63 of a signed long == adding -2^63
        bit_val = -(2 ** 63) if b == 63 else 2 ** b
        bit_cols.append(
            F.when(vote > 0, F.lit(bit_val).cast("long"))
            .otherwise(F.lit(0).cast("long")))
    sig = bit_cols[0]
    for bc in bit_cols[1:]:
        sig = sig + bc
    return df.withColumn("simhash", sig)


def simhash_hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures stored as longs."""
    x = a.bitwiseXOR(b)
    return F.bit_count(x)
