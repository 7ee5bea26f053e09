"""Benchmark decontamination: flag corpus documents that share word
n-grams with an evaluation/benchmark set.

The standard training-data hygiene step (GPT-3 App. C / PaLM-style
13-gram overlap): an eval example "contaminates" a training document
if any length-n word window appears in both. This module is part of
the training-pipeline superset (SURVEY.md §2.12) — the whylogs
reference has no analogue.

Scale shape (100 TB corpus, small benchmark):

1. Benchmark side: explode to distinct n-grams — output is small
   (|benchmark| × tokens) and is broadcast.
2. Corpus side: n-grams are built per-row with array HOFs (codegen)
   and exploded; the join against the benchmark grams is a broadcast
   hash join, so NO corpus-wide shuffle happens to find matches.
3. Only matching (doc_id, gram) rows — a tiny fraction — flow into
   the final groupBy(doc_id) shuffle.

So the expensive side of the plan is a single scan + map + broadcast
probe; the shuffle carries matches only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WS = r"\s+"


def _tokens(c: Column) -> Column:
    t = F.lower(F.trim(c))
    return F.when(F.length(t) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(t, _WS))


def word_ngrams(c: Column, n: int) -> Column:
    """Distinct word n-grams of lowercased text as space-joined
    strings; [] when the document has fewer than ``n`` tokens."""
    toks = _tokens(c)
    return F.array_distinct(
        F.when(F.size(toks) < n, F.array().cast("array<string>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                lambda i: F.array_join(F.slice(toks, i, n), " "),
            )
        )
    )


def benchmark_ngrams(
    benchmark: DataFrame, n: int = 8, text_col: str = "text"
) -> DataFrame:
    """Distinct n-grams over the whole benchmark set — the broadcast
    side. One column ``gram``."""
    return (
        benchmark.select(
            F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Annotate ``corpus`` with ``contaminated_ngrams`` (count of
    distinct n-grams shared with ``benchmark``) and ``is_contaminated``.

    The benchmark gram set is broadcast; the corpus is scanned once.
    Documents with zero overlap keep ``contaminated_ngrams = 0`` via
    the left join + coalesce.
    """
    grams = F.broadcast(benchmark_ngrams(benchmark, n, text_col))
    corpus_grams = corpus.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"),
    )
    hits = (
        corpus_grams.join(grams, "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("contaminated_ngrams"))
    )
    return (
        corpus.join(hits, id_col, "left")
        .withColumn(
            "contaminated_ngrams",
            F.coalesce(F.col("contaminated_ngrams"), F.lit(0)))
        .withColumn("is_contaminated", F.col("contaminated_ngrams") > 0)
    )
