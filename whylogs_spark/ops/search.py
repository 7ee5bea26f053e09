"""Full-text keyword search: BM25 ranking over a document corpus.

The reference ships log/condition-style text matching only; large-scale
training-data curation also needs corpus *retrieval* — "find the docs
about X" for audits, targeted decontamination, and eval-set mining.
This module provides Okapi BM25 (Robertson & Sparck Jones; the public
formulation used by Lucene/Elasticsearch) expressed Spark-first:

  * document length is a pure codegen projection (``regexp_extract_all``
    + ``size``) — ZERO shuffle, evaluated in-scan;
  * term frequencies are computed ONLY for the query's terms: the
    ``isin(query_terms)`` filter sits *under* the explode's aggregation,
    so the shuffle carries at most |query| rows per document;
  * per-term document frequencies aggregate the tf frame — bounded by
    |query| distinct terms — and broadcast-join back;
  * corpus constants (N, avgdl) are a 1-row aggregate cross-joined in
    (Catalyst plans it as a broadcast nested loop of one row);
  * the final top-k is ``orderBy().limit()`` → TakeOrderedAndProject,
    never a global sort.

At 100 TB nothing here materializes more than |query| x |docs-matching|
rows past the scan, and every reduction is partial-aggregated map-side.

Scores round to 6 decimals and ties break on (score desc, doc_id asc)
so rankings are reproducible across engines (the correctness oracle
recomputes BM25 in pure SQL).
"""

from __future__ import annotations

import re
from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# lowercase alnum runs; {min_len,} folded into the pattern so doc length
# counts exactly the index-eligible tokens (same tokens in the oracle)
_TOKEN_RE = "[a-z0-9]+"


def _tokenize(text: str, min_term_len: int) -> List[str]:
    return [t for t in re.findall(_TOKEN_RE, text.lower())
            if len(t) >= min_term_len]


def bm25_search(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    min_term_len: int = 2,
) -> DataFrame:
    """Top-k documents for ``query`` under Okapi BM25.

    score(d) = sum over distinct query terms t of
      idf(t) * tf / (tf + k1 * (1 - b + b * dl/avgdl))
    idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))

    Returns (id_col, score) — top-k rows, ties broken on the
    6-decimal-rounded score then ascending id so the result SET is
    deterministic across engines. Plans as TakeOrderedAndProject
    (no global sort, no unbounded window).

    Reference parity: whylogs has no retrieval operator — this extends
    the corpus-analysis surface the way ``tf_idf_top_terms`` does
    (keyword extraction), using the same tokenizer so the two compose.
    """
    q_terms = sorted(set(_tokenize(query, min_term_len)))
    if not q_terms:
        raise ValueError("query contains no indexable terms")

    pat = _TOKEN_RE[:-1] + ("{%d,}" % min_term_len)
    base = df.select(
        F.col(id_col),
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(pat), F.lit(0)).alias("__toks"),
    ).select(id_col, F.size("__toks").alias("dl"), F.col("__toks"))

    # corpus constants: one 1-row aggregate, broadcast via cross join
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg(F.col("dl").cast("double")).alias("avgdl"))

    # tf for QUERY terms only — the isin filter runs before the groupBy,
    # so the explode's shuffle carries <= |query| rows per document
    tf = (
        base.select(id_col, "dl", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(q_terms))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # document frequency per query term: bounded frame (<= |query| rows)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    norm = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") / norm

    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(consts))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    return (
        scored.orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def keyword_match_stats(
    df: DataFrame,
    terms: List[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    min_term_len: int = 2,
) -> DataFrame:
    """Per-term corpus hit statistics (docs containing, total occurrences)
    — the cheap audit companion to :func:`bm25_search`. One scan, one
    bounded aggregation (<= |terms| output rows); the isin filter runs
    under the explode so the shuffle carries only matching terms."""
    t_norm = sorted({t for t in (s.lower() for s in terms)
                     if re.fullmatch(_TOKEN_RE, t)
                     and len(t) >= min_term_len})
    if not t_norm:
        raise ValueError("no valid terms")
    pat = _TOKEN_RE[:-1] + ("{%d,}" % min_term_len)
    toks = df.select(
        F.col(id_col),
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(pat), F.lit(0))
        ).alias("term"),
    )
    return (
        toks.filter(F.col("term").isin(t_norm))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("occurrences"),
            F.countDistinct(id_col).alias("n_docs"),
        )
        .orderBy("term")
    )


def rrf_fuse(
    df: DataFrame,
    id_cols,
    score_cols,
    k0: int = 60,
    per_list_limit: int = 1000,
    top_k: int = 100,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009):
    combine several rankers' scores for the same candidates into one
    consensus ranking, ``rrf(d) = sum over lists 1/(k0 + rank_l(d))``
    — the standard way to merge BM25 with an embedding retriever (or
    any heterogeneous scorers) without calibrating their scales.

    One row per fused candidate, best first: ``(<id_cols...>,
    rank_<score_col>... , lists_hit, rrf_score)``.  A ``rank_*`` cell
    is null when the candidate missed that list's top
    ``per_list_limit``; such lists simply contribute nothing to the
    sum (the usual top-k RRF convention).  ``k0 = 60`` is the
    published default.

    Scale shape: each ranker contributes ONLY its top
    ``per_list_limit`` rows via ``orderBy().limit()`` —
    TakeOrderedAndProject, never a global sort of the data — the
    re-rank windows partition on the list id over those bounded
    heads, and the fuse is one groupBy over <= n_lists x
    per_list_limit rows finished by another TakeOrderedAndProject.
    Every ordering breaks ties on the id columns, so ranks (and the
    top-k cut) are deterministic and replay identically in any
    engine.  With exactly two lists the fused sum is two IEEE adds —
    commutative, hence bit-deterministic too.
    """
    ids = list(id_cols)
    scs = list(score_cols)
    if not ids:
        raise ValueError("id_cols must be non-empty")
    if len(scs) < 2:
        raise ValueError(f"need >= 2 score_cols to fuse, got {scs}")
    if k0 < 1:
        raise ValueError(f"k0 must be >= 1: {k0}")
    if per_list_limit < 1 or top_k < 1:
        raise ValueError("per_list_limit and top_k must be >= 1")
    missing = [c for c in ids + scs if c not in df.columns]
    if missing:
        raise ValueError(f"columns not in df: {missing}")

    heads = []
    for i, sc in enumerate(scs):
        s = F.col(sc).cast("double")
        heads.append(
            df.filter(s.isNotNull() & ~F.isnan(s))
            .orderBy(s.desc(), *[F.col(c).asc() for c in ids])
            .limit(per_list_limit)
            .select(*ids, F.lit(i).alias("__list"), s.alias("__s")))
    u = heads[0]
    for h in heads[1:]:
        u = u.unionByName(h)

    from pyspark.sql import Window

    # partitioned by the list id — bounded per-partition input
    # (<= per_list_limit rows), never a partition-less window
    wr = Window.partitionBy("__list").orderBy(
        F.col("__s").desc(), *[F.col(c).asc() for c in ids])
    ranked = u.select(
        *ids, "__list",
        F.row_number().over(wr).cast("long").alias("__r"))
    fused = ranked.groupBy(*ids).agg(
        *[F.max(F.when(F.col("__list") == i, F.col("__r")))
          .alias(f"rank_{sc}") for i, sc in enumerate(scs)],
        F.count(F.lit(1)).alias("lists_hit"),
        F.sum(F.lit(1.0)
              / (F.lit(float(k0)) + F.col("__r").cast("double")))
        .alias("rrf_score"))
    return fused.orderBy(
        F.col("rrf_score").desc(),
        *[F.col(c).asc() for c in ids]).limit(top_k)
