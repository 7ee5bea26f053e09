"""Document classification & importance resampling for training-data
curation — the model-based data-selection layer of the pipeline.

Two operator families, both built on the same hashed bag-of-words
feature space (feature hashing a.k.a. the "hashing trick": token ->
bucket in [0, n_buckets) via md5, so the model is a FIXED-size table no
matter the corpus vocabulary):

* ``train_quality_classifier`` / ``score_quality_classifier`` — a
  multinomial Naive-Bayes text classifier over hashed token buckets:
  the distributed, oracle-checkable stand-in for the fastText linear
  classifier used as the "quality filter" in GPT-3 / CCNet-style
  pipelines (score web documents by similarity to a trusted corpus,
  then keep/downsample by score). NB log-likelihood ratios ARE a linear
  model over bag-of-words counts, so scoring has the exact shape of the
  fastText filter: one dot product of token counts with a broadcast
  weight table.

* ``dsir_logweights`` / ``dsir_sample`` — Data Selection via Importance
  Resampling (Xie et al., 2023): per-document log importance weight
  ``sum_tokens ln(p_target(bucket) / p_raw(bucket))`` between a target
  (trusted) corpus and the raw corpus, then Gumbel top-k resampling
  without replacement proportional to the (temperature-scaled) weights.
  The Gumbel keys are derived from md5 of the document key — fully
  deterministic and reproducible cross-engine (same idiom as
  ops/sampling.py).

The reference engine has no classification surface — these belong to
this engine's training-pipeline superset (SURVEY.md §2.12), alongside
ops/quality.py (heuristic filters) and ops/sampling.py (deterministic
splits). Gate queries: ``quality_classifier_documents``,
``dsir_weights_documents`` in ``__spark_entry__.py``, each with a full
DuckDB SQL oracle recomputing the md5 bucketing verbatim.

Scale shape (the 100 TB story):
  * Training / density estimation: ONE explode + groupBy(bucket)
    shuffle; map-side partial aggregation collapses every partition to
    <= n_buckets rows before the exchange, so shuffle volume is
    O(partitions x n_buckets), independent of corpus size. Totals and
    document priors are 1-row aggregates cross-joined back in
    (broadcast), so the whole train plan is ACTION-FREE — it composes
    into downstream plans without materialization.
  * The model is <= n_buckets rows (2^18 default ~ a few MB) — always
    broadcastable. Scoring is explode -> broadcast hash join ->
    groupBy(doc_id): one shuffle on doc_id, no skew (doc_id is unique),
    token rows carry only (doc_id, 8-byte bucket).
  * ``dsir_sample`` top-k plans as TakeOrderedAndProject (per-partition
    bounded heaps) — never a global sort.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .quality import _tokens

_U32 = float(1 << 32)


def _bucket(tok: Column, n_buckets: int) -> Column:
    """Hash a token to a bucket in [0, n_buckets): first 8 hex chars of
    md5, as an integer, mod n_buckets. Reproducible in any engine with
    md5 (DuckDB oracle: ``('0x' || substr(md5(t), 1, 8))::BIGINT % K``).
    """
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
            .cast("long") % F.lit(n_buckets))


def _doc_buckets(df: DataFrame, text_col: str, id_cols: Sequence[str],
                 n_buckets: int) -> DataFrame:
    """(id_cols..., bucket) — one row per token; empty/blank docs keep
    one row with bucket NULL (so downstream aggregates keep the doc)."""
    return df.select(
        *id_cols,
        F.explode_outer(_tokens(F.col(text_col))).alias("__tok"),
    ).select(*id_cols, _bucket(F.col("__tok"), n_buckets).alias("bucket"))


# ------------------------------------------------- Naive Bayes filter

def train_quality_classifier(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1 << 18,
    smoothing: float = 1.0,
) -> DataFrame:
    """Train a multinomial Naive-Bayes quality classifier over hashed
    token buckets. ``label_col`` must be 0/1 (1 = positive / trusted).

    Returns a model DataFrame with one row per bucket observed in
    training::

        bucket    : long              -- hashed feature id
        llr       : double            -- ln P(b|1) - ln P(b|0), add-k
        prior_llr : double (constant) -- ln((d1+1)/(d0+1)) doc prior
        oov_llr   : double (constant) -- llr of an unseen bucket

    ``llr = ln((c1+k)/(n1+k*K)) - ln((c0+k)/(n0+k*K))`` with per-class
    token totals n1/n0 and K = n_buckets. The two constants ride along
    on every row (same pattern as ``train_unigram_lm``'s
    ``oov_logprob``) so scoring never reverse-engineers the smoothing
    denominators. The model has <= n_buckets rows — broadcastable at
    any corpus size; that cap is the point of the hashing trick.

    Action-free: one explode+groupBy(bucket) shuffle (map-side partial
    agg bounds it at n_buckets rows/partition), totals and priors as
    broadcast 1-row cross-joins.
    """
    y = F.col(label_col).cast("int")
    tok = df.select(y.alias("y"),
                    F.explode(_tokens(F.col(text_col))).alias("tok"))
    counts = (
        tok.groupBy(_bucket(F.col("tok"), n_buckets).alias("bucket"))
        .agg(F.sum("y").alias("c1"),
             F.sum(1 - F.col("y")).alias("c0"))
    )
    tot = counts.agg(F.sum("c1").alias("__n1"), F.sum("c0").alias("__n0"))
    docs = df.agg(F.sum(y).alias("__d1"),
                  (F.count(F.lit(1)) - F.sum(y)).alias("__d0"))
    k = F.lit(float(smoothing))
    kk = k * F.lit(float(n_buckets))
    llr = (
        F.log((F.col("c1") + k) / (F.col("__n1") + kk))
        - F.log((F.col("c0") + k) / (F.col("__n0") + kk))
    )
    oov = F.log(F.col("__n0") + kk) - F.log(F.col("__n1") + kk)
    prior = F.log((F.col("__d1") + 1.0) / (F.col("__d0") + 1.0))
    return (
        counts.crossJoin(F.broadcast(tot)).crossJoin(F.broadcast(docs))
        .select(
            "bucket",
            llr.alias("llr"),
            prior.alias("prior_llr"),
            oov.alias("oov_llr"),
        )
    )


def _score_against(
    df: DataFrame,
    model: DataFrame,
    text_col: str,
    id_cols: Sequence[str],
    n_buckets: int,
    out_col: str,
    add_prior: bool,
) -> DataFrame:
    """Shared scorer: per-doc sum of model ``llr`` over hashed tokens,
    unseen buckets scored with the model's constant ``oov_llr``, empty
    docs scored prior-only (sum term 0). One broadcast hash join + one
    groupBy(doc id) shuffle.

    The model meta row is derived with an ALWAYS-one-row agg
    (``first`` over the model, nulls coalesced to 0), so a degenerate
    empty model — a training corpus with zero tokens — scores every
    document 0 (prior-only) instead of silently emitting zero rows
    through an empty cross join."""
    toks = _doc_buckets(df, text_col, id_cols, n_buckets)
    weights = F.broadcast(model.select("bucket", "llr"))
    meta = F.broadcast(model.agg(
        F.coalesce(F.first("prior_llr"), F.lit(0.0)).alias("prior_llr"),
        F.coalesce(F.first("oov_llr"), F.lit(0.0)).alias("oov_llr")))
    joined = toks.join(weights, "bucket", "left").crossJoin(meta)
    term = F.when(F.col("bucket").isNotNull(),
                  F.coalesce(F.col("llr"), F.col("oov_llr")))
    base = F.coalesce(F.sum(term), F.lit(0.0))
    score = base + F.first("prior_llr") if add_prior else base
    return joined.groupBy(*id_cols).agg(
        F.count("bucket").alias("n_tokens"),
        score.alias(out_col),
    )


def score_quality_classifier(
    df: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    n_buckets: int = 1 << 18,
) -> DataFrame:
    """Score documents with a trained NB model: ``logit = prior_llr +
    sum_tokens llr(bucket)`` (unseen buckets -> ``oov_llr``; empty docs
    -> prior only). Returns (id_cols..., n_tokens, logit, prob) where
    ``prob = sigmoid(logit)`` — the "probability this document looks
    like the trusted corpus" used as a keep/downsample signal.

    ``n_buckets`` MUST match training. Plan: explode -> broadcast join
    (model <= n_buckets rows) -> groupBy(id) — one shuffle, keyed by
    the unique doc id, so no skew is possible.
    """
    out = _score_against(df, model, text_col, id_cols, n_buckets,
                         "logit", add_prior=True)
    return out.withColumn(
        "prob", F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("logit"))))


# ------------------------------------------------ DSIR importance weights

def dsir_logweights(
    raw_df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_cols: Sequence[str] = ("doc_id",),
    n_buckets: int = 1 << 16,
    smoothing: float = 0.5,
) -> DataFrame:
    """Per-document DSIR log importance weight: ``log_weight(d) =
    sum_{tokens t in d} ln(p_target(bucket(t)) / p_raw(bucket(t)))``
    with add-k smoothed hashed-unigram bucket distributions estimated
    from ``target_df`` (the small trusted corpus) and ``raw_df`` (the
    corpus being selected from). Higher = more target-like. Empty docs
    get 0. Returns (id_cols..., n_tokens, log_weight).

    This is Xie et al. 2023's hashed n-gram importance estimator at
    order 1; the bucket-count shuffle bounds at n_buckets rows per
    partition regardless of corpus size, and the ratio table (<=
    2^16 rows default) broadcasts to the scoring join. Both density
    estimates and the scoring pass are action-free Spark plans.
    """
    k = F.lit(float(smoothing))
    kk = k * F.lit(float(n_buckets))

    def dist(df: DataFrame, cname: str):
        tok = df.select(F.explode(_tokens(F.col(text_col))).alias("tok"))
        c = tok.groupBy(_bucket(F.col("tok"), n_buckets).alias("bucket")) \
            .agg(F.count(F.lit(1)).alias(cname))
        n = c.agg(F.sum(cname).alias(f"__n_{cname}"))
        return c, n

    # Full-outer join of the two bucket-count tables would carry NULL
    # totals on one-sided rows, so join the counts alone and attach
    # both 1-row totals as broadcast cross-joins.
    tc, tn = dist(target_df, "ct")
    rc, rn = dist(raw_df, "cr")
    tn, rn = F.broadcast(tn), F.broadcast(rn)
    merged = (
        tc.join(rc, "bucket", "full")
        .crossJoin(tn).crossJoin(rn)
        .select(
            "bucket",
            (F.log((F.coalesce(F.col("ct"), F.lit(0)) + k)
                   / (F.col("__n_ct") + kk))
             - F.log((F.coalesce(F.col("cr"), F.lit(0)) + k)
                     / (F.col("__n_cr") + kk))).alias("llr"),
            F.lit(0.0).alias("prior_llr"),
            (F.log(F.col("__n_cr") + kk)
             - F.log(F.col("__n_ct") + kk)).alias("oov_llr"),
        )
    )
    return _score_against(raw_df, merged, text_col, id_cols, n_buckets,
                          "log_weight", add_prior=False)


def dsir_sample(
    weighted: DataFrame,
    k: int,
    key_cols: Sequence[str] = ("doc_id",),
    weight_col: str = "log_weight",
    temperature: float = 1.0,
    salt: str = "",
) -> DataFrame:
    """Deterministic Gumbel top-k resampling WITHOUT replacement,
    proportional to ``exp(weight / temperature)`` — the selection step
    of DSIR. Adds ``gumbel_key = weight/temperature - ln(-ln(u))`` with
    ``u`` a uniform derived from md5 of the row key (ops/sampling.py
    idiom: reproducible across runs, partitionings, and engines), then
    takes the k largest keys.

    Plans as TakeOrderedAndProject: per-partition bounded heaps of size
    k, merged on the driver — no global sort, no shuffle of the
    non-winners. ``temperature -> inf`` degrades to a uniform sample;
    ``temperature -> 0`` to deterministic top-k by weight.
    """
    parts = [F.col(c).cast("string") for c in key_cols]
    if salt:
        parts.append(F.lit(salt))
    u = ((F.conv(F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8),
                 16, 10).cast("double") + F.lit(0.5)) / F.lit(_U32))
    key = (F.col(weight_col) / F.lit(float(temperature))
           - F.log(-F.log(u)))
    return (
        weighted.withColumn("gumbel_key", key)
        .orderBy(F.col("gumbel_key").desc(), *[F.col(c) for c in key_cols])
        .limit(k)
    )
