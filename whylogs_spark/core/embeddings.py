"""Embedding metrics: distances to reference centroids.

Reference: python/whylogs/experimental/extras/embedding_metric.py:52-162 —
for each logged vector, cosine/euclidean distance to each row of a
reference centroid matrix; per-label distance distribution submetrics
plus a ``closest`` frequent-items submetric.

Spark-first: the (small) centroid matrix folds into the plan as literal
arrays — effectively a broadcast — and each distance is a zip_with/
aggregate expression (JVM, codegen). Derived columns then run through the
standard profiler: ``<col>.<label>_distance`` distributions + ``closest``
as a categorical column.

Also: NLP doc stats (bag-of-words style) mirroring
python/whylogs/experimental/extras/nlp_metric.py:199 — doc length, term
length, frequent terms via the ordinary FI path on exploded terms.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .configs import MetricConfig
from .planner import qcol
from .profiler import ProfileView, profile


def _lit_vec(v: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in v])


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_embedding_distances(
    df: DataFrame,
    vec_col: str,
    references: Dict[str, Sequence[float]],
    distance: str = "cosine",
) -> DataFrame:
    """Adds ``<vec_col>.<label>_distance`` per centroid and
    ``<vec_col>.closest`` (label of the nearest centroid)."""
    v = F.col(vec_col).cast("array<double>")
    out = df
    dist_cols = []
    for label, ref in references.items():
        r = _lit_vec(ref)
        if distance == "cosine":
            d = F.lit(1.0) - _dot(v, r) / (_norm(v) * _norm(r))
        elif distance == "euclidean":
            d = F.sqrt(
                F.aggregate(
                    F.zip_with(v, r, lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, z: acc + z))
        else:
            raise ValueError(f"unknown distance: {distance}")
        name = f"{vec_col}.{label}_distance"
        out = out.withColumn(name, d)
        dist_cols.append((label, name))
    # closest = label with minimal distance (ties -> first label)
    closest = None
    best = None
    for label, name in dist_cols:
        if closest is None:
            closest = F.lit(label)
            best = qcol(name)
        else:
            cond = qcol(name) < best
            closest = F.when(cond, F.lit(label)).otherwise(closest)
            best = F.when(cond, qcol(name)).otherwise(best)
    return out.withColumn(f"{vec_col}.closest", closest)


def embedding_profile(
    df: DataFrame,
    vec_col: str,
    references: Dict[str, Sequence[float]],
    distance: str = "cosine",
    config: Optional[MetricConfig] = None,
) -> ProfileView:
    derived = with_embedding_distances(df, vec_col, references, distance)
    cols = [f"{vec_col}.{label}_distance" for label in references]
    cols.append(f"{vec_col}.closest")
    kwargs = {"config": config} if config is not None else {}
    return profile(derived, columns=cols, **kwargs)


def reference_centroids(
    df: DataFrame, vec_col: str, label_col: str
) -> Dict[str, List[float]]:
    """Build a centroid per label with a single groupBy over
    element-wise array averages (zip_with running sums) — one pass,
    no collect of raw vectors."""
    dim = len(df.select(vec_col).first()[0])
    sums = [
        F.sum(F.col(vec_col)[i].cast("double")).alias(f"s{i}")
        for i in range(dim)
    ]
    rows = (
        df.groupBy(F.col(label_col).cast("string").alias("label"))
        .agg(F.count(F.lit(1)).alias("n"), *sums)
        .collect()
    )
    return {
        r["label"]: [r[f"s{i}"] / r["n"] for i in range(dim)]
        for r in rows
    }


# ----------------------------------------------------------------- NLP stats
def nlp_profile(
    df: DataFrame,
    text_col: str = "text",
    config: Optional[MetricConfig] = None,
) -> ProfileView:
    """Bag-of-words doc stats (reference BagOfWordsMetric): profiles
    doc_length (tokens), term_length (via explode), and frequent terms."""
    toks = F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))),
                                    r"\s+", " "), " ")
    docs = df.withColumn("doc_length", F.size(toks).cast("double"))
    kwargs = {"config": config} if config is not None else {}
    doc_view = profile(docs, columns=["doc_length"], **kwargs)
    terms = df.select(F.explode(toks).alias("term")).withColumn(
        "term_length", F.length("term").cast("double"))
    term_view = profile(terms, columns=["term", "term_length"], **kwargs)
    return ProfileView(
        doc_view.df.unionByName(term_view.df), doc_view.config)
