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

import math
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


# ------------------------------------------------------------------- SVD/LSI
def _gram_matrix(df: DataFrame, vec_col: str, dim: int) -> "np.ndarray":
    """Distributed Gram aggregation: per-partition numpy outer-product
    accumulate inside ``mapInArrow`` — executors ship dim x dim doubles,
    never raw vectors."""
    import pyarrow as pa
    from pyspark.sql import types as T

    proj = df.select(F.col(vec_col).cast("array<double>").alias("v"))
    out_schema = T.StructType(
        [T.StructField("g", T.ArrayType(T.DoubleType()))])

    def gram(batches):
        acc = np.zeros((dim, dim))
        seen = False
        for batch in batches:
            col = batch.column(0)
            mat = np.array(col.to_pylist(), dtype=np.float64)
            if mat.size:
                acc += mat.T @ mat
                seen = True
        if seen:
            yield pa.RecordBatch.from_pydict(
                {"g": [acc.reshape(-1).tolist()]})

    partials = proj.mapInArrow(gram, out_schema).collect()
    g = np.zeros((dim, dim))
    for r in partials:
        g += np.array(r["g"]).reshape(dim, dim)
    return g


def _gram_svd(df: DataFrame, vec_col: str, k: int):
    """-> (U: dim x k, S: k) right-singular sketch of the vector stream
    from one distributed Gram pass (S = sqrt of Gram eigenvalues)."""
    dim = len(df.select(vec_col).first()[0])
    g = _gram_matrix(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    return vecs[:, order], np.sqrt(np.clip(vals[order], 0.0, None))


class UpdatableSvd:
    """Rank-k (U, S) subspace sketch with exponential decay, updated
    batch-by-batch — parity with the reference's UpdatableSvdMetric
    (python/whylogs/experimental/extras/nlp_metric.py:113 _resketch:
    QR of [decay*U0*S0 | U1*S1], truncated SVD of R), with the batch
    factorization computed by the distributed Gram pass instead of a
    row-at-a-time stream.

    decay < 1 ages out old batches so the basis tracks topic drift; at
    decay == 1 and data of true rank <= k the sketch equals the exact
    SVD of the concatenated stream.
    """

    def __init__(self, k: int = 8, decay: float = 1.0) -> None:
        if not 0.0 < decay <= 1.0:
            raise ValueError("decay must be in (0, 1]")
        self.k = int(k)
        self.decay = float(decay)
        self.U: "np.ndarray | None" = None  # dim x k
        self.S: "np.ndarray | None" = None  # k

    def update(self, df: DataFrame, vec_col: str = "embedding"):
        U1, S1 = _gram_svd(df, vec_col, self.k)
        if self.U is None:
            self.U, self.S = U1, S1
            return self
        U0, S0 = self.U, self.S
        if U0.shape[0] < U1.shape[0]:  # dimensionality grew: pad like ref
            U0 = np.pad(U0, ((0, U1.shape[0] - U0.shape[0]), (0, 0)))
        elif U1.shape[0] < U0.shape[0]:
            U1 = np.pad(U1, ((0, U0.shape[0] - U1.shape[0]), (0, 0)))
        stacked = np.concatenate(
            (self.decay * U0 * S0, U1 * S1), axis=1)
        Q, R = np.linalg.qr(stacked)
        UR, S, _ = np.linalg.svd(R)
        self.U = Q @ UR[:, : self.k]
        self.S = S[: self.k]
        return self

    def residuals(self, df: DataFrame,
                  vec_col: str = "embedding") -> DataFrame:
        """Distributed residual norms (``<vec_col>.residual``) against
        the current basis via the in-plan projection arithmetic of
        with_lsi_residuals."""
        if self.U is None:
            raise ValueError("update() the sketch before residuals()")
        return with_lsi_residuals(df, vec_col, self.U)


def svd_reference(
    df: DataFrame, vec_col: str, k: int = 8
) -> "np.ndarray":
    """Top-k left singular vectors U (dim x k) of the vector stream.

    Reference SvdMetric keeps a rank-k (U, S) sketch updated in-stream
    (python/whylogs/experimental/extras/nlp_metric.py:46,113). Spark-first
    equivalent: aggregate the Gram matrix G = sum(v v^T) with a
    per-partition numpy outer-product accumulate inside ``mapInArrow``
    (dim x dim doubles per partition — never the raw vectors), sum the
    partials on the driver, then eigendecompose. Exact w.r.t. the data
    (no decay), deterministic, one pass, shuffle = #partitions * dim^2
    doubles. For batch-by-batch updating with decay, see UpdatableSvd.
    """
    dim = len(df.select(vec_col).first()[0])
    g = _gram_matrix(df, vec_col, dim)
    vals, vecs = np.linalg.eigh(g)
    order = np.argsort(vals)[::-1][:k]
    return vecs[:, order]


def with_lsi_residuals(
    df: DataFrame, vec_col: str, u: "np.ndarray"
) -> DataFrame:
    """Adds ``<vec_col>.residual``: ||v - U U^T v|| / ||v|| per row.

    Reference residual semantics: nlp_metric.py:60-75. U broadcasts as
    plan literals; the projection is two small matvecs expressed with
    zip_with/aggregate — JVM-side, no UDF.
    """
    v = F.col(vec_col).cast("array<double>")
    k = u.shape[1]
    # c = U^T v  (k dot products), r = v - U c, residual = ||r|| / ||v||
    coeffs = [
        _dot(v, _lit_vec(u[:, j].tolist())) for j in range(k)
    ]
    def _scaled(basis_col: Column, c: Column) -> Column:
        # factory closure: an extra lambda param would make PySpark treat
        # the lambda as the (element, index) binary form
        return F.transform(basis_col, lambda x: x * c)

    recon = None
    for j, c in enumerate(coeffs):
        term = _scaled(_lit_vec(u[:, j].tolist()), c)
        recon = term if recon is None else F.zip_with(
            recon, term, lambda a, b: a + b)
    diff = F.zip_with(v, recon, lambda a, b: a - b)
    resid = F.sqrt(F.aggregate(diff, F.lit(0.0),
                               lambda acc, x: acc + x * x))
    return df.withColumn(
        f"{vec_col}.residual",
        F.when(_norm(v) > 0, resid / _norm(v)).otherwise(F.lit(0.0)))


def lsi_energy_summary(
    df: DataFrame,
    vec_col: str,
    k: int = 8,
    u: Optional["np.ndarray"] = None,
) -> DataFrame:
    """One-row energy audit of the rank-k LSI basis: for an orthonormal
    U, every vector satisfies ||v||² = Σ_j⟨v,u_j⟩² + ||v − U Uᵀv||²
    (Pythagoras / Parseval). Returns (n, energy_total, energy_decomposed)
    where ``energy_total`` sums ||v||² directly and ``energy_decomposed``
    sums the projection+residual split through the fitted basis — the
    two agree iff the distributed Gram aggregation, eigendecomposition,
    and in-plan projection arithmetic are all correct, which is exactly
    what the correctness gate checks against a plain SQL sum of squares.
    """
    if u is None:
        u = svd_reference(df, vec_col, k)
    v = F.col(vec_col).cast("array<double>")
    total_sq = _dot(v, v)
    coeffs = [_dot(v, _lit_vec(u[:, j].tolist())) for j in range(u.shape[1])]
    proj_sq = None
    for c in coeffs:
        proj_sq = c * c if proj_sq is None else proj_sq + c * c

    def _scaled(basis_col: Column, c: Column) -> Column:
        return F.transform(basis_col, lambda x: x * c)

    recon = None
    for j, c in enumerate(coeffs):
        term = _scaled(_lit_vec(u[:, j].tolist()), c)
        recon = term if recon is None else F.zip_with(
            recon, term, lambda a, b: a + b)
    diff = F.zip_with(v, recon, lambda a, b: a - b)
    resid_sq = F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    return df.select(
        total_sq.alias("__tot"), (proj_sq + resid_sq).alias("__dec")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__tot").alias("energy_total"),
        F.sum("__dec").alias("energy_decomposed"),
    )


def lsi_profile(
    df: DataFrame,
    vec_col: str,
    k: int = 8,
    u: Optional["np.ndarray"] = None,
    config: Optional[MetricConfig] = None,
) -> ProfileView:
    """LsiMetric equivalent: distribution of reconstruction residuals
    against a rank-k SVD basis (fit on ``df`` itself if not given)."""
    if u is None:
        u = svd_reference(df, vec_col, k)
    derived = with_lsi_residuals(df, vec_col, u)
    kwargs = {"config": config} if config is not None else {}
    return profile(derived, columns=[f"{vec_col}.residual"], **kwargs)


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


def embedding_drift(
    target: DataFrame,
    reference: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space drift between two corpora of vectors: did the
    representation move? Complements the scalar drift tests (which see
    only per-dimension marginals) with the geometry the retrieval /
    semantic-dedup operators actually depend on.

    Returns one row: ``n_target`` / ``n_reference``,
    ``centroid_cosine_distance`` (1 - cos of the two mean vectors —
    the headline direction shift), ``centroid_l2``, ``norm_ratio``
    (mean vector length, target / reference — scale drift that cosine
    is blind to) and ``spread_target`` / ``spread_reference`` (mean L2
    distance to the own-side centroid — dispersion drift, e.g. a
    collapsed encoder shrinks it).

    Two passes per side, both distributed: a per-dimension sum
    aggregate (one row out per side — the ``reference_centroids``
    shape), then a pure-projection second pass against the broadcast
    centroid literals. Nothing quadratic, no vector ever collected.
    """
    # probe dimensionality from a NON-NULL vector (the literal first
    # row may be null without the side being empty)
    dim_row = reference.filter(F.col(vec_col).isNotNull()) \
        .select(vec_col).first()
    if dim_row is None:
        raise ValueError("reference has no vectors")
    dim = len(dim_row[0])

    def centroid(df: DataFrame, side: str):
        # F.get, not [i]: under ANSI a short vector would throw
        # INVALID_ARRAY_INDEX inside the agg before the dim guard
        # below can produce its clear error
        sums = [F.sum(F.get(vec_col, i).cast("double")).alias(f"s{i}")
                for i in range(dim)]
        r = df.filter(F.col(vec_col).isNotNull()) \
            .agg(F.count(F.lit(1)).alias("n"),
                 F.min(F.size(vec_col)).alias("min_dim"),
                 F.max(F.size(vec_col)).alias("max_dim"),
                 F.max(F.exists(F.col(vec_col),
                                lambda x: x.isNull())).alias("has_null"),
                 *sums).first()
        n = r["n"]
        if n == 0:
            raise ValueError(f"{side} has no vectors")
        if r["min_dim"] != dim or r["max_dim"] != dim:
            # symmetric guard: a SHORT vector would null the tail
            # dims' sums, but a LONG one would be silently truncated
            # to the first `dim` components and return plausible
            # numbers for a mismatched-corpus comparison
            raise ValueError(
                f"{side} vector dimensionality "
                f"[{r['min_dim']}, {r['max_dim']}] != reference "
                f"dimensionality ({dim})")
        if r["has_null"]:
            # F.sum SKIPS null elements but n counts the row — a
            # partial-null dimension would yield a silently biased
            # centroid (and an all-null one a driver TypeError)
            raise ValueError(
                f"{side} contains vectors with null elements")
        vals = [r[f"s{i}"] for i in range(dim)]
        return [v / n for v in vals], n

    ct, nt = centroid(target, "target")
    cr, nr = centroid(reference, "reference")
    dot = sum(a * b for a, b in zip(ct, cr))
    nct = math.sqrt(sum(a * a for a in ct))
    ncr = math.sqrt(sum(a * a for a in cr))
    cos_dist = (1.0 - dot / (nct * ncr)) if nct > 0 and ncr > 0 \
        else float("nan")
    l2 = math.sqrt(sum((a - b) ** 2 for a, b in zip(ct, cr)))

    def side_stats(df: DataFrame, c: List[float]):
        # float32 inputs must promote BEFORE any multiply: a float32
        # v*v rounds differently from the double math an oracle does
        e = F.col(vec_col).cast("array<double>")
        lit_c = _lit_vec(c)
        d2 = F.aggregate(
            F.zip_with(e, lit_c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0), lambda acc, v: acc + v)
        return df.filter(e.isNotNull()).agg(
            F.avg(F.sqrt(d2)).alias("spread"),
            F.avg(_norm(e)).alias("mean_norm")).first()

    st = side_stats(target, ct)
    sr = side_stats(reference, cr)
    norm_ratio = st["mean_norm"] / sr["mean_norm"] \
        if sr["mean_norm"] else float("nan")
    spark = target.sparkSession
    return spark.createDataFrame(
        [(int(nt), int(nr), float(cos_dist), float(l2),
          float(norm_ratio), float(st["spread"]),
          float(sr["spread"]))],
        "n_target long, n_reference long, "
        "centroid_cosine_distance double, centroid_l2 double, "
        "norm_ratio double, spread_target double, "
        "spread_reference double")


# ------------------------------------------------ dimension-wise stats

def embedding_dim_stats(
    df: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-DIMENSION profile of a vector column: (dim, n, mean,
    stddev, min_val, max_val) — the tensor analog of column profiling
    (dead dimensions, scale imbalances, clipped values, drift in a
    single coordinate all show up here; the reference's
    EmbeddingMetric summarizes distance-to-centroid scalars only,
    extras/embedding_metric.py).

    Values cast to DOUBLE before any arithmetic (float32 inputs would
    otherwise accumulate in single precision and diverge from any
    exact oracle).

    Scale shape: posexplode in-scan -> ONE groupBy(dim) with map-side
    partial aggregation; the shuffle carries dims x partitions partial
    rows, never the vectors. Null vectors are skipped by posexplode;
    null ELEMENTS are excluded from n/moments per dimension.
    """
    ex = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "__v")
    ).select("dim", F.col("__v").cast("double").alias("__v"))
    return (
        ex.groupBy("dim")
        .agg(
            F.count("__v").alias("n"),
            F.round(F.avg("__v"), 6).alias("mean"),
            F.round(F.stddev_samp("__v"), 6).alias("stddev"),
            F.round(F.min("__v"), 6).alias("min_val"),
            F.round(F.max("__v"), 6).alias("max_val"),
        )
        .orderBy("dim")
    )


# ------------------------------------------------ MMD drift (RFF)

def _rff_constants(n_features: int, dim: int, sigma: float,
                   seed: int):
    """Deterministic random-Fourier-feature constants for the
    Gaussian kernel exp(-||x-y||²/(2σ²)): frequencies W ~ N(0, 1/σ²)
    and phases b ~ U[0, 2π), from a fixed numpy RandomState so the
    identical literals replay in any engine (the recall-estimator
    VALUES convention)."""
    rs = np.random.RandomState(seed)
    w = rs.randn(n_features, dim) / float(sigma)
    b = rs.uniform(0.0, 2.0 * math.pi, n_features)
    return w.tolist(), b.tolist()


def _rff_expr(vec_col: str, w, b) -> Column:
    """phi(x) = sqrt(2/D)·cos(Wx + b) as ONE parsed SQL expression
    (the ``_lsh_buckets_expr`` lesson: per-element Column-API lit
    chains cost ~100 ms of driver py4j per feature)."""
    vec = f"CAST(`{vec_col}` AS array<double>)"
    scale = repr(math.sqrt(2.0 / len(w))) + "D"
    feats = []
    for wj, bj in zip(w, b):
        arr = "array(" + ",".join(repr(x) + "D" for x in wj) + ")"
        dot = (f"aggregate(zip_with({vec}, {arr}, "
               "(x, h) -> x * h), 0.0D, (acc, v) -> acc + v)")
        feats.append(f"{scale} * cos({dot} + {repr(bj)}D)")
    return F.expr("array(" + ", ".join(feats) + ")")


def embedding_mmd(
    target: DataFrame,
    reference: DataFrame,
    vec_col: str = "embedding",
    n_features: int = 64,
    sigma: float = 1.0,
    seed: int = 42,
) -> DataFrame:
    """Maximum Mean Discrepancy drift between two vector corpora via
    random Fourier features (Rahimi & Recht 2007): the kernel
    two-sample statistic (Gretton et al. 2012) that sees FULL
    distribution shape changes — cluster splits, mode drops, variance
    collapse — where :func:`embedding_drift`'s centroid geometry sees
    only first moments.

    Returns one row ``(n_target, n_reference, n_features, sigma,
    mmd2)`` with mmd2 = ||mean φ(target) − mean φ(reference)||², the
    biased V-statistic estimate of MMD² under the Gaussian kernel
    exp(−||x−y||²/(2σ²)).  0 means indistinguishable at this feature
    resolution; compare magnitudes across runs / segments rather
    than against an absolute threshold (or bootstrap a null with
    :func:`~whylogs_spark.ops.sampling.hash_split`).

    Scale shape: ONE aggregation pass per side — the feature map is
    a single parsed codegen projection (constants hoisted, no per-row
    Python), the per-corpus mean is n_features scalar averages, and
    only two 1-row frames ever leave the executors.  Deterministic:
    frequencies/phases come from a fixed-seed numpy draw inlined as
    plan literals, so any engine replays bit-comparable features.
    """
    if n_features < 1:
        raise ValueError(f"n_features must be >= 1: {n_features}")
    if sigma <= 0:
        raise ValueError(f"sigma must be > 0: {sigma}")
    dim_row = reference.filter(F.col(vec_col).isNotNull()) \
        .select(vec_col).first()
    if dim_row is None:
        raise ValueError("reference has no vectors")
    dim = len(dim_row[0])
    w, b = _rff_constants(int(n_features), dim, float(sigma),
                          int(seed))
    phi = _rff_expr(vec_col, w, b)

    def mean_phi(df: DataFrame, side: str):
        r = (df.filter(F.col(vec_col).isNotNull()
                       & (F.size(vec_col) == dim))
             .select(phi.alias("__phi"))
             .agg(F.count(F.lit(1)).alias("n"),
                  *[F.avg(F.col("__phi")[j]).alias(f"m{j}")
                    for j in range(int(n_features))])
             .first())
        if r["n"] == 0:
            raise ValueError(f"{side} has no vectors of dimension "
                             f"{dim}")
        return [r[f"m{j}"] for j in range(int(n_features))], r["n"]

    mt, nt = mean_phi(target, "target")
    mr, nr = mean_phi(reference, "reference")
    mmd2 = sum((a - b_) ** 2 for a, b_ in zip(mt, mr))
    spark = target.sparkSession
    return spark.createDataFrame(
        [(int(nt), int(nr), int(n_features), float(sigma),
          float(mmd2))],
        "n_target bigint, n_reference bigint, n_features int, "
        "sigma double, mmd2 double")


# ------------------------------------------------ PCA

def pca_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    k: int = 8,
) -> Dict:
    """Exact principal components of a vector column: ``{"mean",
    "components", "explained_variance", "explained_variance_ratio",
    "n"}`` — the dimensionality-reduction step before clustering /
    visualization / IVF coarse quantizers.

    One distributed pass: the dim×dim Gram matrix comes from the
    existing ``mapInArrow`` outer-product accumulate (executors ship
    dim² doubles per partition, never rows) plus a per-dimension mean
    aggregate; the covariance eigendecomposition runs driver-side on
    the dim×dim matrix (numpy ``eigh`` — exact, deterministic).
    Components are sign-fixed (largest-|coordinate| positive) so the
    factorization is reproducible across runs and engines.  Rows with
    null or wrong-dimension vectors are excluded.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1: {k}")
    dim_row = df.filter(F.col(vec_col).isNotNull()) \
        .select(vec_col).first()
    if dim_row is None:
        raise ValueError("input has no vectors")
    dim = len(dim_row[0])
    if k > dim:
        raise ValueError(f"k={k} exceeds dimension {dim}")
    base = df.filter(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) == dim))
    r = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.get(vec_col, i).cast("double")).alias(f"s{i}")
          for i in range(dim)]).first()
    n = r["n"]
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    mu = np.array([r[f"s{i}"] / n for i in range(dim)])
    g = _gram_matrix(base, vec_col, dim)
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    ev = []
    for idx in order:
        v = vecs[:, idx]
        # deterministic sign: the largest-|.| coordinate is positive
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        comps.append([float(x) for x in v])
        ev.append(float(max(vals[idx], 0.0)))
    total = float(np.trace(cov))
    return {
        "mean": [float(x) for x in mu],
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": [
            (e / total if total > 0 else 0.0) for e in ev],
        "n": int(n),
    }


def pca_project(
    df: DataFrame,
    model: Dict,
    vec_col: str = "embedding",
    out_col: str = "pca",
) -> DataFrame:
    """Project vectors onto a :func:`pca_fit` model: adds ``out_col``
    = array<double> of k scores, score_j = <x − μ, c_j>, expanded to
    <x, c_j> − <μ, c_j> so the per-row work is one literal-array dot
    per component (a single parsed codegen projection — zero
    shuffle, no Python).  Null / wrong-dimension vectors get a null
    score array."""
    comps = model["components"]
    mu = model["mean"]
    dim = len(mu)
    vec = f"CAST(`{vec_col}` AS array<double>)"
    scores = []
    for c in comps:
        arr = "array(" + ",".join(repr(x) + "D" for x in c) + ")"
        off = repr(float(sum(m * x for m, x in zip(mu, c)))) + "D"
        scores.append(
            f"aggregate(zip_with({vec}, {arr}, (x, h) -> x * h), "
            f"0.0D, (acc, v) -> acc + v) - {off}")
    expr = F.expr("array(" + ", ".join(scores) + ")")
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    return df.withColumn(out_col, F.when(ok, expr))


def procrustes_align(
    df: DataFrame,
    vec_a_col: str,
    vec_b_col: str,
) -> Dict:
    """Orthogonal Procrustes alignment between two embedding columns
    over the SAME rows (e.g. the same ids embedded by two model
    versions): the rotation R minimizing ``Σ ||R a_i − b_i||²``
    (Schönemann 1966 — ``R = U Vᵀ`` from the SVD of the
    cross-covariance ``M = Σ b_i a_iᵀ``), with the residual and a
    Procrustes disparity for drift-style monitoring of embedding
    spaces across versions.  Returns ``{"rotation" (d×d, row-major
    lists), "n", "residual", "disparity", "norm_a", "norm_b"}``.

    One distributed pass: the d×d cross matrix and both squared norms
    accumulate per partition inside ``mapInArrow`` (the
    :func:`pca_fit` Gram discipline — executors ship d² doubles per
    partition, never vectors); the d×d SVD runs driver-side.  Rows
    where either vector is null or off-dimension drop.  Apply with
    :func:`procrustes_project`.
    """
    import pyarrow as pa
    from pyspark.sql import types as T

    first = df.filter(F.col(vec_a_col).isNotNull()
                      & F.col(vec_b_col).isNotNull())         .select(vec_a_col, vec_b_col).first()
    if first is None:
        raise ValueError("procrustes_align: no complete vector pairs")
    dim = len(first[0])
    if len(first[1]) != dim:
        raise ValueError(
            f"dimension mismatch: {dim} vs {len(first[1])}")
    base = df.filter(
        F.col(vec_a_col).isNotNull() & F.col(vec_b_col).isNotNull()
        & (F.size(vec_a_col) == dim)
        & (F.size(vec_b_col) == dim)).select(
        F.col(vec_a_col).cast("array<double>").alias("a"),
        F.col(vec_b_col).cast("array<double>").alias("b"))
    out_schema = T.StructType([
        T.StructField("m", T.ArrayType(T.DoubleType())),
        T.StructField("na", T.DoubleType()),
        T.StructField("nb", T.DoubleType()),
        T.StructField("n", T.LongType()),
    ])

    def cross(batches):
        acc = np.zeros((dim, dim))
        na = nb = 0.0
        n = 0
        for batch in batches:
            A = np.array(batch.column(0).to_pylist(), dtype=np.float64)
            B = np.array(batch.column(1).to_pylist(), dtype=np.float64)
            if A.size:
                acc += B.T @ A
                na += float((A * A).sum())
                nb += float((B * B).sum())
                n += A.shape[0]
        if n:
            yield pa.RecordBatch.from_pydict(
                {"m": [acc.reshape(-1).tolist()], "na": [na],
                 "nb": [nb], "n": [n]})

    partials = base.mapInArrow(cross, out_schema).collect()
    if not partials:
        raise ValueError("procrustes_align: no complete vector pairs")
    m = np.zeros((dim, dim))
    na = nb = 0.0
    n = 0
    for r in partials:
        m += np.array(r["m"]).reshape(dim, dim)
        na += r["na"]
        nb += r["nb"]
        n += r["n"]
    uu, sv, vt = np.linalg.svd(m)
    rot = uu @ vt
    # residual = ||B - A Rᵀ||² = ||A||² + ||B||² − 2 tr(R M ... )
    # with M = Bᵀ A: Σ bᵢᵀ R aᵢ = tr(R Mᵀ) = Σ singular values when
    # R = U Vᵀ of M
    residual = max(na + nb - 2.0 * float(sv.sum()), 0.0)
    disparity = residual / nb if nb > 0 else float("nan")
    return {
        "rotation": [[float(x) for x in row] for row in rot],
        "n": int(n),
        "residual": float(residual),
        "disparity": float(disparity),
        "norm_a": float(na),
        "norm_b": float(nb),
    }


def procrustes_project(
    df: DataFrame,
    model: Dict,
    vec_col: str,
    out_col: str = "aligned",
) -> DataFrame:
    """Apply a :func:`procrustes_align` rotation to ``vec_col``:
    adds ``out_col`` = R·x as one literal-matrix codegen projection
    (the :func:`pca_project` shape — zero shuffle, no Python)."""
    rot = model["rotation"]
    dim = len(rot)
    # literal-array + higher-order form (see zca_project): O(1) plan
    # nodes per output coordinate instead of d nested multiplies
    # one nested-array LITERAL (see zca_project: janino chokes on
    # d² array-constructor nodes)
    rlit = F.lit([[float(v) for v in row] for row in rot])
    xv = F.col(vec_col).cast("array<double>")
    proj = F.transform(
        rlit,
        lambda row: F.aggregate(
            F.zip_with(row, xv, lambda a, b: a * b),
            F.lit(0.0), lambda acc, v: acc + v))
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    return df.withColumn(out_col, F.when(ok, proj))


def zca_whitening_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    eps: float = 1e-5,
) -> Dict:
    """ZCA (Mahalanobis) whitening of a vector column: the transform
    ``W = U diag(1/sqrt(lambda + eps)) U'`` of the covariance
    eigendecomposition — whitened vectors have ~identity covariance
    while staying maximally close to the originals (the property
    that distinguishes ZCA from plain PCA whitening).  Returns
    ``{"mean", "whitener" (d x d row-major), "n", "eps"}``.

    Same engine discipline as :func:`pca_fit`: ONE distributed pass
    (mapInArrow Gram accumulate + mean aggregate), driver-side eigh
    on the d x d covariance.  Apply with :func:`zca_project` — a
    literal-matrix codegen projection, zero shuffle.
    """
    dim_row = df.filter(F.col(vec_col).isNotNull()) \
        .select(vec_col).first()
    if dim_row is None:
        raise ValueError("zca_whitening_fit: input has no vectors")
    dim = len(dim_row[0])
    base = df.filter(F.col(vec_col).isNotNull()
                     & (F.size(vec_col) == dim))
    r = base.agg(
        F.count(F.lit(1)).alias("n"),
        *[F.sum(F.get(vec_col, i).cast("double")).alias(f"s{i}")
          for i in range(dim)]).first()
    n = r["n"]
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    mu = np.array([r[f"s{i}"] / n for i in range(dim)])
    g = _gram_matrix(base, vec_col, dim)
    cov = (g - n * np.outer(mu, mu)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)
    w = vecs @ np.diag(1.0 / np.sqrt(np.maximum(vals, 0.0) + eps)) \
        @ vecs.T
    return {"mean": [float(x) for x in mu],
            "whitener": [[float(x) for x in row] for row in w],
            "n": int(n), "eps": float(eps)}


def zca_project(
    df: DataFrame,
    model: Dict,
    vec_col: str = "embedding",
    out_col: str = "whitened",
) -> DataFrame:
    """Apply a :func:`zca_whitening_fit` model: ``W (x - mu)`` as one
    literal-matrix codegen projection (the :func:`pca_project`
    shape — zero shuffle, no Python).  Null / wrong-dimension
    vectors get null."""
    w = model["whitener"]
    mu = model["mean"]
    dim = len(w)
    # affine form W(x - mu) = Wx - (W mu): the matrix enters the
    # plan as ONE array literal and the product is a flat
    # zip_with/aggregate chain per output coordinate — janino
    # codegen chokes on d² nested multiply expressions at d=64+
    off = (np.array(w) @ np.array(mu)).tolist()
    wlit = F.lit([[float(v) for v in row] for row in w])
    blit = F.lit([float(v) for v in off])
    xv = F.col(vec_col).cast("array<double>")
    proj = F.zip_with(
        wlit, blit,
        lambda row, b: F.aggregate(
            F.zip_with(row, xv, lambda a, x: a * x),
            F.lit(0.0), lambda acc, v: acc + v) - b)
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    return df.withColumn(out_col, F.when(ok, proj))
