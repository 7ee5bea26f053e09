"""Entity linkage: blocked fuzzy joins — match records across tables
whose keys almost-but-don't-quite agree (typo'd names, OCR'd vendor
strings, user-entered addresses).

The scalable shape is classic record linkage: BLOCK (a cheap exact key
that candidate pairs must share — prefix, soundex) then VERIFY (exact
edit distance on the pairs inside each block). The cross join never
happens; the candidate space is the sum of block sizes squared, which
the blocking key keeps bounded. Both stages are JVM built-ins
(``substring``/``soundex``/``levenshtein``) inside whole-stage codegen
— no Python, no UDF.

Recall caveat (documented, inherent to blocking): a typo INSIDE the
blocking key puts the two records in different blocks and the pair is
missed. ``block="both"`` unions prefix and soundex blocks to cover
each other's blind spots (soundex survives vowel typos anywhere;
prefix survives consonant-code changes later in the string) at ~2x
candidate cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["blocked_fuzzy_join", "fellegi_sunter",
           "fellegi_sunter_report"]


def _norm(c: Column) -> Column:
    return F.lower(F.trim(c))


def _block_keys(c: Column, block: str, block_len: int):
    pre = F.substring(_norm(c), 1, block_len)
    snd = F.soundex(_norm(c))
    if block == "prefix":
        return [pre]
    if block == "soundex":
        return [snd]
    if block == "both":
        return [pre, snd]
    raise ValueError(
        f"block must be prefix|soundex|both: {block}")


def blocked_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str = None,
    block: str = "prefix",
    block_len: int = 4,
    max_distance: int = 2,
) -> DataFrame:
    """Fuzzy equi-join: all (left, right) pairs whose normalized
    (lower/trim) strings are within ``max_distance`` Levenshtein edits
    AND share a blocking key. Returns every column of both sides
    (right columns suffixed ``_r`` on name collisions) plus
    ``distance``.

    ``block="prefix"`` keys on the first ``block_len`` normalized
    characters; ``"soundex"`` on the phonetic code; ``"both"`` unions
    the two candidate sets (deduplicated) — higher recall, ~2x
    candidates. Null/empty strings never match.

    Scale shape: candidates come from hash equi-joins on the block
    key(s) — NEVER a cross join; the Levenshtein verify runs inside
    the join condition, so non-matches are discarded before
    materialization; a duplicate candidate from ``both`` blocks is
    removed by a distinct over the pair identity (the joined row),
    which partial-aggregates. Hot blocks (a very common prefix) are
    the known hazard — pick ``block_len`` so blocks stay small, or
    use ``soundex`` for name-like data.
    """
    if right_col is None:
        right_col = left_col
    if block_len < 1:
        raise ValueError(f"block_len must be >= 1: {block_len}")
    if max_distance < 0:
        raise ValueError(f"max_distance must be >= 0: {max_distance}")
    lcol = F.col(f"__l.{left_col}")
    rcol = F.col(f"__r.{right_col}")
    l_ok = lcol.isNotNull() & (F.length(_norm(lcol)) > 0)
    r_ok = rcol.isNotNull() & (F.length(_norm(rcol)) > 0)
    lkeys = _block_keys(lcol, block, block_len)
    rkeys = _block_keys(rcol, block, block_len)
    same_block = lkeys[0] == rkeys[0]
    for lk, rk in zip(lkeys[1:], rkeys[1:]):
        same_block = same_block | (lk == rk)
    dist = F.levenshtein(_norm(lcol), _norm(rcol))
    la = left.alias("__l")
    ra = right.alias("__r")
    lnames = left.columns
    rnames = right.columns
    out_cols = [F.col(f"__l.{c}").alias(c) for c in lnames]
    for c in rnames:
        name = f"{c}_r" if c in lnames else c
        out_cols.append(F.col(f"__r.{c}").alias(name))
    out_cols.append(dist.alias("distance"))

    def joined(cond):
        return la.join(
            ra, l_ok & r_ok & cond
            & (dist <= F.lit(int(max_distance)))).select(*out_cols)

    if block == "both":
        # two equi-joins unioned (aliased projections, so the column
        # names are already disambiguated) — an OR join condition would
        # plan a nested-loop cross product. The second branch excludes
        # pairs the first key already matched, so each joined pair
        # appears exactly once WITHOUT a distinct: genuinely duplicate
        # input rows keep their multiplicity, matching the prefix and
        # soundex modes. (Keys are non-null under l_ok/r_ok, so
        # eqNullSafe here is plain equality.)
        first = joined(lkeys[0] == rkeys[0])
        rest = joined((lkeys[1] == rkeys[1])
                      & ~lkeys[0].eqNullSafe(rkeys[0]))
        return first.unionByName(rest)
    return joined(same_block)


def golden_record(
    df: DataFrame,
    key_cols,
    ts_col: str,
    value_cols,
) -> DataFrame:
    """Survivorship: collapse an entity's records to ONE golden row —
    per key, each value column takes its LATEST NON-NULL value
    (master-data-management "most recent wins" rule, applied per
    FIELD, so a newer record with a null field doesn't erase an older
    value).  Output: ``(key…, n_records, first_ts, last_ts,
    <value_cols…>)``.

    Field pick: ``max_by(v, struct(ts, v))`` over rows where ``v`` is
    non-null — the struct ordering breaks equal-timestamp ties by the
    value itself, so the winner is deterministic.  ONE partial-agged
    groupBy(key); no window, no self-join — the survivorship of N
    fields rides a single exchange.  Complements
    :func:`blocked_fuzzy_join` (match) as the merge step of a
    match-merge pipeline.
    """
    keys = list(key_cols)
    vals = list(value_cols)
    ts = F.col(ts_col)
    aggs = [F.count(F.lit(1)).alias("n_records"),
            F.min(ts).alias("first_ts"),
            F.max(ts).alias("last_ts")]
    for c in vals:
        v = F.col(c)
        aggs.append(
            F.max_by(v, F.when(v.isNotNull(), F.struct(ts, v)))
            .alias(c))
    return df.filter(ts.isNotNull()).groupBy(*keys).agg(*aggs)


def _pattern_counts(pairs: DataFrame, cols):
    """ONE partial-agged aggregation to the ≤ 2^k pattern table."""
    gs = [F.coalesce(F.col(c).cast("int"), F.lit(0)).alias(f"__a{i}")
          for i, c in enumerate(cols)]
    return (pairs.select(*gs)
            .groupBy(*[f"__a{i}" for i in range(len(cols))])
            .agg(F.count(F.lit(1)).cast("double").alias("__n"))
            .collect())


def fellegi_sunter(
    pairs: DataFrame,
    agreement_cols,
    max_iter: int = 100,
    tol: float = 1e-10,
    prior: float = 0.1,
    _patterns=None,
):
    """Fellegi-Sunter probabilistic record-linkage weights fit by EM
    (Fellegi & Sunter 1969; Winkler 1988 EM formulation) over a
    CANDIDATE-PAIR frame (e.g. the output of
    :func:`blocked_fuzzy_join`) with boolean per-field agreement
    columns.  Returns ``{"p_match", "m": {col: m_i}, "u": {col: u_i},
    "n_pairs", "iterations", "converged", "log_likelihood"}`` where
    ``m_i = P(field i agrees | true match)`` and ``u_i = P(agrees |
    non-match)``.

    The whole fit is ONE distributed aggregation: pairs collapse to
    the 2^k agreement-pattern table (k = #fields, bounded ≤ 16), and
    EM runs driver-side on those ≤ 2^k (pattern, count) rows under
    the standard conditional-independence model — data volume never
    touches the iteration loop.  Null agreement values count as
    disagreement (the conservative reading).
    """
    import numpy as np

    cols = list(agreement_cols)
    if not cols:
        raise ValueError("fellegi_sunter needs >= 1 agreement column")
    if len(cols) > 16:
        raise ValueError(
            f"{len(cols)} agreement fields -> 2^{len(cols)} patterns; "
            "cap is 16 (collapse or drop fields first)")
    if not 0.0 < prior < 1.0:
        raise ValueError(f"prior must be in (0, 1): {prior}")
    pat = (_pattern_counts(pairs, cols) if _patterns is None
           else _patterns)
    if not pat:
        raise ValueError("fellegi_sunter: no candidate pairs")
    k = len(cols)
    gamma = np.array([[r[f"__a{i}"] for i in range(k)] for r in pat],
                     dtype=float)
    cnt = np.array([r["__n"] for r in pat])
    n_pairs = float(cnt.sum())

    p = float(prior)
    m = np.full(k, 0.9)
    u = np.full(k, 0.1)
    eps = 1e-12
    ll_old = -np.inf
    converged = False
    it = 0
    for it in range(1, max_iter + 1):
        lm = (gamma * np.log(np.clip(m, eps, 1 - eps))
              + (1 - gamma) * np.log(np.clip(1 - m, eps, 1 - eps))
              ).sum(axis=1)
        lu = (gamma * np.log(np.clip(u, eps, 1 - eps))
              + (1 - gamma) * np.log(np.clip(1 - u, eps, 1 - eps))
              ).sum(axis=1)
        a = p * np.exp(lm)
        b = (1 - p) * np.exp(lu)
        resp = a / np.clip(a + b, eps, None)
        ll = float((cnt * np.log(np.clip(a + b, eps, None))).sum())
        w = cnt * resp
        wn = cnt * (1 - resp)
        p = float(w.sum() / n_pairs)
        m = (w @ gamma) / np.clip(w.sum(), eps, None)
        u = (wn @ gamma) / np.clip(wn.sum(), eps, None)
        if abs(ll - ll_old) < tol * max(1.0, abs(ll)):
            converged = True
            break
        ll_old = ll
    return {
        "p_match": p,
        "m": {c: float(m[i]) for i, c in enumerate(cols)},
        "u": {c: float(u[i]) for i, c in enumerate(cols)},
        "n_pairs": int(n_pairs),
        "iterations": it,
        "converged": converged,
        "log_likelihood": ll,
    }


def fellegi_sunter_report(
    pairs: DataFrame,
    agreement_cols,
    max_iter: int = 100,
) -> DataFrame:
    """The :func:`fellegi_sunter` fit as a bounded Spark frame — one
    row per observed agreement pattern: ``(pattern, n_pairs,
    match_weight, posterior)`` where ``match_weight`` is the log2
    likelihood ratio Σ_i w_i(γ_i) and ``posterior`` the EM match
    probability of the pattern.  Patterns are '1'/'0' strings in
    ``agreement_cols`` order."""
    import math as _math

    from pyspark.sql import types as T

    cols = list(agreement_cols)
    # the pattern table is collected ONCE and shared with the fit
    pat = _pattern_counts(pairs, cols)
    model = fellegi_sunter(pairs, cols, max_iter=max_iter,
                           _patterns=pat)
    eps = 1e-12
    rows = []
    p = model["p_match"]
    for r in pat:
        g = [int(r[f"__a{i}"]) for i in range(len(cols))]
        lw = 0.0
        lm = lu = 0.0
        for i, c in enumerate(cols):
            mi = min(max(model["m"][c], eps), 1 - eps)
            ui = min(max(model["u"][c], eps), 1 - eps)
            num = mi if g[i] else (1 - mi)
            den = ui if g[i] else (1 - ui)
            lw += _math.log2(num / den)
            lm += _math.log(num)
            lu += _math.log(den)
        a = p * _math.exp(lm)
        b = (1 - p) * _math.exp(lu)
        rows.append(("".join(str(x) for x in g), int(r["__n"]),
                     float(lw), float(a / max(a + b, eps))))
    schema = T.StructType([
        T.StructField("pattern", T.StringType()),
        T.StructField("n_pairs", T.LongType()),
        T.StructField("match_weight", T.DoubleType()),
        T.StructField("posterior", T.DoubleType()),
    ])
    return pairs.sparkSession.createDataFrame(rows, schema)
