"""Declarative corpus-cleaning pipeline.

``run_pipeline`` composes the cleaning/filter operator family
(ops/text.py, ops/quality.py, ops/dedup.py, ops/decontam.py) from a
spec list into ONE lazy DataFrame plan — the corpus-side sibling of
the store's declarative monitor suite (io/store.py ``run_monitors``).
A cleaning recipe becomes data (reviewable, versionable, reusable
across corpora), and because every step is plan composition — never
an action — Catalyst fuses the whole chain: projections merge,
filters push toward the scan, and only the dedup steps introduce
shuffles.

Spec format — a list of dicts, each ``{"op": <name>, ...params}``::

    [{"op": "normalize_text"},
     {"op": "quality_score", "min_score": 0.4},
     {"op": "blocklist", "words": [...], "phrases": [...]},
     {"op": "compression", "min_ratio": 0.15, "max_ratio": 0.9},
     {"op": "gopher"},
     {"op": "language", "keep": ["en", "de"]},
     {"op": "pii_redact"},
     {"op": "line_dedup"},
     {"op": "exact_dedup"},
     {"op": "minhash_dedup", "jaccard_threshold": 0.8},
     {"op": "decontaminate", "benchmark": bench_df, "n": 8},
     {"op": "fuzzy_decontaminate", "benchmark": bench_df, "n": 8,
      "threshold": 0.5},
     {"op": "custom", "fn": lambda df: ...}]

Filter-style steps drop failing rows by default; pass
``"drop": False`` to keep every row with its verdict columns for
auditing (the signal columns stay attached either way).
``pipeline_report`` runs the survival audit — one count per step
prefix, deliberately separate so the production path stays a single
action-free plan.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Sequence, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _step_normalize(df, p):
    from .text import normalize_text

    return normalize_text(df, p.get("text_col", "text"),
                          form=p.get("form", "NFC"),
                          strip_control=p.get("strip_control", True),
                          fix_encoding=p.get("fix_encoding", False))


def _filtered(df, p, verdict):
    return df.filter(verdict) if p.get("drop", True) else df


def _step_quality(df, p):
    from .text import with_quality_score

    d = with_quality_score(df, p.get("text_col", "text"))
    if "min_score" in p:
        return _filtered(d, p,
                         F.col("quality_score") >= p["min_score"])
    return d


def _step_blocklist(df, p):
    from .quality import with_blocklist_stats

    d = with_blocklist_stats(df, p["words"],
                             text_col=p.get("text_col", "text"),
                             phrases=p.get("phrases"))
    return _filtered(d, p, F.col("blocklist_ok"))


def _step_compression(df, p):
    from .quality import with_compression_stats

    d = with_compression_stats(df, p.get("text_col", "text"),
                               level=p.get("level", 6))
    if "min_ratio" not in p and "max_ratio" not in p:
        # no criterion given -> annotate-only (same contract as the
        # quality_score / language steps); a bare filter would
        # silently drop null-text rows
        return d
    cond = F.col("compression_ratio").isNotNull()
    if "min_ratio" in p:
        cond = cond & (F.col("compression_ratio") >= p["min_ratio"])
    if "max_ratio" in p:
        cond = cond & (F.col("compression_ratio") <= p["max_ratio"])
    return _filtered(d, p, cond)


def _step_gopher(df, p):
    from .quality import gopher_filter

    kw = {k: v for k, v in p.items() if k not in ("op", "drop")}
    d = gopher_filter(df, **kw)
    return _filtered(d, p, F.col("gopher_pass"))


def _step_language(df, p):
    from .text import with_language_id

    d = with_language_id(df, p.get("text_col", "text"))
    if "keep" in p:
        return _filtered(d, p,
                         F.col("lang_pred").isin(list(p["keep"])))
    return d


def _step_pii_redact(df, p):
    from .quality import with_pii_stats

    return with_pii_stats(df, p.get("text_col", "text"), redact=True,
                          redacted_col=p.get("text_col", "text"))


def _step_line_dedup(df, p):
    from .dedup import line_dedup

    # line_dedup returns ONLY (id, n_lines, n_kept, "text"): join the
    # rebuilt text back over the id so every other column — corpus
    # metadata AND the verdict columns earlier steps attached — rides
    # through, and a non-default text_col keeps its name. One extra
    # id-keyed join; ids are unique so no skew.
    tcol = p.get("text_col", "text")
    idc = p.get("id_col", "doc_id")
    ld = line_dedup(df, text_col=tcol, id_col=idc).select(
        idc, F.col("text").alias(tcol), "n_lines", "n_kept")
    return df.drop(tcol).join(ld, idc)


def _step_remove_boilerplate(df, p):
    from .dedup import remove_boilerplate

    # same rejoin shape as line_dedup: the op returns only (id,
    # n_lines, n_kept, text), so the rebuilt text joins back over the
    # unique id and every other column rides through
    tcol = p.get("text_col", "text")
    idc = p.get("id_col", "doc_id")
    rb = remove_boilerplate(
        df.select(idc, tcol), text_col=tcol, id_col=idc,
        min_docs=p.get("min_docs", 2),
        min_df_ratio=p.get("min_df_ratio", 0.05),
        delim=p.get("delim", "\n"),
    ).select(idc, F.col("text").alias(tcol),
             F.col("n_lines").alias("bp_n_lines"),
             F.col("n_kept").alias("bp_n_kept"))
    return df.drop(tcol).join(rb, idc)


def _step_exact_dedup(df, p):
    from .dedup import exact_dedup

    return exact_dedup(df, text_col=p.get("text_col", "text"))


def _step_minhash_dedup(df, p):
    from .dedup import minhash_dedup

    kw = {k: v for k, v in p.items() if k not in ("op", "drop")}
    return minhash_dedup(df, **kw)


def _step_decontaminate(df, p):
    from .decontam import ngram_decontaminate

    d = ngram_decontaminate(
        df, p["benchmark"], n=p.get("n", 8),
        text_col=p.get("text_col", "text"),
        id_col=p.get("id_col", "doc_id"))
    return _filtered(d, p, ~F.col("is_contaminated"))


def _step_fuzzy_decontaminate(df, p):
    from .decontam import fuzzy_decontaminate

    d = fuzzy_decontaminate(
        df, p["benchmark"], n=p.get("n", 8),
        threshold=p.get("threshold", 0.5),
        text_col=p.get("text_col", "text"),
        id_col=p.get("id_col", "doc_id"))
    return _filtered(d, p, ~F.col("is_contaminated"))


def _step_custom(df, p):
    fn = p["fn"]
    if not callable(fn):
        raise ValueError("custom step needs a callable 'fn'")
    out = fn(df)
    if not isinstance(out, DataFrame):
        raise ValueError("custom step 'fn' must return a DataFrame")
    return out


_STEPS: Dict[str, Callable] = {
    "normalize_text": _step_normalize,
    "quality_score": _step_quality,
    "blocklist": _step_blocklist,
    "compression": _step_compression,
    "gopher": _step_gopher,
    "language": _step_language,
    "pii_redact": _step_pii_redact,
    "line_dedup": _step_line_dedup,
    "remove_boilerplate": _step_remove_boilerplate,
    "exact_dedup": _step_exact_dedup,
    "minhash_dedup": _step_minhash_dedup,
    "decontaminate": _step_decontaminate,
    "fuzzy_decontaminate": _step_fuzzy_decontaminate,
    "custom": _step_custom,
}


_REQUIRED_KEYS = {
    "blocklist": ("words",),
    "decontaminate": ("benchmark",),
    "fuzzy_decontaminate": ("benchmark",),
    "custom": ("fn",),
}


def run_pipeline(df: DataFrame, steps: Sequence[dict]) -> DataFrame:
    """Apply the spec list in order and return the composed (still
    lazy) DataFrame. Unknown ops and missing required params raise
    ValueError BEFORE touching the plan, so a typo fails fast instead
    of after an hour of cluster time."""
    problems = []
    for i, s in enumerate(steps):
        op = s.get("op")
        if op not in _STEPS:
            problems.append(f"step {i}: unknown pipeline op {op!r}")
            continue
        missing = [k for k in _REQUIRED_KEYS.get(op, ())
                   if k not in s]
        if missing:
            problems.append(
                f"step {i} ({op}): missing required {missing}")
    if problems:
        raise ValueError(
            "; ".join(problems) + f"; known ops: {sorted(_STEPS)}")
    out = df
    for spec in steps:
        out = _STEPS[spec["op"]](out, spec)
    return out


def pipeline_report(
    df: DataFrame, steps: Sequence[dict]
) -> List[Tuple[str, int]]:
    """Survival audit: ``[("input", n0), (op1, n1), ...]`` — row count
    after each step prefix. Costs one action per step (each a fused
    plan up to that prefix); run it on a sample when the corpus is
    large, and keep the production path on ``run_pipeline``."""
    out = [("input", df.count())]
    cur = df
    for spec in steps:
        cur = run_pipeline(cur, [spec])
        out.append((spec["op"], cur.count()))
    return out
