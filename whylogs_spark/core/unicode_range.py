"""Unicode-range metric: per-string counts of codepoints in named ranges.

Reference: python/whylogs/core/metrics/unicode_range.py:22-111 — for each
named codepoint range (configs.py:17-24) a full submetric bundle over
per-string in-range character counts, plus a ``string_length`` submetric;
strings are lowercased and NFD-normalized first.

Spark-first: each range count is a derived DOUBLE column computed with
regexp_replace-based counting (JVM, codegen); NFD normalization has no
JVM built-in so it's an optional Arrow-vectorized pandas UDF. The derived
columns then go through the standard profiler, giving distribution/
quantiles/etc per range — same shape as the reference's submetric bundle.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .configs import MetricConfig
from .profiler import ProfileView, profile

# Named codepoint ranges (reference configs.py:17-24)
DEFAULT_RANGES: Dict[str, Tuple[int, int]] = {
    "emoticon": (0x1F600, 0x1F64F),
    "control": (0x00, 0x1F),
    "digits": (0x30, 0x39),
    "latin-upper": (0x41, 0x5A),
    "latin-lower": (0x61, 0x7A),
    "basic-latin": (0x00, 0x7F),
    "extended-latin": (0x80, 0xFFFF),
}


def _range_pattern(lo: int, hi: int) -> str:
    return f"[^\\x{{{lo:04X}}}-\\x{{{hi:04X}}}]"


def range_count(c: Column, lo: int, hi: int) -> Column:
    """Count of codepoints of ``c`` inside [lo, hi] — pure JVM regex."""
    return (
        F.length(F.regexp_replace(c, _range_pattern(lo, hi), ""))
        .cast("double")
    )


def nfd_lower(colname: str) -> Column:
    """NFD-normalize + lowercase via Arrow pandas UDF (no JVM builtin)."""

    @F.pandas_udf("string")
    def _nfd(s: pd.Series) -> pd.Series:
        import unicodedata

        return s.map(
            lambda x: unicodedata.normalize("NFD", x).lower()
            if x is not None else None)

    return _nfd(F.col(colname))


def with_unicode_range_counts(
    df: DataFrame,
    column: str,
    ranges: Optional[Dict[str, Tuple[int, int]]] = None,
    normalize: bool = True,
) -> DataFrame:
    ranges = ranges or DEFAULT_RANGES
    src = nfd_lower(column) if normalize else F.lower(F.col(column))
    out = df.withColumn(f"{column}.string_length",
                        F.length(F.col(column)).cast("double"))
    norm_col = f"__norm_{column}"
    out = out.withColumn(norm_col, src)
    for name, (lo, hi) in ranges.items():
        out = out.withColumn(
            f"{column}.{name}", range_count(F.col(norm_col), lo, hi))
    return out.drop(norm_col)


def unicode_range_profile(
    df: DataFrame,
    column: str,
    ranges: Optional[Dict[str, Tuple[int, int]]] = None,
    normalize: bool = True,
    config: Optional[MetricConfig] = None,
) -> ProfileView:
    """Profile the per-range count columns — the reference's
    UnicodeRangeMetric submetric bundle as a profile over derived cols."""
    ranges = ranges or DEFAULT_RANGES
    derived = with_unicode_range_counts(df, column, ranges, normalize)
    cols = [f"{column}.string_length"] + [f"{column}.{r}" for r in ranges]
    kwargs = {"config": config} if config is not None else {}
    return profile(derived, columns=cols, **kwargs)
