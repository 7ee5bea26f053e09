"""Shared time-bucketing helper for the two-phase skew-bounded plans
(``asof_join(hot_key_buckets=...)``, ``sessionize(hot_user_buckets=...)``).

The bucket id must be monotonic in event order, or the bucket-boundary
bridge logic assigns wrong results near the non-monotonic region. A
``cast('timestamp').cast('double')`` on a TIMESTAMP_NTZ column is NOT
monotonic: the cast interprets wall-clock values in the session
timezone, and across a DST spring-forward gap under a non-UTC session
tz the nonexistent local times map past later ones. NTZ values are
therefore differenced against an NTZ epoch (pure wall-clock
arithmetic, timezone-free).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUMERIC_PREFIXES = (
    "bigint", "int", "double", "float", "smallint", "tinyint", "decimal")


def epoch_secs(col_name: str, dtype: str) -> Column:
    """Monotonic seconds-since-epoch for ``col_name`` (must be a real
    column of the DataFrame, not an expression — referenced by name
    inside a SQL fragment). Safe for every input type the temporal ops
    accept:

    * numeric — already epoch seconds, cast to double;
    * TIMESTAMP (tz-aware) — ``cast('double')`` is true epoch seconds
      (an instant, monotonic by construction);
    * TIMESTAMP_NTZ — microsecond difference from an NTZ epoch, i.e.
      wall-clock arithmetic that never consults the session timezone.
      (Exact in double out to year ~2255; the division keeps sub-second
      precision and is monotonic, which is all floor-bucketing needs.)
    """
    if dtype.startswith(_NUMERIC_PREFIXES):
        return F.col(col_name).cast("double")
    if dtype == "timestamp_ntz":
        return (
            F.expr(
                "timestampdiff(MICROSECOND, "
                f"TIMESTAMP_NTZ '1970-01-01 00:00:00', `{col_name}`)"
            )
            / F.lit(1e6)
        )
    if dtype == "timestamp":
        return F.col(col_name).cast("double")
    # DATE / STRING / anything castable to a timestamp: go through the
    # timestamp cast first — DATE->DOUBLE is not a valid Spark cast and
    # STRING->DOUBLE would yield all-NULL buckets (silently disabling
    # the skew mitigation the caller asked for)
    return F.col(col_name).cast("timestamp").cast("double")


def interval_seconds(interval: str, param: str) -> float:
    """Parse a pandas-style interval string ('1 day', '30 minutes')
    to positive seconds, raising the shared ValueError contract —
    the one definition used by every hot-key two-phase option
    (``sessionize`` / ``asof_join`` / ``transition_matrix``)."""
    import pandas as _pd

    secs = float(_pd.Timedelta(interval).total_seconds())
    if secs <= 0:
        raise ValueError(f"{param} must be positive: {interval}")
    return secs
