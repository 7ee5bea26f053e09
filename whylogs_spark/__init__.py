"""whylogs_spark — a PySpark-native data profiling / data-quality engine.

Re-expresses the capabilities of the reference profiling engine
(whylabs/whylogs) as idiomatic Spark: profiling is a single declarative
aggregation pass, profiles are DataFrames, and every statistic is either a
built-in JVM aggregate or a mergeable sketch aggregated per-partition.

Quick start::

    import whylogs_spark as wsp
    view = wsp.log(df)                       # ProfileView
    view.to_pandas()                         # wide summary
    wsp.log(df, segment_by=["region"])       # segmented profiles
    merged = wsp.merge_profiles([v1, v2])    # the profile monoid ⊕
"""

from .core.configs import DEFAULT_CONFIG, MetricConfig
from .core.profiler import (ProfileView, merge_profiles, profile,
                            profile_partitions)

log = profile  # reference API affinity: why.log(df)

__version__ = "0.1.0"

__all__ = [
    "MetricConfig",
    "DEFAULT_CONFIG",
    "profile",
    "profile_partitions",
    "log",
    "merge_profiles",
    "ProfileView",
]
