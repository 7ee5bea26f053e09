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
from .core.datatypes import ValueType
from .core.profiler import (ProfileView, merge_profiles, merge_segments,
                            profile,
                            profile_partitions)
from .core.registry import (CustomComponent, register_metric,
                            unregister_metric)

def log(obj=None, *, pandas=None, row=None, multiple=None,
        segment_by=None, columns=None, config=DEFAULT_CONFIG, spark=None):
    """Reference-parity entry point (why.log,
    python/whylogs/api/logger/__init__.py:42): accepts a Spark DataFrame,
    a pandas DataFrame, a single dict row, or ``multiple`` named datasets
    (-> dict of ProfileViews). Non-Spark inputs are lifted into the
    active SparkSession and run through the same profiler."""
    from pyspark.sql import DataFrame as _SparkDF
    from pyspark.sql import SparkSession as _Session

    if multiple is not None:
        return {
            name: log(data, segment_by=segment_by, columns=columns,
                      config=config, spark=spark)
            for name, data in multiple.items()
        }
    target = obj if obj is not None else (
        pandas if pandas is not None else row)
    if target is None:
        raise ValueError("log() needs obj=, pandas=, row= or multiple=")
    if isinstance(target, _SparkDF):
        return profile(target, segment_by=segment_by, columns=columns,
                       config=config)
    sess = spark or _Session.getActiveSession()
    if sess is None:
        raise RuntimeError("no active SparkSession for non-Spark input")
    import pandas as _pd

    if isinstance(target, dict):
        pdf = _pd.DataFrame([target])
    elif isinstance(target, _pd.DataFrame):
        pdf = target
    else:
        raise TypeError(f"cannot profile {type(target)!r}")
    return profile(sess.createDataFrame(pdf), segment_by=segment_by,
                   columns=columns, config=config)

def write(view: ProfileView, path: str, compat: str = "full") -> None:
    """Reference-parity ``why.write`` (python/whylogs/api/writer/):
    ``*.bin`` -> WHY1 binary profile; anything else -> long-form parquet
    (the Parquet profile store format).

    ``compat`` (binary files only): "full" round-trips every component
    within this engine; "reference" omits the engine-native KLL/FI
    sketch bytes so reference whylogs can parse the file end-to-end
    (see io/why1.write_why1 for the full matrix)."""
    if path.endswith(".bin"):
        from .io.why1 import write_why1

        write_why1(view, path, compat=compat)
    else:
        view.df.write.mode("overwrite").parquet(path)


def read(path: str, spark=None, columns=None) -> ProfileView:
    """Reference-parity ``why.read`` (ResultSetReader,
    python/whylogs/api/logger/result_set.py:310): load a profile written
    by ``write`` — WHY1 binary or long-form parquet."""
    from pyspark.sql import SparkSession as _Session

    sess = spark or _Session.getActiveSession()
    if sess is None:
        raise RuntimeError("no active SparkSession")
    if path.endswith(".bin"):
        from .io.why1 import read_why1

        return read_why1(sess, path, columns=columns)
    df = sess.read.parquet(path)
    if columns is not None:
        from pyspark.sql import functions as _F

        df = df.filter(_F.col("column").isin(list(columns)))
    return ProfileView(df)


def log_classification_metrics(df, target_column: str,
                               prediction_column: str,
                               score_column=None):
    """Reference-parity entry (why.log_classification_metrics,
    python/whylogs/api/logger/__init__.py): confusion-matrix DataFrame
    keyed by (target, prediction) with score distributions."""
    from .core.model_perf import confusion_matrix

    return confusion_matrix(df, target_column, prediction_column,
                            score_column)


def log_regression_metrics(df, prediction_column: str, target_column: str):
    """Reference-parity entry (why.log_regression_metrics): one-row
    DataFrame of n / mae / mse / rmse / mean_error."""
    from .core.model_perf import regression_metrics

    return regression_metrics(df, prediction_column, target_column)


__version__ = "0.1.0"

__all__ = [
    "MetricConfig",
    "DEFAULT_CONFIG",
    "profile",
    "profile_partitions",
    "log",
    "merge_profiles",
    "merge_segments",
    "ProfileView",
    "write",
    "read",
    "log_classification_metrics",
    "log_regression_metrics",
    "ValueType",
    "CustomComponent",
    "register_metric",
    "unregister_metric",
]
