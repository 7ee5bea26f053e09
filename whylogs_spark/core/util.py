"""Shared plan-shaping helpers."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Round-robin repartition when the source has far fewer partitions
    than the cluster has slots (e.g. one small parquet file locally).
    A no-op on real-scale inputs, which already arrive well-partitioned —
    the guard keeps us from adding a gratuitous 100 TB shuffle.
    """
    try:
        sc = df.sparkSession.sparkContext
        target = sc.defaultParallelism
        nparts = df.rdd.getNumPartitions()
    except Exception:
        return df
    if nparts * 2 <= target:
        return df.repartition(target)
    return df
