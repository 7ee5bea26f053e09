"""Parquet table loading with schema normalization.

Spark's vectorized parquet reader rejects TIMESTAMP(NANOS) columns
(PARQUET_TYPE_ILLEGAL). We flip the legacy nanos-as-long conf and convert
the raw nanos back to a proper timestamp (microsecond precision — the
same truncation DuckDB applies when reading nanos parquet).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        f = dict(zip(df.columns, df.schema.fields))
        ts = f.get("ts")
        if ts is not None and isinstance(ts.dataType, T.LongType):
            # integer div: double division loses ulps on int64 nanos
            # (~1.7e15 us has 0.25 ulp) and can round UP a microsecond;
            # DuckDB truncates nanos->micros exactly, so must we
            df = df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df
