"""Byte-level file IO through the Hadoop FileSystem layer.

The reference ships separate S3 / GCS / local writer classes
(python/whylogs/api/writer/: s3.py, gcs.py, local.py — ~2k LoC of
per-backend SDK plumbing). On Spark the distinction does not exist:
every storage backend is a Hadoop ``FileSystem`` URI, the connector
jars and credentials are cluster deployment config, and one code path
serves ``file://``, ``s3a://``, ``gs://``, ``abfss://``, ``hdfs://``
alike. The profile PARQUET form already rides ``df.write.parquet``
(URI-native); these helpers give the WHY1 BINARY form the same reach
by routing whole-file reads/writes through the JVM FileSystem of the
active session.

Plain paths (no scheme) keep using local ``open`` so the binary codec
stays usable without a SparkSession (e.g. reading a reference-written
file in a unit test).
"""

from __future__ import annotations

import re

# a filesystem scheme, including Hadoop's single-slash prints
# (file:/tmp/x); the {2,} floor keeps Windows drive letters local
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]{2,}:/")


def _is_uri(path: str) -> bool:
    return "://" in path or bool(_SCHEME_RE.match(path))


def _fs_and_path(path: str, spark):
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(conf), jpath, jvm


def _active_spark(spark, path: str):
    if spark is not None:
        return spark
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession()
    if spark is None:
        raise ValueError(
            f"writing/reading the URI {path!r} needs an active "
            "SparkSession (its Hadoop configuration carries the "
            "filesystem connector + credentials)")
    return spark


def write_bytes(path: str, data: bytes, spark=None) -> None:
    """Write a whole file: local ``open`` for plain paths, the Hadoop
    ``FileSystem`` of the (active) session for ``scheme://`` URIs."""
    if not _is_uri(path):
        with open(path, "wb") as f:
            f.write(data)
        return
    spark = _active_spark(spark, path)
    fs, jpath, _ = _fs_and_path(path, spark)
    out = fs.create(jpath, True)
    try:
        out.write(bytearray(data))
    finally:
        out.close()


def read_bytes(path: str, spark=None) -> bytes:
    """Read a whole file; mirror of ``write_bytes``."""
    if not _is_uri(path):
        with open(path, "rb") as f:
            return f.read()
    spark = _active_spark(spark, path)
    fs, jpath, jvm = _fs_and_path(path, spark)
    stream = fs.open(jpath)
    try:
        # commons-io ships with every Spark distribution
        data = jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
    finally:
        stream.close()
    return bytes(data)
