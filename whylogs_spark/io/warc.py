"""WARC (Web ARChive) source — the input format of web-scale corpora.

Common Crawl and most in-house crawlers ship WARC: a concatenation of
records, each ``WARC/1.0\\r\\n`` + header lines + ``\\r\\n\\r\\n`` +
payload. The Spark-first trick: the text source with a custom
``lineSep`` of ``\\r\\n\\r\\nWARC/1.0\\r\\n`` splits files INTO records
inside the scan itself — Hadoop's LineRecordReader handles custom
delimiters across split boundaries, so uncompressed WARC stays
splittable and a 1 GB file fans out across tasks with no Python in the
path. Header fields are then extracted with codegen ``regexp_extract``
projections.

Caveats stated where they bite: ``.warc.gz`` (per-record gzip members)
decompresses whole-file in Spark — repack to uncompressed or split
archives for parallel scans. Payload offsets here are character-based
(the text source decodes as UTF-8 with replacement); binary payloads
(images inside WARC) need the binaryFile reader instead.

Reference scope: whylogs has no crawl-format source; this feeds the
beyond-reference LLM-pipeline family (url ops, html_to_text, dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_RECORD_SEP = "\r\n\r\nWARC/1.0\r\n"


def _header(name: str, c) -> "F.Column":
    # header names are case-insensitive per the WARC spec
    return F.regexp_extract(c, rf"(?im)^{name}:[ \t]*([^\r\n]+)", 1)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Read WARC files into one row per record.

    Columns: warc_type, target_uri, warc_date, record_id,
    content_type, content_length (declared), http_status (response
    records; null otherwise), payload (body AFTER the HTTP header
    block for HTTP records, the raw block otherwise), and source_file.
    """
    raw = (
        spark.read.option("lineSep", _RECORD_SEP)
        .text(path)
        .withColumn("source_file", F.input_file_name())
        # the first record of each file keeps its leading magic; strip
        # so every row is "header lines\r\n\r\npayload"
        .withColumn(
            "value", F.regexp_replace("value", r"^WARC/1\.0\r\n", ""))
        .filter(F.length(F.trim(F.col("value"))) > 0)
    )
    # head = WARC header block; __after = everything past the first
    # blank line (the record block); for application/http records the
    # body follows a SECOND (HTTP) header block inside __after
    cut = "substring({src}, length(substring_index({src}, '\\r\\n\\r\\n', 1)) + 5)"
    raw = raw.withColumn("__after", F.expr(cut.format(src="value")))
    head = F.substring_index(F.col("value"), "\r\n\r\n", 1)
    after = F.col("__after")
    is_http = _header("Content-Type", head).rlike("application/http")
    body = F.when(
        is_http, F.expr(cut.format(src="__after"))
    ).otherwise(after)
    # regexp_extract yields '' on no match; nullif keeps ANSI casts safe
    status = F.when(
        is_http,
        F.nullif(
            F.regexp_extract(after, r"^HTTP/[0-9.]+ (\d{3})", 1),
            F.lit("")).cast("int"),
    )
    return raw.select(
        _header("WARC-Type", head).alias("warc_type"),
        _header("WARC-Target-URI", head).alias("target_uri"),
        _header("WARC-Date", head).alias("warc_date"),
        _header("WARC-Record-ID", head).alias("record_id"),
        _header("Content-Type", head).alias("content_type"),
        F.nullif(_header("Content-Length", head), F.lit(""))
        .cast("long").alias("content_length"),
        status.alias("http_status"),
        body.alias("payload"),
        "source_file",
    )


def warc_responses(spark: SparkSession, path: str) -> DataFrame:
    """Only the fetched pages: response records with an HTTP 200,
    (url, fetched_at, payload) — the usual head of a corpus pipeline
    (chain into ops.html.html_to_text then the dedup family)."""
    return (
        read_warc(spark, path)
        .filter((F.col("warc_type") == "response")
                & (F.col("http_status") == 200))
        .select(
            F.col("target_uri").alias("url"),
            F.to_timestamp("warc_date").alias("fetched_at"),
            "payload", "source_file",
        )
    )
