"""Multimodal (image/audio/video) column handling.

Reference: python/whylogs/extras/image_metric.py:57-160 extracts
EXIF/pixel features (width/height/colorspace, HSV stats, entropy) with
PIL, then profiles them as a submetric bundle.

Spark-first model: media are opaque BINARY columns with typed metadata.
``spark.read.format("binaryFile")`` loads (path, modificationTime,
length, content). Feature extraction is an Arrow-batched ``mapInPandas``
over the binary column — partition-parallel, bounded memory per batch.

Decode kernels are import-guarded per executor: with PIL installed the
full pixel kernel (HSV stats + entropy, reference parity) runs; without
it, header-level features (PNG/JPEG/WAV sizes — real parsing, no libs)
are extracted and pixel stats are null, or ``strict=True`` fails the
task naming the missing dependency. All Spark plumbing — schema,
batching, partitioning, profiling of the extracted features — is real
and tested either way.
"""

from __future__ import annotations

import struct
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

IMAGE_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def read_binary_dir(spark: SparkSession, path: str,
                    glob: Optional[str] = None) -> DataFrame:
    r = spark.read.format("binaryFile")
    if glob:
        r = r.option("pathGlobFilter", glob)
    return r.load(path)


def _sniff_image(content: bytes):
    """Header-only sniffing — deterministic, no decode libs.

    PNG: IHDR width/height at offset 16; JPEG: scan SOF0/2 markers;
    otherwise unknown.
    """
    if content[:8] == b"\x89PNG\r\n\x1a\n" and len(content) >= 24:
        w, h = struct.unpack(">II", content[16:24])
        return "png", int(w), int(h)
    if content[:2] == b"\xff\xd8":
        i = 2
        n = len(content)
        while i + 9 < n:
            if content[i] != 0xFF:
                i += 1
                continue
            marker = content[i + 1]
            if marker in (0xC0, 0xC1, 0xC2, 0xC3):
                h, w = struct.unpack(">HH", content[i + 5:i + 9])
                return "jpeg", int(w), int(h)
            seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
            i += 2 + seg_len
        return "jpeg", None, None
    return "unknown", None, None


def extract_image_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binaryFile rows.

    Real deployment: replace the header sniff with PIL decode + HSV
    stats/entropy (reference image_metric.py:57-110). The plumbing —
    Arrow batches, schema, per-partition parallelism — is identical.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                fmt, w, h = _sniff_image(content)
                rows.append((r["path"], fmt, w, h, len(content)))
            yield pd.DataFrame(
                rows, columns=["path", "format", "width", "height",
                               "n_bytes"])

    return df.mapInPandas(extract, IMAGE_FEATURE_SCHEMA)


PIXEL_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("colorspace", T.StringType()),
        T.StructField("entropy", T.DoubleType()),
        T.StructField("hue_mean", T.DoubleType()),
        T.StructField("hue_stddev", T.DoubleType()),
        T.StructField("saturation_mean", T.DoubleType()),
        T.StructField("saturation_stddev", T.DoubleType()),
        T.StructField("brightness_mean", T.DoubleType()),
        T.StructField("brightness_stddev", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _pil_pixel_features(content: bytes):
    """Reference-parity pixel features (image_metric.py:57-110): HSV
    per-channel mean/stddev + entropy + width/height/colorspace. Only
    called when PIL imports (guarded at the call site)."""
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(content))
    stats = ImageStat.Stat(img.convert("HSV"))
    entropy = float(img.entropy()) if hasattr(img, "entropy") else None
    means = [float(v) for v in stats.mean]
    stds = [float(v) for v in stats.stddev]
    return ((img.format or "unknown").lower(), int(img.width),
            int(img.height), img.mode, entropy,
            means[0], stds[0], means[1], stds[1], means[2], stds[2])


def extract_pixel_features(df: DataFrame, strict: bool = False) -> DataFrame:
    """Pixel-level image features over binaryFile rows — the reference's
    HSV stats/entropy bundle (image_metric.py:57-110) as an Arrow-batched
    mapInPandas kernel.

    The PIL import is guarded PER EXECUTOR inside the kernel (a cluster's
    executors, not the driver, need the library): with PIL the full
    pixel kernel runs; without it the row falls back to the header sniff
    with null pixel stats, or — with ``strict=True`` — the task raises
    NotImplementedError naming the missing dependency.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401
            has_pil = True
        except ImportError:
            has_pil = False
        if strict and not has_pil:
            raise NotImplementedError(
                "extract_pixel_features(strict=True) requires PIL on the "
                "executors; install pillow or use the header-level "
                "extract_image_features")
        cols = [f.name for f in PIXEL_FEATURE_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                feats = None
                if has_pil:
                    try:
                        feats = _pil_pixel_features(content)
                    except Exception:
                        feats = None  # undecodable payload -> header row
                if feats is None:
                    fmt, w, h = _sniff_image(content)
                    feats = (fmt, w, h) + (None,) * 8
                rows.append((r["path"],) + feats + (len(content),))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(extract, PIXEL_FEATURE_SCHEMA)


def decode_image_pixels(df: DataFrame) -> DataFrame:
    """Strict full-decode: every row must decode through PIL (tasks fail
    fast on executors without it). Alias for
    ``extract_pixel_features(strict=True)``."""
    return extract_pixel_features(df, strict=True)


# ---------------------------------------------------------------- audio
AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _sniff_wav(content: bytes):
    """RIFF/WAVE fmt-chunk parse — real header decoding, no audio libs."""
    if len(content) < 44 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        return None
    i = 12
    fmt = None
    data_size = None
    n = len(content)
    while i + 8 <= n:
        cid = content[i:i + 4]
        size = struct.unpack("<I", content[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            (_, channels, rate, _, _, bits) = struct.unpack(
                "<HHIIHH", content[i + 8:i + 24])
            fmt = (channels, rate, bits)
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)
    if fmt is None:
        return None
    channels, rate, bits = fmt
    dur = None
    if data_size and rate and channels and bits:
        dur = data_size / (rate * channels * (bits // 8))
    return channels, rate, bits, dur


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas over binaryFile rows: WAV header features (real);
    compressed formats would need an audio lib — they report
    format='unknown' with byte length only."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                wav = _sniff_wav(content)
                if wav:
                    ch, rate, bits, dur = wav
                    rows.append((r["path"], "wav", ch, rate, bits, dur,
                                 len(content)))
                else:
                    rows.append((r["path"], "unknown", None, None, None,
                                 None, len(content)))
            yield pd.DataFrame(
                rows, columns=["path", "format", "channels", "sample_rate",
                               "bits_per_sample", "duration_s", "n_bytes"])

    return df.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


# ------------------------------------------------------- resize / frames
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel behind the real mapInPandas plumbing.

    STUB: without PIL the 'resized' payload is a deterministic fake
    (xxhash-free: first 64 bytes of the source), clearly not pixels —
    swap the inner function for a PIL `Image.resize` in deployment; the
    batch shape, schema and partitioning are what a real kernel uses.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                rows.append((r["path"], width, height, content[:64]))
            yield pd.DataFrame(
                rows, columns=["path", "width", "height", "content"])

    return df.mapInPandas(kernel, RESIZED_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("byte_offset", T.LongType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_video_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """One-to-many frame sampling over binary video rows.

    STUB decode: emits ``n_frames`` evenly-spaced byte-offset windows per
    file as the 'frame' payload (deterministic fake — a real kernel
    decodes at evenly-spaced timestamps with pyav/opencv). The
    one-to-many mapInPandas row expansion, schema and batch shape are the
    real plumbing a video pipeline needs.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                size = len(content)
                for i in range(n_frames):
                    off = (size * i) // max(n_frames, 1)
                    rows.append((r["path"], i, off,
                                 content[off:off + 256]))
            yield pd.DataFrame(
                rows, columns=["path", "frame_idx", "byte_offset", "frame"])

    return df.mapInPandas(kernel, FRAME_SCHEMA)
