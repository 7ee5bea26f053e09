"""Multimodal (image/audio/video) column handling.

Reference: python/whylogs/extras/image_metric.py:57-160 extracts
EXIF/pixel features (width/height/colorspace, HSV stats, entropy) with
PIL, then profiles them as a submetric bundle.

Spark-first model: media are opaque BINARY columns with typed metadata.
``spark.read.format("binaryFile")`` loads (path, modificationTime,
length, content). Feature extraction is an Arrow-batched ``mapInPandas``
over the binary column — partition-parallel, bounded memory per batch.

Decode kernels are import-guarded per executor: with PIL installed the
full pixel kernel (HSV stats + entropy, reference parity) runs on any
format; without it a pure-numpy/stdlib kernel decodes uncompressed BMP
/ binary PPM, 8-bit PNG incl. Adam7 interlace (zlib inflate +
scanline unfilter), GIF87a/89a (stdlib LZW, interlace-aware, first
frame), strip-TIFF (none/PackBits), baseline AND progressive JPEG
(_jpeg.py: Huffman decode + batched-numpy IDCT — no third-party libs)
and lossless WebP (_webp.py: the full VP8L bitstream — prefix codes,
LZ77 + color cache, all four transforms) and produces the SAME
HSV/entropy bundle (so the pixel-stat path executes and is tested in
lib-free environments), and remaining shapes (12-bit JPEG, lossy VP8
WebP, compressed audio) degrade to header-level features with null
pixel stats — or fail fast under ``strict=True`` naming the missing
dependency. All Spark plumbing — schema, batching, partitioning,
profiling of the extracted features — is real and tested either way.
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
    if content[:6] in (b"GIF87a", b"GIF89a") and len(content) >= 10:
        w = int.from_bytes(content[6:8], "little")
        h = int.from_bytes(content[8:10], "little")
        return "gif", int(w), int(h)
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
    if content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from whylogs_spark.ops._webp import sniff_webp

        w, h = sniff_webp(content)
        return "webp", w, h
    if content[:4] in (b"II*\x00", b"MM\x00*") and len(content) >= 8:
        # TIFF: ImageWidth (256) / ImageLength (257) in IFD0; SHORT or
        # LONG values are inline in the 4 value bytes
        endian = "<" if content[:2] == b"II" else ">"
        try:
            (ifd0,) = struct.unpack_from(endian + "I", content, 4)
            (n_ent,) = struct.unpack_from(endian + "H", content, ifd0)
            w = h = None
            for k in range(min(n_ent, 512)):
                off = ifd0 + 2 + 12 * k
                tag, vtype = struct.unpack_from(endian + "HH",
                                                content, off)
                if tag in (256, 257):
                    if vtype == 3:
                        (v,) = struct.unpack_from(endian + "H",
                                                  content, off + 8)
                    elif vtype == 4:
                        (v,) = struct.unpack_from(endian + "I",
                                                  content, off + 8)
                    else:
                        continue
                    if tag == 256:
                        w = int(v)
                    else:
                        h = int(v)
            return "tiff", w, h
        except struct.error:
            return "tiff", None, None
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


# ----------------------------------------------------------------- EXIF
# Tag-id -> name: the published EXIF/TIFF tag registry (subset PIL's
# ExifTags.TAGS exposes — the names the reference logs as metadata keys
# via get_pil_exif_metadata, image_metric.py:82-101). Parsing is pure
# stdlib so metadata parity executes in lib-free environments.
_EXIF_TAGS = {
    0x010E: "ImageDescription", 0x010F: "Make", 0x0110: "Model",
    0x0112: "Orientation", 0x011A: "XResolution", 0x011B: "YResolution",
    0x0128: "ResolutionUnit", 0x0131: "Software", 0x0132: "DateTime",
    0x013B: "Artist", 0x0213: "YCbCrPositioning", 0x8298: "Copyright",
    0x829A: "ExposureTime", 0x829D: "FNumber", 0x8822: "ExposureProgram",
    0x8827: "ISOSpeedRatings", 0x9000: "ExifVersion",
    0x9003: "DateTimeOriginal", 0x9004: "DateTimeDigitized",
    0x9201: "ShutterSpeedValue", 0x9202: "ApertureValue",
    0x9204: "ExposureBiasValue", 0x9207: "MeteringMode",
    0x9208: "LightSource", 0x9209: "Flash", 0x920A: "FocalLength",
    0xA001: "ColorSpace", 0xA002: "ExifImageWidth",
    0xA003: "ExifImageHeight", 0xA405: "FocalLengthIn35mmFilm",
    0xA420: "ImageUniqueID",
}
_EXIF_SUBIFD = 0x8769  # pointer from IFD0 into the Exif sub-IFD
_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
              10: 8, 11: 4, 12: 8}
_MAX_EXIF_COUNT = 4096  # cap per-entry allocations on hostile headers


def _exif_tiff_blob(content: bytes) -> Optional[bytes]:
    """Locate the TIFF structure holding the IFDs: the content itself
    for a TIFF file, or the first JPEG APP1 segment whose payload
    starts with the Exif header."""
    if content[:4] in (b"II*\x00", b"MM\x00*"):
        return content
    if content[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(content)
    while i + 4 <= n:
        if content[i] != 0xFF:
            i += 1
            continue
        marker = content[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if i + 4 > n:
            return None
        seg_len = struct.unpack(">H", content[i + 2:i + 4])[0]
        if marker == 0xE1 and content[i + 4:i + 10] == b"Exif\x00\x00":
            return content[i + 10:i + 2 + seg_len]
        if marker == 0xDA:  # start of scan: no APP1 before image data
            return None
        i += 2 + seg_len
    return None


def _exif_value(blob: bytes, endian: str, vtype: int, count: int,
                raw: bytes):
    """Decode one IFD entry's value (inline if it fits 4 bytes, else at
    the offset the 4 bytes point to). Returns None on malformed data."""
    size = _TYPE_SIZE.get(vtype)
    if size is None or count > _MAX_EXIF_COUNT:
        return None
    total = size * count
    if total > 4:
        (off,) = struct.unpack(endian + "I", raw)
        data = blob[off:off + total]
        if len(data) < total:
            return None
    else:
        data = raw[:total]
    if vtype == 2:  # ASCII
        return data.split(b"\x00", 1)[0].decode("latin-1")
    if vtype == 7:  # UNDEFINED: printable ascii or hex
        s = data.rstrip(b"\x00")
        try:
            return s.decode("ascii")
        except UnicodeDecodeError:
            return s.hex()
    fmt = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i",
           11: "f", 12: "d"}.get(vtype)
    if fmt is not None:
        vals = struct.unpack(endian + fmt * count, data)
    elif vtype in (5, 10):  # (S)RATIONAL pairs -> "num/den"
        f = "I" if vtype == 5 else "i"
        flat = struct.unpack(endian + f * (2 * count), data)
        vals = tuple(f"{flat[i]}/{flat[i + 1]}"
                     for i in range(0, len(flat), 2))
    else:
        return None
    return vals[0] if count == 1 else vals


def _exif_ifd(blob: bytes, endian: str, off: int, out: dict,
              depth: int = 0) -> None:
    if depth > 2 or off + 2 > len(blob):
        return
    (n_entries,) = struct.unpack_from(endian + "H", blob, off)
    pos = off + 2
    for _ in range(min(n_entries, 512)):
        if pos + 12 > len(blob):
            return
        tag, vtype, count = struct.unpack_from(endian + "HHI", blob, pos)
        raw = blob[pos + 8:pos + 12]
        pos += 12
        if tag == _EXIF_SUBIFD:
            (sub,) = struct.unpack(endian + "I", raw)
            _exif_ifd(blob, endian, sub, out, depth + 1)
            continue
        name = _EXIF_TAGS.get(tag)
        if name is None:
            continue
        val = _exif_value(blob, endian, vtype, count, raw)
        if val is not None:
            out[name] = val


def parse_exif(content: bytes) -> dict:
    """EXIF tags from a JPEG (APP1) or TIFF payload — stdlib TIFF/IFD
    walk, reference-parity tag names (``get_pil_exif_metadata``,
    image_metric.py:82-101). Rationals are rendered ``"num/den"``
    (lossless; PIL renders the reduced fraction). Returns {} when the
    payload carries no EXIF."""
    blob = _exif_tiff_blob(content)
    if blob is None or len(blob) < 8:
        return {}
    endian = {b"II": "<", b"MM": ">"}.get(blob[:2])
    if endian is None:
        return {}
    magic, ifd0 = struct.unpack_from(endian + "HI", blob, 2)
    if magic != 42:
        return {}
    out: dict = {}
    try:
        _exif_ifd(blob, endian, ifd0, out)
    except struct.error:
        pass
    return out


EXIF_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("exif",
                      T.MapType(T.StringType(), T.StringType())),
        T.StructField("n_tags", T.IntegerType()),
    ]
)


def extract_exif_metadata(df: DataFrame) -> DataFrame:
    """Per-image EXIF tag map over binaryFile rows — Arrow-batched
    mapInPandas, zero shuffle, no decode libraries (the reference's
    EXIF surface, image_metric.py:82-101, needs PIL; this parser is
    stdlib so it runs on any executor). Values are stringified for a
    stable map<string,string> column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                tags = parse_exif(content)
                smap = {k: (", ".join(str(x) for x in v)
                            if isinstance(v, tuple) else str(v))
                        for k, v in tags.items()}
                rows.append((r["path"], smap, len(smap)))
            yield pd.DataFrame(rows, columns=["path", "exif", "n_tags"])

    return df.mapInPandas(extract, EXIF_SCHEMA)


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


def _decode_ppm(content: bytes):
    """Binary P6 PPM -> (H, W, 3) uint8 RGB array, or None. Pure
    numpy/stdlib; handles '#' comments and maxval 255."""
    import numpy as np

    if content[:2] != b"P6":
        return None
    # width/height/maxval tokens after the magic (comments to EOL ok)
    tokens, i, n = [], 2, len(content)
    while len(tokens) < 3 and i < n:
        c = content[i:i + 1]
        if c == b"#":
            while i < n and content[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not content[j:j + 1].isspace():
                j += 1
            tokens.append(content[i:j])
            i = j
    if len(tokens) < 3:
        return None
    try:
        w, h, maxval = int(tokens[0]), int(tokens[1]), int(tokens[2])
    except ValueError:
        return None
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    i += 1  # single whitespace after maxval
    pix = content[i:i + w * h * 3]
    if len(pix) < w * h * 3:
        return None
    return np.frombuffer(pix, dtype=np.uint8).reshape(h, w, 3).copy()


def _decode_bmp(content: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB) ->
    (H, W, 3) uint8 RGB array, or None. Rows are 4-byte padded and
    stored bottom-up (top-down when height < 0); pixels are BGR."""
    import numpy as np

    if content[:2] != b"BM" or len(content) < 54:
        return None
    data_off = struct.unpack("<I", content[10:14])[0]
    w, h = struct.unpack("<ii", content[18:26])
    planes, bpp = struct.unpack("<HH", content[26:30])
    compression = struct.unpack("<I", content[30:34])[0]
    if bpp != 24 or compression != 0 or planes != 1 or w <= 0 or h == 0:
        return None
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    if len(content) < data_off + stride * h:
        return None
    raw = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_off
    ).reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        raw = raw[::-1]
    return raw[:, :, ::-1].copy()  # BGR -> RGB


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw, h, stride, bpp):
    """Reverse PNG scanline filtering (spec filters 0 None, 1 Sub,
    2 Up, 3 Average, 4 Paeth). Sub/Up/None vectorize. Average/Paeth
    predict from the already-reconstructed LEFT byte, which makes them
    inherently serial along x — and adaptive encoders (libpng/Pillow
    defaults) pick Average/Paeth for MOST rows of photographic
    content, so this serial path is the common case, not the
    exception. It therefore runs over plain Python lists (item access
    on numpy arrays is several times slower than list indexing), which
    keeps the lib-free decode usable on real images; it is still the
    cost ceiling of this kernel."""
    import numpy as np

    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    zero_row = [0] * stride
    prev_list = None  # lazily-materialized list view of out[y-1]
    for y in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, dtype=np.uint8, count=stride,
                             offset=pos + 1)
        pos += 1 + stride
        if ftype in (0, 1, 2):
            prev = out[y - 1] if y else None
            if ftype == 0:
                out[y] = line
            elif ftype == 1:  # Sub: cumsum per byte phase in the pixel
                for p in range(bpp):
                    out[y, p::bpp] = np.cumsum(
                        line[p::bpp], dtype=np.uint32) & 0xFF
            else:  # Up
                out[y] = line + prev if y else line
            prev_list = None
            continue
        if ftype not in (3, 4):
            return None
        pl = prev_list if prev_list is not None else (
            out[y - 1].tolist() if y else zero_row)
        ln = line.tolist()
        row = [0] * stride
        if ftype == 3:  # Average
            for x in range(bpp):
                row[x] = (ln[x] + (pl[x] >> 1)) & 0xFF
            for x in range(bpp, stride):
                row[x] = (ln[x] + ((row[x - bpp] + pl[x]) >> 1)) & 0xFF
        else:  # Paeth
            for x in range(bpp):
                row[x] = (ln[x] + pl[x]) & 0xFF  # a=c=0 -> pred=b
            for x in range(bpp, stride):
                a = row[x - bpp]
                b = pl[x]
                c = pl[x - bpp]
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                row[x] = (ln[x] + (
                    a if (pa <= pb and pa <= pc)
                    else (b if pb <= pc else c))) & 0xFF
        out[y] = row
        prev_list = row
    return out


# Adam7 interlace passes: (x0, y0, dx, dy) per pass, PNG spec 8.2
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _decode_png(content: bytes):
    """Stdlib PNG decoder (zlib IDAT inflate + scanline unfilter) ->
    (H, W, 3) uint8 RGB, or None for shapes outside the supported
    envelope: 8-bit depth, color types 0 gray / 2 RGB / 3 palette /
    4 gray+alpha / 6 RGBA, both non-interlaced and Adam7-interlaced
    (each of the 7 passes is an independently filtered sub-image,
    unfiltered with the shared kernel and scattered to its strided
    grid). Alpha is dropped (pixel stats match PIL's RGB->HSV path on
    opaque images)."""
    import zlib

    import numpy as np

    if content[:8] != _PNG_MAGIC:
        return None
    pos, n = 8, len(content)
    ihdr = None
    plte = None
    idat = []
    while pos + 8 <= n:
        (clen,) = struct.unpack(">I", content[pos:pos + 4])
        ctype = content[pos + 4:pos + 8]
        body = content[pos + 8:pos + 8 + clen]
        pos += 12 + clen
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype_id, comp, filt, interlace = ihdr
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype_id)
    if (depth != 8 or channels is None or comp != 0 or filt != 0
            or interlace not in (0, 1) or w < 1 or h < 1
            or (ctype_id == 3 and plte is None)):
        return None
    if interlace == 0:
        passes = [(0, 0, 1, 1, w, h)]
    else:
        passes = []
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            passes.append((x0, y0, dx, dy, pw, ph))
    need = sum(ph * (pw * channels + 1)
               for _, _, _, _, pw, ph in passes if pw and ph)
    try:
        # bound the inflate to the size IHDR implies: a zip-bomb IDAT
        # declaring a 16x16 image but inflating to tens of GB would
        # otherwise materialize fully before any size check ran
        raw = zlib.decompressobj().decompress(b"".join(idat), need)
    except zlib.error:
        return None
    if len(raw) < need:
        return None
    px = np.zeros((h, w, channels), dtype=np.uint8)
    off = 0
    for x0, y0, dx, dy, pw, ph in passes:
        if not pw or not ph:
            continue
        stride = pw * channels
        span = ph * (stride + 1)
        recon = _png_unfilter(raw[off:off + span], ph, stride, channels)
        if recon is None:
            return None
        off += span
        px[y0::dy, x0::dx] = recon.reshape(ph, pw, channels)
    if ctype_id == 2:
        return px.copy()
    if ctype_id == 6:
        return px[:, :, :3].copy()
    if ctype_id == 0:
        return np.repeat(px, 3, axis=2)
    if ctype_id == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    return plte[px[:, :, 0]]  # palette lookup




def _gif_lzw(data: bytes, min_code_size: int, expected: int) -> bytes:
    """GIF-variant LZW decode (LSB-first bit packing, 12-bit cap,
    clear/end codes). Raises ValueError on a corrupt code stream."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    out = bytearray()
    acc = nbits = 0
    prev = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == end:
                return bytes(out[:expected])
            if prev is None:
                if code >= len(table):
                    raise ValueError("bad initial LZW code")
                entry = table[code]
            else:
                if code < len(table):
                    entry = table[code]
                elif code == len(table):
                    entry = prev + prev[:1]
                else:
                    raise ValueError("LZW code out of range")
                table.append(prev + entry[:1])
                if len(table) == (1 << width) and width < 12:
                    width += 1
            out += entry
            prev = entry
            if len(out) >= expected:
                return bytes(out[:expected])
    return bytes(out[:expected])


def _decode_gif(content: bytes):
    """Decode the FIRST frame of a GIF87a/89a to an RGB uint8 array:
    stdlib LZW + palette lookup, interlace-aware. Transparency and
    later animation frames are ignored (frame 1 compositing only) —
    enough for the pixel-stat bundle. Returns None / raises on
    malformed payloads (the caller degrades to the header row)."""
    import numpy as np

    if content[:6] not in (b"GIF87a", b"GIF89a") or len(content) < 13:
        return None
    w = int.from_bytes(content[6:8], "little")
    h = int.from_bytes(content[8:10], "little")
    packed = content[10]
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(
            content[pos:pos + 3 * n], dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n
    while pos < len(content):
        b0 = content[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while pos < len(content) and content[pos] != 0:
                pos += content[pos] + 1
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            iw = int.from_bytes(content[pos + 5:pos + 7], "little")
            ih = int.from_bytes(content[pos + 7:pos + 9], "little")
            ipacked = content[pos + 9]
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 7)
                pal = np.frombuffer(
                    content[pos:pos + 3 * n],
                    dtype=np.uint8).reshape(-1, 3)
                pos += 3 * n
            if pal is None:
                return None
            mcs = content[pos]
            pos += 1
            data = bytearray()
            while pos < len(content) and content[pos] != 0:
                n = content[pos]
                data += content[pos + 1:pos + 1 + n]
                pos += n + 1
            idx = np.frombuffer(
                _gif_lzw(bytes(data), mcs, iw * ih), dtype=np.uint8)
            if idx.size < iw * ih:
                raise ValueError("truncated GIF pixel data")
            if idx.max() >= len(pal):
                raise ValueError("palette index out of range")
            rows = pal[idx].reshape(ih, iw, 3)
            if ipacked & 0x40:  # interlaced: rows 0::8, 4::8, 2::4, 1::2
                de = np.empty_like(rows)
                order = np.concatenate([
                    np.arange(0, ih, 8), np.arange(4, ih, 8),
                    np.arange(2, ih, 4), np.arange(1, ih, 2)])
                de[order] = rows
                rows = de
            if (iw, ih) != (w, h):
                full = np.zeros((h, w, 3), dtype=np.uint8)
                full[:ih, :iw] = rows[:h, :w]
                rows = full
            return rows
        else:  # trailer (0x3B) or junk
            break
    return None


def _rgb_to_hsv_u8(arr):
    """Vectorized RGB -> HSV on uint8 arrays, PIL convention (all three
    channels scaled to 0..255; hue 0..255 covers 0..360 degrees)."""
    import numpy as np

    rgb = arr.astype(np.float64) / 255.0
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    v = rgb.max(axis=-1)
    c = v - rgb.min(axis=-1)
    s = np.where(v > 0, c / np.where(v > 0, v, 1), 0.0)
    with np.errstate(invalid="ignore", divide="ignore"):
        hr = np.where(c > 0, ((g - b) / np.where(c > 0, c, 1)) % 6, 0.0)
        hg = np.where(c > 0, (b - r) / np.where(c > 0, c, 1) + 2, 0.0)
        hb = np.where(c > 0, (r - g) / np.where(c > 0, c, 1) + 4, 0.0)
    hsel = np.where(v == r, hr, np.where(v == g, hg, hb))
    hue = (hsel / 6.0) % 1.0
    return (np.stack([hue, s, v], axis=-1) * 255.0)


def _entropy_bits(arr) -> float:
    """Shannon entropy (bits) over the concatenated per-band 256-bin
    histogram — the quantity PIL's Image.entropy() reports and the
    reference profiles (image_metric.py:57-110)."""
    import numpy as np

    counts = np.concatenate([
        np.bincount(arr[..., band].reshape(-1), minlength=256)
        for band in range(arr.shape[-1])
    ]).astype(np.float64)
    total = counts.sum()
    if total == 0:
        return 0.0
    p = counts[counts > 0] / total
    return float(-(p * np.log2(p)).sum())


def _packbits(data: bytes, expected: int) -> bytes:
    """TIFF PackBits (Apple RLE) decompression, bounded at
    ``expected`` output bytes."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n and len(out) < expected:
        b = data[i]
        i += 1
        if b < 128:
            out += data[i:i + b + 1]
            i += b + 1
        elif b > 128:
            if i >= n:
                break
            out += bytes([data[i]]) * (257 - b)
            i += 1
        # 0x80 is a no-op per spec
    return bytes(out[:expected])


_TIFF_PIXEL_TAGS = (256, 257, 258, 259, 262, 273, 277, 278, 279,
                    284, 339)


def _decode_tiff(content: bytes):
    """Stdlib baseline-TIFF decoder -> (H, W, 3) uint8 RGB, or None
    outside the supported envelope: 8-bit samples, chunky planar
    config, strip-organized, Compression 1 (none) or 32773
    (PackBits), Photometric 0/1 (gray, white-is-zero inverted) or 2
    (RGB; extra samples dropped). Covers the scanner/export baseline
    profile; LZW/JPEG-in-TIFF and tiled files return None (header
    sniff fallback)."""
    import numpy as np

    if content[:4] not in (b"II*\x00", b"MM\x00*") or len(content) < 8:
        return None
    endian = "<" if content[:2] == b"II" else ">"
    (ifd0,) = struct.unpack_from(endian + "I", content, 4)
    if ifd0 + 2 > len(content):
        return None
    (n_ent,) = struct.unpack_from(endian + "H", content, ifd0)
    tags = {}
    pos = ifd0 + 2
    for _ in range(min(n_ent, 512)):
        if pos + 12 > len(content):
            return None
        tag, vtype, count = struct.unpack_from(endian + "HHI",
                                               content, pos)
        raw = content[pos + 8:pos + 12]
        pos += 12
        if tag in _TIFF_PIXEL_TAGS:
            tags[tag] = _exif_value(content, endian, vtype, count, raw)
    w, h = tags.get(256), tags.get(257)
    comp = tags.get(259, 1)
    photo = tags.get(262)
    spp = tags.get(277, 1)
    bps = tags.get(258, 8)
    planar = tags.get(284, 1)
    sample_fmt = tags.get(339, 1)
    if isinstance(bps, tuple):
        if any(b != 8 for b in bps):
            return None
    elif bps != 8:
        return None
    if isinstance(sample_fmt, tuple):
        sample_fmt = sample_fmt[0]
    if (not isinstance(w, int) or not isinstance(h, int)
            or w < 1 or h < 1 or w * h > 64_000_000
            or comp not in (1, 32773) or photo not in (0, 1, 2)
            or planar != 1 or sample_fmt != 1
            or not isinstance(spp, int)):
        return None
    if photo == 2 and spp not in (3, 4):
        return None
    if photo in (0, 1) and spp != 1:
        return None
    offs = tags.get(273)
    cnts = tags.get(279)
    if offs is None or cnts is None:
        return None
    offs = offs if isinstance(offs, tuple) else (offs,)
    cnts = cnts if isinstance(cnts, tuple) else (cnts,)
    if len(offs) != len(cnts):
        return None
    rps = tags.get(278, h)
    if not isinstance(rps, int) or rps < 1:
        rps = h
    stride = w * spp
    raw_px = bytearray()
    rows_left = h
    for o, c in zip(offs, cnts):
        if not isinstance(o, int) or not isinstance(c, int) \
                or rows_left <= 0:
            return None
        chunk = content[o:o + c]
        if len(chunk) < c:
            return None
        rows = min(rps, rows_left)
        rows_left -= rows
        expected = rows * stride
        if comp == 32773:
            chunk = _packbits(chunk, expected)
        if len(chunk) < expected:
            return None
        raw_px += chunk[:expected]
    if len(raw_px) < h * stride:
        return None
    arr = np.frombuffer(bytes(raw_px), dtype=np.uint8,
                        count=h * stride).reshape(h, w, spp)
    if photo == 2:
        return arr[:, :, :3].copy()
    g = arr[:, :, 0]
    if photo == 0:  # white-is-zero
        g = 255 - g
    return np.repeat(g[:, :, None], 3, axis=2)


def _decode_rgb_any(content: bytes):
    """Format-sniffing RGB decode shared by the pixel-stat and
    perceptual-hash kernels. Returns (format, HxWx3 uint8 array) or
    None for shapes outside the lib-free envelope (12-bit JPEG,
    16-bit PNG, LZW/tiled TIFF, lossy-VP8 WebP) or corrupt payloads.

    Corrupt payloads must degrade (header sniff / strict error), not
    leak a decoder exception out of the Spark task: a hostile PNG can
    raise struct.error in chunk parsing, ValueError in a malformed
    PLTE reshape, or IndexError on an out-of-range palette index."""
    if content[:2] == b"P6":
        dec, fmt = _decode_ppm, "ppm"
    elif content[:2] == b"BM":
        dec, fmt = _decode_bmp, "bmp"
    elif content[:8] == _PNG_MAGIC:
        dec, fmt = _decode_png, "png"
    elif content[:6] in (b"GIF87a", b"GIF89a"):
        dec, fmt = _decode_gif, "gif"
    elif content[:4] == b"RIFF" and content[8:12] == b"WEBP":
        from whylogs_spark.ops._webp import decode_webp

        dec, fmt = decode_webp, "webp"
    elif content[:4] in (b"II*\x00", b"MM\x00*"):
        dec, fmt = _decode_tiff, "tiff"
    elif content[:2] == b"\xff\xd8":
        from whylogs_spark.ops._jpeg import decode_jpeg

        dec, fmt = decode_jpeg, "jpeg"
    else:
        return None
    try:
        arr = dec(content)
    except Exception:
        arr = None
    if arr is None:
        return None
    return fmt, arr


def _numpy_pixel_features(content: bytes):
    """PIL-free pixel kernel: BMP / binary PPM (raw), PNG (stdlib zlib
    inflate + scanline unfilter, Adam7 included), baseline or
    progressive JPEG (_jpeg.py: Huffman + batched-numpy IDCT) and
    strip-TIFF (none/PackBits) produce the same HSV mean/stddev +
    entropy bundle as the PIL path, so the pixel-stat pipeline runs
    end-to-end without decode libraries. Lossless WebP (VP8L) decodes
    through ops/_webp.py. Returns None for shapes outside the
    supported envelope (12-bit JPEG, 16-bit PNG, LZW/tiled TIFF,
    lossy-VP8 WebP)."""
    import numpy as np

    decoded = _decode_rgb_any(content)
    if decoded is None:
        return None
    fmt, arr = decoded
    hsv = _rgb_to_hsv_u8(arr).reshape(-1, 3)
    means = hsv.mean(axis=0)
    stds = hsv.std(axis=0)  # population stddev, matching PIL ImageStat
    h, w = arr.shape[0], arr.shape[1]
    return (fmt, int(w), int(h), "RGB", _entropy_bits(arr),
            float(means[0]), float(stds[0]), float(means[1]),
            float(stds[1]), float(means[2]), float(stds[2]))


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

    Decode order, guarded PER EXECUTOR inside the kernel (a cluster's
    executors, not the driver, need the library): PIL when importable
    (all formats); else the pure-numpy/stdlib kernel for BMP, binary
    PPM, 8-bit PNG incl. Adam7, GIF, strip-TIFF, baseline/progressive
    JPEG and lossless WebP (same HSV/entropy bundle — the pixel path
    runs without any decode lib; PNG inflate is stdlib zlib); else the
    header sniff with null pixel stats. With
    ``strict=True`` any row no available decoder can handle fails the
    task with NotImplementedError — including a corrupt/undecodable
    payload when PIL IS present (strict means fail-on-corrupt, not just
    fail-on-missing-library); the message states which case occurred.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401
            has_pil = True
        except ImportError:
            has_pil = False
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
                        feats = None  # undecodable payload
                if feats is None:
                    feats = _numpy_pixel_features(content)
                if feats is None:
                    if strict:
                        # diagnose accurately: PIL may be present and
                        # simply unable to decode this payload
                        why = (
                            "payload undecodable by PIL and not "
                            "BMP/PPM/PNG/JPEG/TIFF/lossless-WebP "
                            "(corrupt or unsupported encoding)"
                            if has_pil else
                            "PIL not importable on this executor and "
                            "payload is not BMP/PPM/8-bit PNG/TIFF/"
                            "JPEG/lossless WebP; install pillow for "
                            "other formats")
                        raise NotImplementedError(
                            f"no available decoder for {r['path']!r} "
                            f"({why})")
                    fmt, w, h = _sniff_image(content)
                    feats = (fmt, w, h, None) + (None,) * 7
                rows.append((r["path"],) + feats + (len(content),))
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(extract, PIXEL_FEATURE_SCHEMA)


def decode_image_pixels(df: DataFrame) -> DataFrame:
    """Strict full-decode: every row must decode (PIL when available,
    else the numpy BMP/PPM/PNG/JPEG/TIFF kernel); a row neither can decode — missing
    library OR corrupt payload — fails the task fast. Alias for
    ``extract_pixel_features(strict=True)``."""
    return extract_pixel_features(df, strict=True)


# ---------------------------------------------------- perceptual hashing

def _resize_gray(gray, out_h: int, out_w: int):
    """Deterministic grayscale resize for hashing: box-filter area
    average when downsampling (each output cell averages a contiguous
    slice; boundaries floor(i*n/out)), nearest-neighbor when
    upsampling. Separable: rows then columns."""
    import numpy as np

    def one_axis(a, out_n, axis):
        n = a.shape[axis]
        if n == out_n:
            return a
        if n > out_n:
            bounds = (np.arange(out_n) * n) // out_n
            sums = np.add.reduceat(a, bounds, axis=axis)
            counts = np.diff(np.append(bounds, n))
            shape = [1, 1]
            shape[axis] = out_n
            return sums / counts.reshape(shape)
        idx = (np.arange(out_n) * n) // out_n
        return np.take(a, idx, axis=axis)

    g = gray.astype(np.float64)
    return one_axis(one_axis(g, out_h, 0), out_w, 1)


_DCT_CACHE: dict = {}


def _dct_matrix(n: int):
    """Orthonormal DCT-II basis matrix (type-II, norm='ortho'):
    D[k,i] = s(k) * cos(pi*(2i+1)*k / (2n)), s(0)=sqrt(1/n),
    s(k>0)=sqrt(2/n). coefs = D @ g @ D.T."""
    import numpy as np

    if n not in _DCT_CACHE:
        i = np.arange(n)
        k = np.arange(n)[:, None]
        d = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
        d[0] *= np.sqrt(1.0 / n)
        d[1:] *= np.sqrt(2.0 / n)
        _DCT_CACHE[n] = d
    return _DCT_CACHE[n]


def _pack_bits64(bits) -> int:
    """Row-major bit vector (length 64) -> signed two's-complement
    int64; bit 0 lands in the MSB."""
    v = 0
    for bit in bits:
        v = (v << 1) | int(bool(bit))
    return v - (1 << 64) if v >= (1 << 63) else v


def perceptual_hashes(content: bytes):
    """(ahash, dhash, phash) — the three standard 64-bit perceptual
    image fingerprints (aHash/dHash per Krawetz's published
    HackerFactor articles; pHash = DCT hash per Zauner 2010,
    "Implementation and Benchmarking of Perceptual Image Hash
    Functions"), computed from the lib-free RGB decode:

      * aHash: 8x8 area-averaged grayscale, bit = cell > mean
      * dHash: 9x8 grayscale, bit = left cell < right neighbor
        (horizontal gradient sign)
      * pHash: 32x32 grayscale -> orthonormal 2-D DCT-II -> top-left
        8x8 coefficient block, bit = coef > median of the 63 non-DC
        coefs; the DC position is always 0

    Bits pack row-major, first bit in the MSB, two's-complement into
    a signed int64 (Spark LongType). Returns None when the payload is
    not decodable by the lib-free kernel."""
    import numpy as np

    decoded = _decode_rgb_any(content)
    if decoded is None:
        return None
    _, arr = decoded
    gray = arr.astype(np.float64).mean(axis=2)

    a8 = _resize_gray(gray, 8, 8)
    ahash = _pack_bits64((a8 > a8.mean()).ravel())

    d98 = _resize_gray(gray, 8, 9)
    dhash = _pack_bits64((d98[:, :-1] < d98[:, 1:]).ravel())

    g32 = _resize_gray(gray, 32, 32)
    d = _dct_matrix(32)
    block = (d @ g32 @ d.T)[:8, :8]
    flat = block.ravel()
    med = float(np.median(flat[1:]))
    bits = flat > med
    bits[0] = False
    phash = _pack_bits64(bits)
    return ahash, dhash, phash


def with_image_hashes(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "path",
    strict: bool = False,
) -> DataFrame:
    """Perceptual hashes per image row -> (id_col, ahash, dhash,
    phash) — the multimodal analog of ``with_fingerprint``: near-
    duplicate IMAGE detection at corpus scale feeds these 64-bit
    signatures into the same Hamming-banded pair join the text side
    uses (``ops.dedup.hamming_neardup_pairs``).

    One shuffle-free Arrow pass (mapInPandas; the decode is inherently
    per-row binary work, batched through Arrow). Undecodable rows give
    null hashes, or fail the task when ``strict=True``. The plan prunes
    the scan to (id, content).

    Reference parity: the reference's image path computes PIL-based
    statistical metrics only (extras/image_metric.py) — perceptual
    hashing is part of the training-pipeline extension surface.
    """
    id_field = df.schema[id_col]
    out_schema = T.StructType([
        id_field,
        T.StructField("ahash", T.LongType()),
        T.StructField("dhash", T.LongType()),
        T.StructField("phash", T.LongType()),
    ])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, r in pdf.iterrows():
                content = bytes(r[content_col]) \
                    if r[content_col] is not None else b""
                hs = perceptual_hashes(content)
                if hs is None:
                    if strict:
                        raise NotImplementedError(
                            f"no lib-free decoder for row {r[id_col]!r}"
                            " (corrupt or unsupported encoding)")
                    hs = (None, None, None)
                out.append((r[id_col],) + hs)
            yield pd.DataFrame(
                out, columns=[id_col, "ahash", "dhash", "phash"])

    return df.select(id_col, content_col).mapInPandas(gen, out_schema)


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


def _sniff_flac(content: bytes):
    """FLAC STREAMINFO parse: sample rate (20 bits), channels (3),
    bits-per-sample (5) and total samples (36) from the mandatory
    first metadata block — exact duration, no audio libs."""
    if content[:4] != b"fLaC" or len(content) < 8 + 34:
        return None
    btype = content[4] & 0x7F
    (blen,) = struct.unpack(">I", b"\x00" + content[5:8])
    if btype != 0 or blen < 34:  # STREAMINFO must come first
        return None
    (packed,) = struct.unpack(">Q", content[18:26])
    rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bits = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if rate == 0:
        return None
    dur = total / rate if total else None
    return channels, rate, bits, dur


_MP3_BITRATES_V1L3 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160,
                      192, 224, 256, 320)
_MP3_BITRATES_V2L3 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112,
                      128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000),
              0: (11025, 12000, 8000)}


def _sniff_mp3(content: bytes):
    """MP3 (MPEG layer III) frame-header parse after skipping any
    ID3v2 tag. Duration is a CBR estimate (audio bytes * 8 / bitrate):
    exact for constant-bitrate files, approximate for VBR — the
    honest lib-free answer (a VBR scan needs every frame header)."""
    i = 0
    n = len(content)
    if content[:3] == b"ID3" and n >= 10:
        size = 0
        for b in content[6:10]:  # syncsafe 28-bit
            size = (size << 7) | (b & 0x7F)
        i = 10 + size
    end = min(i + 4096, n - 3)  # bounded sync hunt
    while i < end:
        if content[i] == 0xFF and (content[i + 1] & 0xE0) == 0xE0:
            b1, b2, b3 = content[i + 1], content[i + 2], content[i + 3]
            version = (b1 >> 3) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
            layer = (b1 >> 1) & 0x3    # 1 = layer III
            if version == 1 or layer != 1:
                i += 1
                continue
            rate_idx = (b2 >> 2) & 0x3
            br_idx = (b2 >> 4) & 0xF
            if rate_idx == 3 or br_idx in (0, 15):
                i += 1
                continue
            rate = _MP3_RATES[version][rate_idx]
            table = _MP3_BITRATES_V1L3 if version == 3 \
                else _MP3_BITRATES_V2L3
            kbps = table[br_idx]
            # a lone plausible header matches ~25% of random bytes;
            # require the NEXT frame to start with a valid sync too
            # (unless the file ends inside this frame)
            per_frame = 144000 if version == 3 else 72000
            padding = (b2 >> 1) & 1
            frame_len = per_frame * kbps // rate + padding
            j = i + frame_len
            if j + 1 < n and not (
                    content[j] == 0xFF
                    and (content[j + 1] & 0xE0) == 0xE0):
                i += 1
                continue
            channels = 1 if ((b3 >> 6) & 0x3) == 3 else 2
            dur = (n - i) * 8.0 / (kbps * 1000) if kbps else None
            return channels, rate, None, dur
        i += 1
    return None


def _sniff_ogg(content: bytes):
    """Ogg Vorbis/Opus id-header parse; duration from the LAST page's
    granule position (PCM frame count) — exact, no audio libs."""
    if content[:4] != b"OggS" or len(content) < 28:
        return None
    nseg = content[26]
    payload = 27 + nseg
    head = content[payload:payload + 19]
    if head[:7] == b"\x01vorbis" and len(head) >= 16:
        channels = head[11]
        (rate,) = struct.unpack("<I", head[12:16])
        gran_rate = rate
    elif head[:8] == b"OpusHead" and len(head) >= 16:
        channels = head[9]
        (rate,) = struct.unpack("<I", head[12:16])
        gran_rate = 48000  # opus granules are always 48 kHz
    else:
        return None
    if not rate:
        return None
    dur = None
    # the 'OggS' capture pattern may legitimately occur inside packet
    # payload bytes; walk matches backwards until one looks like a
    # real page header (stream_structure_version 0, flag bits <= 0x07)
    last = content.rfind(b"OggS")
    while last > 0:
        if (last + 27 <= len(content) and content[last + 4] == 0
                and content[last + 5] <= 0x07):
            (gran,) = struct.unpack("<q", content[last + 6:last + 14])
            if gran > 0:
                dur = gran / float(gran_rate)
            break
        last = content.rfind(b"OggS", 0, last)
    return int(channels), int(rate), None, dur


def _sniff_audio(content: bytes):
    """(format, channels, rate, bits, duration) across the lib-free
    header parsers; None when no container matches."""
    wav = _sniff_wav(content)
    if wav:
        return ("wav",) + wav
    flac = _sniff_flac(content)
    if flac:
        return ("flac",) + flac
    ogg = _sniff_ogg(content)
    if ogg:
        return ("ogg",) + ogg
    mp3 = _sniff_mp3(content)
    if mp3:
        return ("mp3",) + mp3
    return None


def extract_audio_features(df: DataFrame) -> DataFrame:
    """mapInPandas over binaryFile rows: WAV/FLAC/Ogg(Vorbis+Opus)/MP3
    header features — channels, sample rate, bits (PCM formats) and
    duration (exact for WAV/FLAC/Ogg; CBR estimate for MP3), all
    stdlib byte parsing. Unrecognized payloads report
    format='unknown' with byte length only."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                hit = _sniff_audio(content)
                if hit:
                    fmt, ch, rate, bits, dur = hit
                    rows.append((r["path"], fmt, ch, rate, bits, dur,
                                 len(content)))
                else:
                    rows.append((r["path"], "unknown", None, None, None,
                                 None, len(content)))
            yield pd.DataFrame(
                rows, columns=["path", "format", "channels", "sample_rate",
                               "bits_per_sample", "duration_s", "n_bytes"])

    return df.mapInPandas(extract, AUDIO_FEATURE_SCHEMA)


def _decode_wav_samples(content: bytes, max_samples: int = 0):
    """Decode RIFF/WAVE PCM payload to a mono float array in [-1, 1].

    Real sample decoding, stdlib+numpy only: PCM 8-bit unsigned and
    16/24/32-bit signed little-endian (format code 1) plus IEEE float32
    (format code 3). Returns (samples, rate, channels, bits,
    total_frames) or None for anything it can't decode (compressed
    codecs need an audio lib).
    ``max_samples`` > 0 keeps only a centered window of that many frames
    — bounded memory per row regardless of file size.
    """
    import numpy as np

    if len(content) < 44 or content[:4] != b"RIFF" \
            or content[8:12] != b"WAVE":
        return None
    i, n = 12, len(content)
    fmt = None
    data = None
    while i + 8 <= n:
        cid = content[i:i + 4]
        size = struct.unpack("<I", content[i + 4:i + 8])[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            fmt = struct.unpack("<HHIIHH", content[i + 8:i + 24])
        elif cid == b"data":
            data = content[i + 8:i + 8 + size]
        i += 8 + size + (size % 2)
    if fmt is None or data is None:
        return None
    code, channels, rate, _, _, bits = fmt
    if channels < 1 or rate < 1:
        return None
    # a truncated final sample (hostile/cut file) must not blow up
    # frombuffer: trim the payload to a whole number of samples
    if bits in (16, 32) and len(data) % (bits // 8):
        data = data[: len(data) - len(data) % (bits // 8)]
    if code == 1 and bits == 16:
        arr = np.frombuffer(data, dtype="<i2").astype(np.float64) / 32768.0
    elif code == 1 and bits == 8:
        arr = (np.frombuffer(data, dtype=np.uint8)
               .astype(np.float64) - 128.0) / 128.0
    elif code == 1 and bits == 32:
        arr = np.frombuffer(data, dtype="<i4").astype(np.float64) \
            / 2147483648.0
    elif code == 1 and bits == 24:
        raw = np.frombuffer(data[: len(data) - len(data) % 3],
                            dtype=np.uint8).reshape(-1, 3)
        vals = (raw[:, 0].astype(np.int64)
                | (raw[:, 1].astype(np.int64) << 8)
                | (raw[:, 2].astype(np.int64) << 16))
        vals = np.where(vals >= 1 << 23, vals - (1 << 24), vals)
        arr = vals.astype(np.float64) / float(1 << 23)
    elif code == 3 and bits == 32:
        arr = np.frombuffer(data, dtype="<f4").astype(np.float64)
    else:
        return None
    frames = len(arr) // channels
    if frames == 0:
        return None
    mono = arr[: frames * channels].reshape(frames, channels).mean(axis=1)
    if max_samples and frames > max_samples:
        start = (frames - max_samples) // 2
        mono = mono[start:start + max_samples]
    # total_frames is the UNWINDOWED count: duration comes from here,
    # so callers need no second chunk-walk over the payload
    return mono, int(rate), int(channels), int(bits), int(frames)


AUDIO_SIGNAL_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("format", T.StringType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("silence_ratio", T.DoubleType()),
        T.StructField("spectral_centroid_hz", T.DoubleType()),
        T.StructField("spectral_rolloff_hz", T.DoubleType()),
        T.StructField("n_samples", T.LongType()),
    ]
)


def _audio_signal_stats(mono, rate: int, silence_db: float = -40.0):
    """Vectorized signal features over a mono float array.

    zero_crossing_rate is crossings per second; silence_ratio is the
    fraction of 20 ms windows under ``silence_db`` relative to full
    scale; spectral centroid/rolloff come from the magnitude rFFT of a
    Hann-windowed center slice (cap 1<<18 samples so FFT cost is O(1)
    per row).
    """
    import numpy as np

    n = len(mono)
    rms = float(np.sqrt(np.mean(mono ** 2)))
    peak = float(np.max(np.abs(mono))) if n else 0.0
    zc = float(np.count_nonzero(np.diff(np.signbit(mono)))) * rate / max(
        n - 1, 1)
    win = max(int(rate * 0.02), 1)
    nwin = n // win
    if nwin:
        frames = mono[: nwin * win].reshape(nwin, win)
        frame_rms = np.sqrt(np.mean(frames ** 2, axis=1))
        thresh = 10.0 ** (silence_db / 20.0)
        silence = float(np.mean(frame_rms < thresh))
    else:
        silence = float(rms < 10.0 ** (silence_db / 20.0))
    fft_n = min(n, 1 << 18)
    sl = mono[(n - fft_n) // 2:(n - fft_n) // 2 + fft_n]
    mag = np.abs(np.fft.rfft(sl * np.hanning(fft_n)))
    freqs = np.fft.rfftfreq(fft_n, d=1.0 / rate)
    total = float(mag.sum())
    if total > 0:
        centroid = float((freqs * mag).sum() / total)
        cum = np.cumsum(mag)
        rolloff = float(freqs[int(np.searchsorted(cum, 0.85 * total))])
    else:
        centroid = 0.0
        rolloff = 0.0
    return rms, peak, zc, silence, centroid, rolloff


def extract_audio_signal_features(
    df: DataFrame, max_samples: int = 1 << 20, silence_db: float = -40.0
) -> DataFrame:
    """Decode WAV PCM samples and compute signal-level features.

    Reference scope: whylogs profiles extracted feature columns, not raw
    audio (image_metric.py is the media pattern); this op supplies the
    extraction step a training-data pipeline needs before profiling —
    loudness (RMS/peak), zero-crossing rate, silence ratio, spectral
    centroid/rolloff — as an Arrow-batched zero-shuffle mapInPandas.
    Non-WAV/compressed rows emit format='unknown' with null features;
    ``max_samples`` bounds per-row memory (centered window), so a 10 GB
    podcast file costs the same executor memory as a 10 s clip.
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                dec = _decode_wav_samples(content, max_samples=max_samples)
                if dec is None:
                    rows.append((r["path"], "unknown", None, None, None,
                                 None, None, None, None, None, None, None))
                    continue
                mono, rate, channels, _bits, total_frames = dec
                dur = total_frames / rate
                stats = _audio_signal_stats(mono, rate,
                                            silence_db=silence_db)
                rows.append((r["path"], "wav", channels, rate,
                             float(dur), *stats, len(mono)))
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_SIGNAL_SCHEMA.fields])

    return df.mapInPandas(extract, AUDIO_SIGNAL_SCHEMA)


# ------------------------------------------------------- resize / frames
RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def _resize_nn(arr, width: int, height: int):
    """Nearest-neighbor resample of an (H, W, 3) array — index
    arithmetic only, so the kernel is real without any image lib."""
    import numpy as np

    h, w = arr.shape[0], arr.shape[1]
    ys = (np.arange(height) * h) // height
    xs = (np.arange(width) * w) // width
    return arr[ys][:, xs]


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize kernel behind the mapInPandas plumbing.

    PIL path when importable (any format, emits PNG); otherwise the
    pure-numpy path decodes uncompressed BMP / binary PPM, resamples
    nearest-neighbor and re-encodes as binary PPM — real pixels in,
    real pixels out, lib-free. Rows no decoder handles emit a null
    payload (dims still reported) rather than fake bytes.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import PIL  # noqa: F401
            has_pil = True
        except ImportError:
            has_pil = False
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                out = None
                if has_pil:
                    try:
                        import io as _io

                        from PIL import Image

                        img = Image.open(_io.BytesIO(content)).resize(
                            (width, height))
                        buf = _io.BytesIO()
                        img.save(buf, format="PNG")
                        out = buf.getvalue()
                    except Exception:
                        out = None
                if out is None:
                    try:
                        if content[:2] == b"P6":
                            arr = _decode_ppm(content)
                        elif content[:2] == b"BM":
                            arr = _decode_bmp(content)
                        elif content[:8] == _PNG_MAGIC:
                            arr = _decode_png(content)
                        elif content[:2] == b"\xff\xd8":
                            from whylogs_spark.ops._jpeg import \
                                decode_jpeg

                            arr = decode_jpeg(content)
                        else:
                            arr = None
                    except Exception:  # corrupt payload -> null row
                        arr = None
                    if arr is not None:
                        small = _resize_nn(arr, width, height)
                        out = (f"P6\n{width} {height}\n255\n".encode()
                               + small.tobytes())
                rows.append((r["path"], width, height, out))
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


# ------------------------------------------------- video metadata (MP4)

def _mp4_boxes(buf: bytes, start: int, end: int):
    """Iterate (type, body_start, body_end) over ISO-BMFF boxes in
    buf[start:end]; tolerates truncation (stops at the first bad box)."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        btype = buf[off + 4:off + 8]
        body = off + 8
        if size == 1:  # 64-bit largesize
            if off + 16 > end:
                return
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            body = off + 16
        elif size == 0:  # box extends to end of file
            size = end - off
        if size < 8 or off + size > end:
            return
        yield btype, body, off + size
        off += size


def parse_mp4(content: bytes) -> dict:
    """Parse MP4 / ISO-BMFF container METADATA with the stdlib — no
    codec work: major brand (ftyp), presentation duration (mvhd
    timescale + duration, version 0 and 1), per-track handler types
    (hdlr: vide/soun/...), first video track dimensions (tkhd 16.16
    fixed point), and sample-description codec fourccs (stsd).

    Returns {} for anything that isn't a parseable MP4. This is the
    lib-free analogue of the image header sniff: enough for profiling
    and filtering video columns (duration/resolution/codec stats)
    without shipping a decoder; frame-accurate work stays behind
    ``sample_video_frames``'s documented kernel boundary.
    """
    if len(content) < 16 or content[4:8] != b"ftyp":
        return {}
    out: dict = {"major_brand": content[8:12].decode("latin1").strip(),
                 "n_tracks": 0}
    vcodec = acodec = None
    for btype, b0, b1 in _mp4_boxes(content, 0, len(content)):
        if btype != b"moov":
            continue
        for t2, c0, c1 in _mp4_boxes(content, b0, b1):
            if t2 == b"mvhd" and c1 - c0 >= 20:
                ver = content[c0]
                if ver == 1 and c1 - c0 >= 32:
                    ts = int.from_bytes(content[c0 + 20:c0 + 24], "big")
                    dur = int.from_bytes(content[c0 + 24:c0 + 32], "big")
                else:
                    ts = int.from_bytes(content[c0 + 12:c0 + 16], "big")
                    dur = int.from_bytes(content[c0 + 16:c0 + 20], "big")
                if ts:
                    out["duration_sec"] = dur / ts
            elif t2 == b"trak":
                out["n_tracks"] += 1
                handler = None
                width = height = None
                codecs = []
                for t3, d0, d1 in _mp4_boxes(content, c0, c1):
                    if t3 == b"tkhd" and d1 - d0 >= 84:
                        ver = content[d0]
                        base = d0 + (96 if ver == 1 else 84)
                        if base <= d1:
                            width = int.from_bytes(
                                content[base - 8:base - 4], "big") / 65536
                            height = int.from_bytes(
                                content[base - 4:base], "big") / 65536
                    elif t3 == b"mdia":
                        for t4, e0, e1 in _mp4_boxes(content, d0, d1):
                            if t4 == b"hdlr" and e1 - e0 >= 12:
                                handler = content[e0 + 8:e0 + 12] \
                                    .decode("latin1")
                            elif t4 == b"minf":
                                for t5, f0, f1 in _mp4_boxes(
                                        content, e0, e1):
                                    if t5 != b"stbl":
                                        continue
                                    for t6, g0, g1 in _mp4_boxes(
                                            content, f0, f1):
                                        if t6 != b"stsd":
                                            continue
                                        for t7, h0, h1 in _mp4_boxes(
                                                content, g0 + 8, g1):
                                            codecs.append(
                                                t7.decode("latin1"))
                if handler == "vide":
                    if vcodec is None and codecs:
                        vcodec = codecs[0]
                    if width and "width" not in out:
                        out["width"] = int(width)
                        out["height"] = int(height)
                elif handler == "soun" and acodec is None and codecs:
                    acodec = codecs[0]
    if vcodec:
        out["video_codec"] = vcodec
    if acodec:
        out["audio_codec"] = acodec
    return out


VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("major_brand", T.StringType()),
        T.StructField("duration_sec", T.DoubleType()),
        T.StructField("n_tracks", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("video_codec", T.StringType()),
        T.StructField("audio_codec", T.StringType()),
    ]
)


def extract_video_metadata(df: DataFrame) -> DataFrame:
    """Container metadata for binary video rows (path, content) via the
    stdlib ISO-BMFF parser — zero shuffle, Arrow-batched; un-parseable
    payloads yield null fields (path kept), so a corrupt file never
    fails the task."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"]) if r["content"] is not None \
                    else b""
                m = parse_mp4(content)
                rows.append((
                    r["path"], m.get("major_brand"),
                    m.get("duration_sec"), m.get("n_tracks"),
                    m.get("width"), m.get("height"),
                    m.get("video_codec"), m.get("audio_codec"),
                ))
            yield pd.DataFrame(rows, columns=[
                "path", "major_brand", "duration_sec", "n_tracks",
                "width", "height", "video_codec", "audio_codec"])

    return df.mapInPandas(extract, VIDEO_META_SCHEMA)
