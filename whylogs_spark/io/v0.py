"""Reader for the LEGACY v0 whylogs profile binary format.

A v0 file is a varint-length-delimited ``DatasetProfileMessageV0``
(format: ``/root/reference/proto/v0/v0_messages.proto``; consumed by the
reference's ``migration/converters.py:111`` ``read_v0_to_view``). This
module decodes it with the repo's stdlib protobuf wire reader — no
generated proto classes, no reference dependencies — and maps each
column's metrics the same way the reference migration does:

* ``counters.count``            -> counts/n        (converters.py:262)
* ``counters.null_count``       -> counts/null     (deprecated wrapper)
* ``schema.typeCounts``         -> types/*         (converters.py:212;
  key = InferredType enum: 0 UNKNOWN->object, 2 FRACTIONAL, 3 INTEGRAL,
  4 BOOLEAN, 5 STRING; key 1 NULL is surfaced as ``null_type_count``)
* ``numbers.variance``          -> distribution mean / m2 / stddev
  (converters.py:311-315: mean=variance.mean, m2=variance.sum)
* ``numbers.histogram``         -> KLL sketch (floats first, then
  doubles — converters.py:301-309); min/max/n/quantiles come from it
* ``numbers.longs``             -> ints/min, ints/max (converters.py:188)
* ``cardinality_tracker``       -> raw DataSketches HLL bytes + lg_k
  (estimable by any DataSketches HLL reader, incl. Spark's JVM
  ``hll_sketch_estimate``)
* ``frequent_items``            -> raw DataSketches frequent-strings
  bytes + lg_max_k

Reading the reference's checked-in golden file
(``python/tests/testdata/v0_profile.bin``) through this module is the
repo's cross-implementation interop evidence: those bytes were written
by reference whylogs code, not by this engine.
"""

from __future__ import annotations

import math
import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional

from .dsketch import fi_from_ds_bytes, kll_floats_from_ds_bytes, \
    kll_from_ds_bytes
from .why1 import _fields, _read_uvarint, _signed64 as _signed

# InferredType.Type enum (v0_messages.proto:16-28)
TYPE_UNKNOWN, TYPE_NULL, TYPE_FRACTIONAL = 0, 1, 2
TYPE_INTEGRAL, TYPE_BOOLEAN, TYPE_STRING = 3, 4, 5

_TYPE_METRIC = {
    TYPE_UNKNOWN: "object",
    TYPE_FRACTIONAL: "fractional",
    TYPE_INTEGRAL: "integral",
    TYPE_BOOLEAN: "boolean",
    TYPE_STRING: "string",
}


def _f64(v) -> float:
    """Wire-type-1 payload (8 raw LE bytes) -> double."""
    return struct.unpack("<d", v)[0]


@dataclass
class V0Column:
    name: str
    n: int = 0
    null_count: int = 0  # deprecated counters.null_count wrapper
    true_count: Optional[int] = None
    type_counts: Dict[str, int] = field(default_factory=dict)
    null_type_count: int = 0  # schema.typeCounts[NULL]
    inferred_type: Optional[int] = None
    # distribution (variance message + numbers oneof)
    mean: Optional[float] = None
    m2: Optional[float] = None  # sample variance * (n-1)
    dist_n: Optional[int] = None
    dbl_min: Optional[float] = None
    dbl_max: Optional[float] = None
    dbl_sum: Optional[float] = None
    int_min: Optional[int] = None
    int_max: Optional[int] = None
    int_sum: Optional[int] = None
    # sketches (raw DataSketches wire bytes)
    kll_bytes: Optional[bytes] = None
    hll_bytes: Optional[bytes] = None
    hll_lg_k: Optional[int] = None
    fi_bytes: Optional[bytes] = None
    fi_lg_max_k: Optional[int] = None

    @property
    def stddev(self) -> Optional[float]:
        if self.m2 is None or not self.dist_n or self.dist_n < 2:
            return None
        return math.sqrt(self.m2 / (self.dist_n - 1))

    def kll(self):
        """Decode the histogram bytes (kll FLOATS first — the v0 write
        path — falling back to doubles, mirroring converters.py:301)."""
        if not self.kll_bytes:
            return None
        try:
            return kll_floats_from_ds_bytes(self.kll_bytes)
        except (ValueError, struct.error):
            return kll_from_ds_bytes(self.kll_bytes)

    def frequent_items(self):
        if not self.fi_bytes:
            return None
        return fi_from_ds_bytes(self.fi_bytes)


@dataclass
class V0Profile:
    session_id: str = ""
    session_timestamp_ms: Optional[int] = None
    data_timestamp_ms: Optional[int] = None
    tags: Dict[str, str] = field(default_factory=dict)
    metadata: Dict[str, str] = field(default_factory=dict)
    columns: Dict[str, V0Column] = field(default_factory=dict)


def _parse_str_map_entry(buf: bytes):
    k = v = None
    for f, _w, val in _fields(buf):
        if f == 1:
            k = val.decode("utf-8")
        elif f == 2:
            v = val.decode("utf-8")
    return k, v


def _parse_properties(buf: bytes, prof: V0Profile) -> None:
    for f, _w, v in _fields(buf):
        if f == 3:
            prof.session_id = v.decode("utf-8")
        elif f == 4:
            prof.session_timestamp_ms = _signed(v)
        elif f == 5:
            prof.data_timestamp_ms = _signed(v)
        elif f == 6:
            k, val = _parse_str_map_entry(v)
            if k is not None:
                prof.tags[k] = val
        elif f == 7:
            k, val = _parse_str_map_entry(v)
            if k is not None:
                prof.metadata[k] = val


def _parse_numbers(buf: bytes, col: V0Column) -> None:
    for f, _w, v in _fields(buf):
        if f == 1:  # VarianceMessage
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    col.dist_n = _signed(v2)
                elif f2 == 2:
                    col.m2 = _f64(v2)
                elif f2 == 3:
                    col.mean = _f64(v2)
        elif f == 2:  # DoublesMessage
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    col.dbl_min = _f64(v2)
                elif f2 == 3:
                    col.dbl_max = _f64(v2)
                elif f2 == 4:
                    col.dbl_sum = _f64(v2)
        elif f == 3:  # LongsMessage
            for f2, _w2, v2 in _fields(v):
                if f2 == 2:
                    col.int_min = _signed(v2)
                elif f2 == 3:
                    col.int_max = _signed(v2)
                elif f2 == 4:
                    col.int_sum = _signed(v2)
        elif f == 4:  # histogram: KLL sketch bytes
            col.kll_bytes = bytes(v)


def _parse_column(name: str, buf: bytes) -> V0Column:
    col = V0Column(name=name)
    for f, _w, v in _fields(buf):
        if f == 2:  # CountersV0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    col.n = _signed(v2)
                elif f2 == 2:  # Int64Value wrapper
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            col.true_count = _signed(v3)
                elif f2 == 3:
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            col.null_count = _signed(v3)
        elif f == 3:  # SchemaMessageV0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:  # map<int32, int64> entry
                    tk = tv = None
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            tk = _signed(v3)
                        elif f3 == 2:
                            tv = _signed(v3)
                    if tk is None or tv is None:
                        continue
                    if tk == TYPE_NULL:
                        col.null_type_count = tv
                    elif tk in _TYPE_METRIC:
                        col.type_counts[_TYPE_METRIC[tk]] = tv
                elif f2 == 2:  # InferredType
                    for f3, _w3, v3 in _fields(v2):
                        if f3 == 1:
                            col.inferred_type = v3
        elif f == 4:
            _parse_numbers(v, col)
        elif f == 7:  # FrequentItemsSketchMessageV0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    col.fi_bytes = bytes(v2)
                elif f2 == 2:
                    col.fi_lg_max_k = v2
        elif f == 8:  # HllSketchMessageV0
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    col.hll_bytes = bytes(v2)
                elif f2 == 2:
                    col.hll_lg_k = v2
    return col


def read_v0_profile(path: str) -> V0Profile:
    """Read a varint-delimited ``DatasetProfileMessageV0`` file."""
    with open(path, "rb") as fh:
        data = fh.read()
    if not data:
        raise ValueError("empty v0 profile file")
    n, pos = _read_uvarint(data, 0)
    msg = data[pos:pos + n]
    prof = V0Profile()
    for f, _w, v in _fields(msg):
        if f == 1:
            _parse_properties(v, prof)
        elif f == 2:  # map<string, ColumnMessageV0> entry
            cname = cbuf = None
            for f2, _w2, v2 in _fields(v):
                if f2 == 1:
                    cname = v2.decode("utf-8")
                elif f2 == 2:
                    cbuf = v2
            if cname is not None:
                prof.columns[cname] = _parse_column(cname, cbuf or b"")
    return prof


def v0_to_rows(prof: V0Profile) -> List[dict]:
    """Flatten to one dict per column with the engine's summary paths
    (counts/n, types/*, distribution/mean|stddev|min|max, ints/*) —
    the same shape ``profile(...).to_pandas()`` emits, so a legacy v0
    profile drops into the repo's drift / constraint tooling."""
    rows = []
    for name in sorted(prof.columns):
        c = prof.columns[name]
        kll = c.kll()
        row = {
            "column": name,
            "counts/n": c.n,
            "counts/null": c.null_count or c.null_type_count,
            "counts/true": c.true_count,
            "types/object": c.type_counts.get("object", 0),
            "types/fractional": c.type_counts.get("fractional", 0),
            "types/integral": c.type_counts.get("integral", 0),
            "types/boolean": c.type_counts.get("boolean", 0),
            "types/string": c.type_counts.get("string", 0),
            "distribution/mean": c.mean,
            "distribution/m2": c.m2,
            "distribution/stddev": c.stddev,
            "distribution/n": c.dist_n,
            "distribution/min": kll.min_value if kll and kll.n else None,
            "distribution/max": kll.max_value if kll and kll.n else None,
            "ints/min": c.int_min,
            "ints/max": c.int_max,
        }
        rows.append(row)
    return rows
