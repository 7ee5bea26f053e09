"""Type lattice: Spark DataType -> whylogs-style value type.

Mirrors the reference's type system (reference:
python/whylogs/core/datatypes.py:45-131): Integral / Fractional / String /
Bool / Tensor / Object, with datetimes handled separately (the reference
excludes datetime64 from Integral and lets them fall through to AnyType;
we do strictly better by tracking temporal min/max + cardinality).

Spark columns are statically typed, so the per-value dispatch of the
reference (python/whylogs/core/preprocessing.py:307) collapses into a
single driver-side mapping from ``StructField.dataType``.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import types as T


class ValueType(str, Enum):
    INTEGRAL = "integral"
    FRACTIONAL = "fractional"
    BOOLEAN = "boolean"
    STRING = "string"
    TEMPORAL = "temporal"
    TENSOR = "tensor"
    OBJECT = "object"


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType, T.DecimalType)
_TEMPORAL = (T.TimestampType, T.DateType, T.TimestampNTZType)


def value_type_of(dt: T.DataType) -> ValueType:
    if isinstance(dt, _INTEGRAL):
        return ValueType.INTEGRAL
    if isinstance(dt, _FRACTIONAL):
        return ValueType.FRACTIONAL
    if isinstance(dt, T.BooleanType):
        return ValueType.BOOLEAN
    if isinstance(dt, T.StringType):
        return ValueType.STRING
    if isinstance(dt, _TEMPORAL):
        return ValueType.TEMPORAL
    if isinstance(dt, T.ArrayType) and isinstance(
        dt.elementType, _INTEGRAL + _FRACTIONAL
    ):
        return ValueType.TENSOR
    return ValueType.OBJECT


def is_numeric(vt: ValueType) -> bool:
    return vt in (ValueType.INTEGRAL, ValueType.FRACTIONAL, ValueType.BOOLEAN)


def is_discrete(vt: ValueType) -> bool:
    """Columns whose values are hashed/stringified for cardinality + FI."""
    return vt in (
        ValueType.INTEGRAL,
        ValueType.STRING,
        ValueType.BOOLEAN,
        ValueType.TEMPORAL,
        ValueType.FRACTIONAL,
    )
