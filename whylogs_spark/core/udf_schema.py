"""UDF-derived columns: the reference's UdfSchema/UdfSpec surface.

Reference: python/whylogs/experimental/core/udf_schema.py:36,165,208-260 —
multi-col -> one col and multi-col -> multi-col UDFs with the
``prefix.output`` naming convention, failure -> null column; plus the
``@register_metric_udf`` decorator registry
(python/whylogs/experimental/core/metrics/udf_metric.py:251).

Spark-first re-expression: a UDF spec compiles to ``withColumn`` calls.
Specs can be:
  * a Spark ``Column`` expression (preferred — stays in codegen), or
  * a pandas function wrapped via ``pandas_udf`` (Arrow-vectorized), with
    the declared return type.
Derived columns then flow through the ordinary profiler, so "UDF metrics"
and UDF-derived columns unify (SURVEY §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class UdfSpec:
    column_names: List[str]                 # input columns
    udfs: Dict[str, object]                 # output name -> Column|fn
    prefix: Optional[str] = None            # reference's "prefix.out" naming
    return_type: str = "double"             # for pandas fns


class UdfSchema:
    def __init__(self, specs: Optional[List[UdfSpec]] = None,
                 drop_columns: Optional[set] = None) -> None:
        self.specs = list(specs or [])
        # columns removed AFTER the UDFs run (UDFs may still read them)
        # — reference: experimental/core/udf_schema.py:194,248-250
        self.drop_columns = set(drop_columns or ())

    def add(self, spec: UdfSpec) -> "UdfSchema":
        self.specs.append(spec)
        return self

    def apply_udfs(self, df: DataFrame,
                   drop_inputs: bool = False) -> DataFrame:
        out = df
        drop: set = set(self.drop_columns)
        for spec in self.specs:
            for name, fn in spec.udfs.items():
                out_name = f"{spec.prefix}.{name}" if spec.prefix else name
                col = _compile_udf(fn, spec, df)
                out = out.withColumn(out_name, col)
            if drop_inputs:
                drop |= set(spec.column_names)
        drop &= set(out.columns)
        if drop:
            out = out.drop(*drop)
        return out


def _compile_udf(fn, spec: UdfSpec, df: DataFrame) -> Column:
    if isinstance(fn, Column):
        return fn
    if not callable(fn):
        raise TypeError(f"unsupported UDF spec value: {type(fn)}")
    cols = [F.col(c) for c in spec.column_names]
    if getattr(fn, "__udf_kind__", None) != "pandas":
        # expression builders (the fast path) return a Column when handed
        # Columns; anything else falls through to the pandas path
        try:
            r = fn(*cols)
            if isinstance(r, Column):
                return r
        except Exception:
            pass
    return F.pandas_udf(fn, spec.return_type)(*cols)


# ------------------------------------------------------------------ registry
_REGISTRY: List[UdfSpec] = []


def register_udf(
    col_names: List[str],
    name: Optional[str] = None,
    prefix: Optional[str] = None,
    return_type: str = "double",
):
    """Decorator mirror of ``@register_metric_udf``: registered UDFs are
    picked up by ``udf_schema()``."""

    def deco(fn):
        out_name = name or fn.__name__
        _REGISTRY.append(
            UdfSpec(col_names, {out_name: fn}, prefix, return_type))
        return fn

    return deco


def pandas_fn(fn):
    """Mark a registered function as a pandas (Arrow) UDF, not an
    expression builder."""
    fn.__udf_kind__ = "pandas"
    return fn


def udf_schema(extra: Optional[List[UdfSpec]] = None,
               drop_columns: Optional[set] = None) -> UdfSchema:
    return UdfSchema(list(_REGISTRY) + list(extra or []), drop_columns)
