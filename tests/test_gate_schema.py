"""Every gate query must emit a driver-canonicalizable (atomic) schema.

The driver's correctness gate canonicalizes each query's output with
pandas (sort columns by name, sort row tuples, hash).  A list/struct/map
cell is unhashable there, so any ``queries()`` entry that returns a
nested column fails the gate even when the values are oracle-correct
(round 8: ``frequent_sequences_events``).  This guard builds every gate
query's plan at sf0.001 and asserts the analyzed schema contains only
atomic types — no ArrayType, MapType, or StructType — so no future
operator reintroduces the landmine.
"""

import pytest
from pyspark.sql import types as T

from tests.conftest import SF_DIR

NESTED = (T.ArrayType, T.MapType, T.StructType)


def _atomic_offenders(spark, names):
    import __spark_entry__ as entry

    qs = entry.queries()
    offenders = {}
    for name in names:
        df = qs[name](spark, SF_DIR)
        bad = [f"{f.name}:{f.dataType.simpleString()}"
               for f in df.schema.fields
               if isinstance(f.dataType, NESTED)]
        if bad:
            offenders[name] = bad
    return offenders


def test_gate_window_schema_is_atomic(spark):
    """Smoke tier: the 50 queries the driver actually samples."""
    import __spark_entry__ as entry

    offenders = _atomic_offenders(spark, entry._GATE_ORDER[:50])
    assert not offenders, (
        "driver-window queries with nested output columns (the "
        f"driver's pandas canonicalizer cannot hash them): {offenders}")


def test_every_gate_query_schema_is_atomic(spark):
    """Slow tier (conftest SLOW_TESTS): the full registry, so a future
    rotation can never bring a nested-output query into the window."""
    import __spark_entry__ as entry

    offenders = _atomic_offenders(spark, list(entry.queries()))
    assert not offenders, (
        "gate queries with nested output columns (driver's pandas "
        f"canonicalizer cannot hash them): {offenders}")


def test_gate_order_is_a_registry_subset(spark):
    """The driver samples the first 50 names; they must resolve."""
    import __spark_entry__ as entry

    qs = entry.queries()
    names = list(qs)
    assert len(names) == len(set(names))
    oracles = entry.oracle_sql()
    unknown = [k for k in oracles if k not in qs]
    assert not unknown, f"oracle_sql keys not in queries(): {unknown}"
