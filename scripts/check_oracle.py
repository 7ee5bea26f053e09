"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
through DuckDB on the same parquet, then compares row count, column names,
an order-insensitive multiset of rounded values, AND the pandas dtype
KIND each side presents after DataFrame conversion.

The dtype check is load-bearing: the driver canonicalizes both results
through pandas, and DuckDB's pandas conversion widens HUGEINT (any
``sum`` over integer columns, windowed or grouped) to float64 — so an
oracle column left uncast hashes as ``15000.0`` against Spark's int64
``15000`` and goes red AT THE DRIVER ONLY, because ``fetchall()`` hands
back exact Python ints locally.  That silent class kept
``uplift_curve_orders``/``gains_table_orders`` red for rounds 10-12
while every value-level check (here and two judges' bit-comparisons)
stayed green.  Any integer-producing oracle aggregate must end in
``::BIGINT``.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat(sep=" ")
    return str(v)


def norm_rows(cols, rows):
    # order-insensitive: sort columns by name, then sort row tuples
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def spark_pandas_kinds(schema, cols, rows):
    """The numpy dtype kind each Spark column would present after the
    driver's toPandas conversion: integral/boolean columns WITH nulls
    widen (float64 / object), matching PySpark's pandas conversion."""
    kinds = {}
    for i, f in enumerate(schema.fields):
        t = f.dataType.simpleString()
        has_null = any(r[i] is None for r in rows)
        if t in ("tinyint", "smallint", "int", "bigint"):
            kinds[cols[i]] = "f" if has_null else "i"
        elif t in ("float", "double"):
            kinds[cols[i]] = "f"
        elif t == "boolean":
            kinds[cols[i]] = "O" if has_null else "b"
        elif t.startswith("timestamp"):
            kinds[cols[i]] = "M"
        else:  # string, decimal, date, binary -> object
            kinds[cols[i]] = "O"
    return kinds


def dtype_mismatches(sdf, srows, odf):
    """Columns whose pandas dtype KIND differs between the Spark
    result (driver toPandas semantics) and the DuckDB ``.df()`` frame
    — the exact comparison surface of the driver's hash."""
    skinds = spark_pandas_kinds(sdf.schema, sdf.columns, srows)
    bad = []
    for c in odf.columns:
        ok = odf.dtypes[c].kind
        sk = skinds.get(c)
        if sk is None:
            continue  # column-name mismatch reported separately
        if ok == "u":
            ok = "i"
        if sk != ok:
            bad.append(f"{c}: spark~{sk} vs duckdb~{ok}")
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    # Fail fast on duplicate top-level names in the entry module: a
    # later ``def _q_x`` silently rebinds earlier gate queries (the
    # _q_gini / _q_cusum failure class).  Same check runs in pytest.
    from tests.test_entry_integrity import duplicate_top_level_names

    dupes = duplicate_top_level_names()
    if dupes:
        print(f"FATAL duplicate top-level names in __spark_entry__.py: "
              f"{dupes}")
        return 2

    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("oracle-check")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
            # second execution for the pandas frame: the dtype KINDS
            # after .df() are the driver's actual hash surface
            odf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            kind_bad = dtype_mismatches(sdf, srows, odf)
            if kind_bad:
                problems.append(f"pandas dtype kinds: {kind_bad}")
            sn = norm_rows(scols, [[r[c] for c in scols] for r in srows])
            on = norm_rows(ocols, orows)
            if sn != on:
                diffs = [
                    (a, b) for a, b in zip(sn, on) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diffs}")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
            # Opt-in driver-red debug hook: full per-cell dump (canon
            # strings + %.17g + IEEE bits + round-boundary proximity)
            # for the named query — see scripts/gate_debug.py.
            import os
            if os.environ.get("SPARK_GRAFT_GATE_DEBUG") == name \
                    and sorted(scols) == sorted(ocols):
                from scripts.gate_debug import dump_cell_diffs
                dump_cell_diffs(
                    name, scols,
                    [[r[c] for c in scols] for r in srows],
                    ocols, orows)
        else:
            print(f"OK    {name}: {len(srows)} rows")
    spark.stop()
    return n_fail


if __name__ == "__main__":
    raise SystemExit(main())
