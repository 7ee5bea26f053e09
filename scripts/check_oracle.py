"""Local emulation of the driver's correctness gate.

Runs every ``queries()`` entry on Spark at sf0.01 and its ``oracle_sql()``
through DuckDB on the same parquet, then compares row count, column names,
and an order-insensitive multiset of rounded values.

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
