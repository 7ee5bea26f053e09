"""Round-boundary sensitivity sweep over every gate query.

Why: ``round(x, d)`` half-way behavior is ENGINE-VERSION-DEFINED — the
driver's DuckDB and the local DuckDB can disagree on a cell whose
pre-round value sits within an ulp of a decimal half-way boundary
(``x * 10^d`` ~ ``k + 0.5``).  That exact failure made
``uplift_curve_orders`` / ``gains_table_orders`` driver-red for two
rounds while bit-exact locally (r11 verdict, What's wrong #1).  This
sweep finds every OTHER gate query carrying the same latent risk
*before* the driver's DuckDB next upgrades.

How: the entry module references the shared ``pyspark.sql.functions``
module through its module-global ``F``.  We rebind ``__spark_entry__.F``
to a proxy whose ``round(col, d)`` emits the DISTANCE from
``frac(col * 10^d)`` to 0.5 instead of rounding (everything else
delegates to the real module — whylogs_spark internals are untouched
because they import ``F`` themselves).  The proxy also wraps the
returned Column so ``.alias(name)`` records which OUTPUT columns came
from a round call; per query we then aggregate ``min`` over exactly
those columns.  A tiny minimum means a rounded cell hugs a half-way
boundary:

* ``dist < 1e-9``  -> RED: realistically flappable across engines
* ``dist < 1e-6``  -> AMBER: worth a manual look at the value grid

Usage::

    python scripts/round_boundary_sweep.py /root/testdata/sf0.01 [query ...]

Exit 1 only on RED rows.  Writes a JSON report next to the repo root
(``round_boundary_report.json``) with per-query minima.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as _real_F  # noqa: E402


class _ColProxy:
    """Wraps the distance Column so .alias() records the output name."""

    def __init__(self, col, sink):
        self._col = col
        self._sink = sink

    def alias(self, name, **kw):
        self._sink.append(name)
        return self._col.alias(name, **kw)

    def __getattr__(self, name):
        return getattr(self._col, name)


class _FProxy:
    """pyspark.sql.functions facade: round() -> half-way distance."""

    def __init__(self, sink):
        self._sink = sink

    def round(self, col, scale=0):
        c = _real_F.col(col) if isinstance(col, str) else col
        scaled = c.cast("double") * _real_F.lit(float(10 ** scale))
        frac = scaled - _real_F.floor(scaled)
        return _ColProxy(_real_F.abs(frac - _real_F.lit(0.5)),
                         self._sink)

    def __getattr__(self, name):
        return getattr(_real_F, name)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry

    sink: list[str] = []
    entry.F = _FProxy(sink)  # gate projections only; ops import their own F

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in qs if n in oracles and (not only or n in only)]

    report, red, amber = {}, [], []
    for name in names:
        sink.clear()
        try:
            df = qs[name](spark, sf_dir)
        except Exception as exc:  # plan-time guard collects etc.
            report[name] = {"err": f"build: {exc}"[:200]}
            continue
        cols = [c for c in dict.fromkeys(sink) if c in df.columns]
        if not cols:
            report[name] = {"rounded_cols": 0}
            continue
        try:
            row = df.select(
                [_real_F.min(_real_F.col(c)).alias(c) for c in cols]
            ).collect()[0]
        except Exception as exc:
            report[name] = {"err": f"exec: {exc}"[:200]}
            continue
        dists = {c: row[c] for c in cols if row[c] is not None}
        if not dists:
            report[name] = {"rounded_cols": len(cols), "min_dist": None}
            continue
        worst_col = min(dists, key=dists.get)
        md = dists[worst_col]
        report[name] = {
            "rounded_cols": len(cols),
            "min_dist": md,
            "worst_col": worst_col,
        }
        if md < 1e-9:
            red.append((name, worst_col, md))
        elif md < 1e-6:
            amber.append((name, worst_col, md))
        tag = "RED " if md < 1e-9 else ("AMBER" if md < 1e-6 else "ok  ")
        print(f"{tag}  {name}: min |frac-0.5| = {md:.3e} ({worst_col})")

    with open("/root/repo/round_boundary_report.json", "w") as f:
        json.dump(report, f, indent=1, sort_keys=True)
        f.write("\n")

    print(f"\nswept {len(report)} queries: "
          f"{len(red)} RED, {len(amber)} AMBER")
    for name, col, d in red:
        print(f"  RED   {name}.{col}  dist={d:.3e}")
    for name, col, d in amber:
        print(f"  AMBER {name}.{col}  dist={d:.3e}")
    spark.stop()
    return 1 if red else 0


if __name__ == "__main__":
    raise SystemExit(main())
