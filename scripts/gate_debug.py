"""Driver-red debugging hook: pin WHICH cell diverges for one query.

The driver's correctness gate reports only booleans (rows/schema/hash
match).  When a row goes red at the driver but green locally (the
r10/r11 ``uplift_curve_orders`` saga), the archaeology is slow because
nothing shows the actual hash inputs.  This tool runs ONE named gate
query through BOTH engines and prints, side by side:

* the canonical hash-input tuples (exactly the normalization the local
  gate uses: floats via ``%.9g``, NaN sentinel, isoformat timestamps,
  columns sorted by name, rows sorted),
* every differing cell with full ``%.17g`` precision AND the raw
  IEEE-754 bit pattern of float cells (two values can share a %.9g
  string yet differ in bits — or share bits and round differently),
* a decimal half-way-boundary proximity report for float cells
  (``|frac(x*10^d) - 0.5|`` for d = 2..8) — the signature of the
  engine-version-defined ``round()`` divergence class.

Usage::

    python scripts/gate_debug.py <query> [sf_dir] [--max-diffs N]

Also honored by scripts/check_oracle.py: setting
``SPARK_GRAFT_GATE_DEBUG=<query>`` in its environment makes a FAIL on
that query dump the same per-cell report inline.
"""

from __future__ import annotations

import math
import struct
import sys

sys.path.insert(0, "/root/repo")

from scripts.check_oracle import TABLES, norm_cell  # noqa: E402


def float_bits(v) -> str:
    if isinstance(v, float):
        return f"0x{struct.unpack('<Q', struct.pack('<d', v))[0]:016x}"
    return "-"


def boundary_report(v) -> str:
    """Closest decimal half-way boundary over digits 2..8."""
    if not isinstance(v, float) or math.isnan(v) or math.isinf(v):
        return "-"
    best_d, best = None, 1.0
    for d in range(2, 9):
        scaled = v * (10.0 ** d)
        if abs(scaled) > 2 ** 52:
            break
        dist = abs(scaled - math.floor(scaled) - 0.5)
        if dist < best:
            best, best_d = dist, d
    return f"d={best_d} dist={best:.3e}" if best_d is not None else "-"


def dump_cell_diffs(name, scols, srows, ocols, orows, max_diffs=20):
    """Print per-cell diffs between canonicalized Spark/oracle frames.

    Returns the number of differing cells.  Shared by this CLI and the
    check_oracle SPARK_GRAFT_GATE_DEBUG hook.
    """
    order_s = sorted(range(len(scols)), key=lambda i: scols[i])
    order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
    cols = [scols[i] for i in order_s]

    def canon(rows, order):
        keyed = [
            (tuple(norm_cell(r[i]) for i in order),
             tuple(r[i] for i in order))
            for r in rows
        ]
        return sorted(keyed, key=lambda kr: kr[0])

    s_sorted = canon(srows, order_s)
    o_sorted = canon(orows, order_o)

    def raw_eq(a, b):
        # bit-level equality for floats (NaN == NaN; -0.0 != 0.0 —
        # a stricter compare than any engine's hash can be)
        if isinstance(a, float) and isinstance(b, float):
            return struct.pack("<d", a) == struct.pack("<d", b)
        return a == b

    print(f"\n=== {name}: canonical hash inputs "
          f"({len(s_sorted)} spark rows / {len(o_sorted)} oracle rows, "
          f"cols sorted: {cols}) ===")
    n_diff = 0
    for ridx, ((sk, sraw), (ok, oraw)) in enumerate(
            zip(s_sorted, o_sorted)):
        for cidx, cname in enumerate(cols):
            canon_eq = sk[cidx] == ok[cidx]
            if canon_eq and raw_eq(sraw[cidx], oraw[cidx]):
                continue
            # canon-equal but bit-different cells are the driver-red
            # signature: the local %.9g gate passes while a stricter
            # (or differently-rounding) driver hash can diverge
            tag = ("CANON-EQUAL, BIT-DIFF" if canon_eq
                   else "CANON-DIFF")
            n_diff += 1
            if n_diff > max_diffs:
                continue
            sv, ov = sraw[cidx], oraw[cidx]
            print(f"row#{ridx} col={cname} [{tag}]")
            print(f"  spark : norm={sk[cidx]!r:<24} "
                  f"%.17g={sv:.17g}" if isinstance(sv, float)
                  else f"  spark : norm={sk[cidx]!r} raw={sv!r}")
            if isinstance(sv, float):
                print(f"          bits={float_bits(sv)} "
                      f"boundary[{boundary_report(sv)}]")
            print(f"  oracle: norm={ok[cidx]!r:<24} "
                  f"%.17g={ov:.17g}" if isinstance(ov, float)
                  else f"  oracle: norm={ok[cidx]!r} raw={ov!r}")
            if isinstance(ov, float):
                print(f"          bits={float_bits(ov)} "
                      f"boundary[{boundary_report(ov)}]")
    extra = abs(len(s_sorted) - len(o_sorted))
    if extra:
        print(f"  (+{extra} unpaired rows on the longer side)")
    if n_diff > max_diffs:
        print(f"  ... {n_diff - max_diffs} more differing cells")
    print(f"=== {name}: {n_diff} differing cells ===")
    return n_diff


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 and not \
        sys.argv[2].startswith("--") else "/root/testdata/sf0.01"
    max_diffs = 20
    if "--max-diffs" in sys.argv:
        max_diffs = int(sys.argv[sys.argv.index("--max-diffs") + 1])

    import duckdb
    from pyspark.sql import SparkSession

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if name not in qs:
        print(f"unknown query {name!r}")
        return 2
    if name not in oracles:
        print(f"{name} is rows-only (no oracle); nothing to diff")
        return 0

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .appName("gate-debug")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    sdf = qs[name](spark, sf_dir)
    scols, srows = sdf.columns, sdf.collect()
    res = con.execute(oracles[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    if sorted(scols) != sorted(ocols):
        print(f"SCHEMA MISMATCH: {sorted(scols)} vs {sorted(ocols)}")
        spark.stop()
        return 1
    n = dump_cell_diffs(name, scols,
                        [[r[c] for c in scols] for r in srows],
                        ocols, orows, max_diffs)
    spark.stop()
    return 1 if n else 0


if __name__ == "__main__":
    raise SystemExit(main())
