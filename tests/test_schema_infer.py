"""Tests for ops.schema_infer (semantic-type inference)."""

import json
import uuid

import pytest

from whylogs_spark.ops.schema_infer import (SEMANTIC_PROBES,
                                            infer_semantic_types)


def test_infers_all_probe_types(spark):
    rows = []
    for i in range(200):
        rows.append((
            str(i),                                   # integer
            f"{i}.5",                                 # decimal
            f"2024-01-{(i % 28) + 1:02d}",            # date
            f"2024-01-01T12:{i % 60:02d}:00Z",        # datetime
            f"u{i}@example.com",                      # email
            f"https://example.com/p/{i}",             # url
            str(uuid.UUID(int=i)),                    # uuid
            f"10.0.{i % 256}.{(i * 7) % 256}",        # ipv4
            "true" if i % 2 else "no",                # boolean
            json.dumps({"a": i}),                     # json
            "red" if i % 3 else "blue",               # categorical
            f"free text value number {i} with words",  # text
            None if i % 2 else "",                    # empty
        ))
    schema = ("i string, d string, dt string, dtt string, em string, "
              "u string, uu string, ip string, b string, js string, "
              "cat string, txt string, e string")
    df = spark.createDataFrame(rows, schema)
    out = {r.column: r for r in infer_semantic_types(df).collect()}
    expected = dict(i="integer", d="decimal", dt="date", dtt="datetime",
                    em="email", u="url", uu="uuid", ip="ipv4",
                    b="boolean", js="json", cat="categorical",
                    txt="text", e="empty")
    assert {c: r.inferred_type for c, r in out.items()} == expected
    # specificity: integers also match the decimal probe, but the
    # integer probe wins by order
    assert out["i"].ratio_decimal == pytest.approx(1.0)
    assert out["i"].inferred_type == "integer"
    # counts surface correctly
    assert out["e"].n == 200 and out["e"].n_nonnull == 100
    assert out["e"].n_empty == 100
    assert out["cat"].n_distinct == 2


def test_threshold_and_exact_distinct(spark):
    # 10% junk pushes integers under the 0.95 default threshold
    rows = [(str(i),) for i in range(90)] + [("x",)] * 10
    df = spark.createDataFrame(rows, "c string")
    r = infer_semantic_types(df, distinct="exact").collect()[0]
    assert r.inferred_type == "text"
    assert r.ratio_integer == pytest.approx(0.9)
    assert r.n_distinct == 91
    r2 = infer_semantic_types(df, match_threshold=0.9,
                              distinct="exact").collect()[0]
    assert r2.inferred_type == "integer"
    with pytest.raises(ValueError, match="distinct"):
        infer_semantic_types(df, distinct="hll")
    with pytest.raises(ValueError, match="not a string"):
        infer_semantic_types(
            spark.createDataFrame([(1,)], "n long"), columns=["n"])
    with pytest.raises(ValueError, match="no string columns"):
        infer_semantic_types(spark.createDataFrame([(1,)], "n long"))


def test_probe_battery_is_anchored():
    # every probe must be fully anchored — a partial match engine
    # (DuckDB regexp_matches) and Java rlike then agree
    for name, pat in SEMANTIC_PROBES:
        core = pat[len("^(?i)"):] if pat.startswith("^(?i)") else pat
        assert pat.startswith("^") and pat.endswith("$"), name
        assert core  # non-empty body
