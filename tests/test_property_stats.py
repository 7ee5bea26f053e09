"""Property-based tests (hypothesis) for the round-7 statistical
operators: invariants that must hold on ARBITRARY data, not just the
fixtures — monotonicity, boundedness, idempotence."""

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from whylogs_spark.core.drift import adjust_pvalues
from whylogs_spark.core.summaries import gini_coefficient, winsorize
from whylogs_spark.ops.events import funnel
from whylogs_spark.ops.survival import km_survival

_slow = settings(max_examples=12, deadline=None,
                 suppress_health_check=[HealthCheck.function_scoped_fixture])

_pos = st.floats(min_value=0.0, max_value=1e6, allow_nan=False,
                 allow_infinity=False)


@_slow
@given(vals=st.lists(_pos, min_size=2, max_size=60))
def test_gini_bounded_and_scale_invariant(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    g = gini_coefficient(df, "x").collect()[0].gini
    if sum(vals) == 0:
        assert g is None
        return
    assert -1e-9 <= g <= 1.0 + 1e-9
    # scale invariance: multiplying every value by a constant
    scaled = spark.createDataFrame([(float(v) * 7.5,) for v in vals],
                                   "x double")
    g2 = gini_coefficient(scaled, "x").collect()[0].gini
    assert abs(g - g2) < 1e-9


@_slow
@given(vals=st.lists(
    st.floats(min_value=-1e6, max_value=1e6, allow_nan=False,
              allow_infinity=False), min_size=3, max_size=50))
def test_winsorize_idempotent_and_bounded(spark, vals):
    df = spark.createDataFrame([(i, float(v)) for i, v in
                                enumerate(vals)], "id long, x double")
    once = winsorize(df, "x", 0.1, 0.9)
    rows = {r.id: r.x_winsorized for r in once.collect()}
    lo, hi = min(rows.values()), max(rows.values())
    # every clipped value is an existing data value within bounds
    for v in rows.values():
        assert lo <= v <= hi
        assert any(abs(v - orig) < 1e-12 for orig in vals)
    # idempotence: winsorizing the winsorized column is a no-op
    again = winsorize(
        once.select("id", once.x_winsorized.alias("x")), "x", 0.1, 0.9)
    rows2 = {r.id: r.x_winsorized for r in again.collect()}
    for k in rows:
        assert abs(rows[k] - rows2[k]) < 1e-12


@_slow
@given(ps=st.lists(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    min_size=1, max_size=30))
def test_bh_adjusted_bounds_and_dominates_raw(spark, ps):
    df = spark.createDataFrame(
        [(f"t{i}", float(p)) for i, p in enumerate(ps)],
        "test_id string, p double")
    out = adjust_pvalues(df, "p", "test_id", method="bh").collect()
    by_p = sorted(out, key=lambda r: (r.p, r.test_id))
    for r in out:
        assert r.p - 1e-12 <= r.p_adjusted <= 1.0 + 1e-12
    # monotone: adjusted values non-decreasing in raw-p order
    adj = [r.p_adjusted for r in by_p]
    assert all(a <= b + 1e-12 for a, b in zip(adj, adj[1:]))


@_slow
@given(data=st.lists(
    st.tuples(st.integers(min_value=1, max_value=6),
              st.integers(min_value=0, max_value=100),
              st.sampled_from(["a", "b", "c", "x"])),
    min_size=1, max_size=80))
def test_funnel_counts_monotone_nonincreasing(spark, data):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(u, base + dt.timedelta(minutes=m), e) for u, m, e in data],
        "user_id long, ts timestamp, event_type string")
    out = sorted(funnel(df, ["a", "b", "c"]).collect(),
                 key=lambda r: r.step_index)
    counts = [r.n_users for r in out]
    assert all(x >= y for x, y in zip(counts, counts[1:]))
    assert all(c >= 0 for c in counts)


@_slow
@given(pairs=st.lists(
    st.tuples(st.integers(min_value=1, max_value=25),
              st.booleans()),
    min_size=1, max_size=60))
def test_km_survival_monotone_in_unit_interval(spark, pairs):
    df = spark.createDataFrame(
        [(float(d), e) for d, e in pairs], "dur double, ev boolean")
    out = sorted(km_survival(df, "dur", "ev").collect(),
                 key=lambda r: r.t)
    s = [r.survival for r in out]
    assert all(0.0 - 1e-12 <= v <= 1.0 + 1e-12 for v in s)
    assert all(a >= b - 1e-12 for a, b in zip(s, s[1:]))
    # at-risk counts strictly decrease over distinct times
    n = [r.n_risk for r in out]
    assert all(a > b for a, b in zip(n, n[1:]))
    assert n[0] == len(pairs)
