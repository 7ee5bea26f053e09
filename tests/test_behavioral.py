"""Tests for funnel, retention_cohorts, transition_matrix
(ops.events behavioral analytics)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from whylogs_spark.ops.events import (
    funnel,
    retention_cohorts,
    transition_matrix,
)

BASE = dt.datetime(2024, 3, 1)


def _ev(rows, spark):
    return spark.createDataFrame(
        [(u, BASE + dt.timedelta(minutes=m), e) for u, m, e in rows],
        "user_id long, ts timestamp, event_type string")


# ------------------------------------------------------------ funnel

def test_funnel_ordered_matching(spark):
    rows = [
        # u1 completes the whole funnel in order
        (1, 0, "view"), (1, 1, "click"), (1, 2, "buy"),
        # u2 clicks BEFORE viewing: click doesn't count, re-click absent
        (2, 0, "click"), (2, 1, "view"),
        # u3 views only
        (3, 0, "view"),
        # u4 never enters the funnel
        (4, 0, "other"),
        # u5: view and click at the SAME instant -> both advance
        (5, 0, "view"), (5, 0, "click"),
    ]
    out = {r.step_index: r for r in
           funnel(_ev(rows, spark), ["view", "click", "buy"]).collect()}
    assert [out[i].step for i in (1, 2, 3)] == ["view", "click", "buy"]
    assert out[1].n_users == 4  # u1 u2 u3 u5
    assert out[2].n_users == 2  # u1 u5 (u2's click precedes its view)
    assert out[3].n_users == 1  # u1
    assert out[1].conversion_from_first == pytest.approx(1.0)
    assert out[2].conversion_from_first == pytest.approx(0.5)
    assert out[2].conversion_from_previous == pytest.approx(0.5)
    assert out[3].conversion_from_previous == pytest.approx(0.5)
    assert out[1].conversion_from_previous is None


def test_funnel_reentry_uses_earliest_qualifying(spark):
    # u1: view@0, buy@1, click@2, buy@3 -> click matches at 2, buy at 3
    rows = [(1, 0, "view"), (1, 1, "buy"), (1, 2, "click"),
            (1, 3, "buy")]
    out = {r.step: r.n_users for r in
           funnel(_ev(rows, spark), ["view", "click", "buy"]).collect()}
    assert out == {"view": 1, "click": 1, "buy": 1}


def test_funnel_validation_and_empty(spark):
    df = _ev([(1, 0, "view")], spark)
    with pytest.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])
    with pytest.raises(ValueError, match="duplicate"):
        funnel(df, ["view", "view"])
    empty = funnel(df.filter("user_id < 0"),
                   ["view", "click"]).collect()
    assert [r.n_users for r in empty] == [0, 0]
    assert all(r.conversion_from_first is None for r in empty)


# ------------------------------------------------- retention cohorts

def test_retention_cohorts_day_grain(spark):
    def at(day, u):
        return (u, day * 24 * 60, "x")
    rows = [at(0, 1), at(1, 1), at(3, 1),   # u1: cohort d0, back d1 d3
            at(0, 2),                        # u2: cohort d0 only
            at(1, 3), at(3, 3)]              # u3: cohort d1, back d3
    out = {(r.cohort, r.offset): r for r in retention_cohorts(
        _ev(rows, spark), grain="day").collect()}
    d0 = BASE.replace(hour=0)
    d1 = d0 + dt.timedelta(days=1)
    assert out[(d0, 0)].cohort_size == 2
    assert out[(d0, 0)].retention == pytest.approx(1.0)
    assert out[(d0, 1)].n_active == 1   # u1
    assert out[(d0, 1)].retention == pytest.approx(0.5)
    assert out[(d0, 3)].n_active == 1   # u1
    assert out[(d1, 0)].cohort_size == 1  # u3
    assert out[(d1, 2)].n_active == 1     # u3 on d3 = offset 2
    assert (d0, 2) not in out  # no-activity offsets are absent
    capped = retention_cohorts(_ev(rows, spark), grain="day",
                               max_offset=1).collect()
    assert max(r.offset for r in capped) == 1
    with pytest.raises(ValueError, match="grain"):
        retention_cohorts(_ev(rows, spark), grain="month")


def test_retention_duplicate_events_count_once(spark):
    rows = [(1, 0, "a"), (1, 5, "b"),          # same day twice
            (1, 24 * 60, "a"), (1, 24 * 60 + 1, "a")]
    out = retention_cohorts(_ev(rows, spark), grain="day").collect()
    assert {(r.offset, r.n_active) for r in out} == {(0, 1), (1, 1)}


# ------------------------------------------------ transition matrix

def test_transition_matrix_counts_and_probs(spark):
    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "a"), (1, 3, "c"),
        (2, 0, "a"), (2, 1, "b"),
    ]
    out = {(r.src, r.dst): r for r in
           transition_matrix(_ev(rows, spark)).collect()}
    assert out[("a", "b")].n_transitions == 2
    assert out[("b", "a")].n_transitions == 1
    assert out[("a", "c")].n_transitions == 1
    # row-normalized: from 'a' -> b 2/3, c 1/3
    assert out[("a", "b")].probability == pytest.approx(2 / 3)
    assert out[("a", "c")].probability == pytest.approx(1 / 3)
    assert out[("b", "a")].probability == pytest.approx(1.0)
    # no cross-user transition (u1's last 'c' -> u2's first 'a')
    assert ("c", "a") not in out


def test_transition_matrix_tie_order_deterministic(spark):
    # same-instant events order by event name: a -> b, not b -> a
    rows = [(1, 0, "b"), (1, 0, "a")]
    out = transition_matrix(_ev(rows, spark)).collect()
    assert len(out) == 1
    assert (out[0].src, out[0].dst) == ("a", "b")


def test_frequent_sequences(spark):
    from whylogs_spark.ops.events import frequent_sequences

    rows = [
        (1, 0, "a"), (1, 1, "b"), (1, 2, "c"), (1, 3, "a"),
        (1, 4, "b"), (1, 5, "c"),
        (2, 0, "a"), (2, 1, "b"), (2, 2, "c"),
        (3, 0, "x"), (3, 1, "x"),  # too short for n=3
    ]
    out = frequent_sequences(_ev(rows, spark), n=3, k=5).collect()
    top = out[0]
    assert top.sequence == ["a", "b", "c"]
    assert top.n_occurrences == 3  # u1 twice (overlapping ok), u2 once
    assert top.n_users == 2
    # no sequence crosses users or includes incomplete tails
    assert all(len(r.sequence) == 3 and None not in r.sequence
               for r in out)
    seqs = [tuple(r.sequence) for r in out]
    assert ("c", "a", "b") in seqs and ("x", "x", "x") not in seqs
    # n=2 agrees with the transition matrix counts
    pairs = {tuple(r.sequence): r.n_occurrences for r in
             frequent_sequences(_ev(rows, spark), n=2, k=50).collect()}
    tm = {(r.src, r.dst): r.n_transitions for r in
          transition_matrix(_ev(rows, spark)).collect()}
    assert pairs == tm  # exact: no spurious or missing sequences
    with pytest.raises(ValueError, match="n must be"):
        frequent_sequences(_ev(rows, spark), n=1)
    with pytest.raises(ValueError, match="k must be"):
        frequent_sequences(_ev(rows, spark), n=2, k=0)


def test_transition_matrix_bucketed_parity(spark):
    """The two-phase hot-user plan must produce EXACTLY the single-
    phase counts — including bridges across bucket boundaries and
    same-instant ties at a boundary."""
    import random

    rng = random.Random(21)
    rows = []
    for uid in range(1, 8):
        m = 0
        for _ in range(rng.randint(3, 40)):
            m += rng.randint(0, 90)  # spans several 1-hour buckets
            rows.append((uid, m, rng.choice("abcx")))
        rows.append((uid, m, "a"))  # a tie at the last instant
    df = _ev(rows, spark)
    single = {(r.src, r.dst): r.n_transitions for r in
              transition_matrix(df).collect()}
    bucketed = {(r.src, r.dst): r.n_transitions for r in
                transition_matrix(
                    df, hot_user_buckets="1 hour").collect()}
    assert single == bucketed
    with pytest.raises(ValueError, match="positive"):
        transition_matrix(df, hot_user_buckets="-1 hour")


def test_streaming_transitions_matches_batch(spark, tmp_path):
    """Transition pairs from the stateful streaming operator, counted
    by transition_counts_from_pairs, must equal the batch
    transition_matrix — including pairs BRIDGED across microbatches
    (the second file continues each user's sequence)."""
    from whylogs_spark.streaming.transitions import (
        streaming_transitions,
        transition_counts_from_pairs,
    )

    rows1, rows2 = [], []
    for uid in (1, 2, 3):
        seq = ["view", "click", "view", "purchase", "click"]
        for i, e in enumerate(seq[:3]):
            rows1.append((uid, BASE + dt.timedelta(minutes=i), e))
        for i, e in enumerate(seq[3:], start=3):
            rows2.append((uid, BASE + dt.timedelta(minutes=i), e))
    schema = "user_id long, ts timestamp, event_type string"
    b1 = spark.createDataFrame(rows1, schema)
    b2 = spark.createDataFrame(rows2, schema)

    src = str(tmp_path / "trans_src")
    b1.coalesce(1).write.parquet(src + "/b=0")
    b2.coalesce(1).write.parquet(src + "/b=1")

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(src + "/*"))
    out = streaming_transitions(stream, watermark="0 seconds",
                                idle_ttl="1 hour")
    q = (out.writeStream.format("memory").queryName("trans")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    pairs = spark.sql("SELECT * FROM trans")
    # every user contributes the bridged view->purchase transition
    got = {(r.src, r.dst, r.n_transitions) for r in
           transition_counts_from_pairs(pairs).collect()}
    batch = spark.createDataFrame(rows1 + rows2, schema)
    expect = {(r.src, r.dst, r.n_transitions) for r in
              transition_matrix(batch).collect()}
    assert got == expect
    assert ("view", "purchase", 3) in got  # the cross-batch bridge


def test_streaming_transitions_generic_types_and_microseconds(
        spark, tmp_path):
    """String user keys and sub-millisecond timestamps survive: the
    schemas derive from the input types and event times round-trip at
    microsecond precision."""
    from whylogs_spark.streaming.transitions import streaming_transitions

    t0 = BASE + dt.timedelta(microseconds=900)
    t1 = BASE + dt.timedelta(microseconds=1500)
    rows = [("alice", t0, "view"), ("alice", t1, "click")]
    schema = "user_id string, ts timestamp, event_type string"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(tmp_path / "src") + "/b=0")
    stream = (spark.readStream.schema(schema)
              .parquet(str(tmp_path / "src") + "/*"))
    out = streaming_transitions(stream, watermark="0 seconds",
                                idle_ttl="1 hour")
    q = (out.writeStream.format("memory").queryName("trans_us")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM trans_us").collect()
    assert len(got) == 1
    r = got[0]
    assert r.user_id == "alice" and (r.src, r.dst) == ("view", "click")
    assert r.ts == t1  # microseconds preserved


# ------------------------------------------------ association rules

def test_association_rules_planted(spark):
    """Planted affinity: coffee & milk co-occur in most baskets,
    tea appears alone — support/confidence/lift must recover it."""
    from whylogs_spark.ops.basket import association_rules

    rows = []
    for u in range(8):                       # coffee+milk baskets
        rows += [(f"u{u}", "coffee"), (f"u{u}", "milk")]
    for u in range(8, 10):                   # coffee-only
        rows += [(f"u{u}", "coffee")]
    for u in range(10, 12):                  # tea-only
        rows += [(f"u{u}", "tea")]
    rows += [("u0", "coffee")]               # dup event: sets dedupe
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    out = {(r.antecedent, r.consequent): r for r in association_rules(
        df, item_col="event_type", min_support=0.05).collect()}
    r = out[("coffee", "milk")]
    assert (r.n_both, r.n_ant, r.n_cons, r.n_users) == (8, 10, 8, 12)
    assert r.support == pytest.approx(8 / 12)
    assert r.confidence == pytest.approx(8 / 10)
    assert r.lift == pytest.approx((8 / 10) / (8 / 12))
    rev = out[("milk", "coffee")]
    assert rev.confidence == pytest.approx(1.0)
    assert rev.lift == pytest.approx(r.lift)  # lift is symmetric
    assert ("tea", "coffee") not in out and ("coffee", "tea") not in out


def test_association_rules_cap_and_validation(spark):
    from whylogs_spark.ops.basket import association_rules

    rows = [("bot", f"i{i}") for i in range(50)]
    rows += [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "user_id string, event_type string")
    out = association_rules(df, min_support=0.01,
                            max_items_per_user=10).collect()
    # the bot basket is dropped whole: no i* rules, n_users excludes it
    assert all(not r.antecedent.startswith("i") for r in out)
    assert all(r.n_users == 2 for r in out)
    assert {(r.antecedent, r.consequent) for r in out} == \
        {("x", "y"), ("y", "x")}
    with pytest.raises(ValueError, match="min_support"):
        association_rules(df, min_support=0.0)
    with pytest.raises(ValueError, match="max_items_per_user"):
        association_rules(df, max_items_per_user=1)


def test_funnel_conversion_windows(spark):
    """within (anchor window) and step_within (per-step gap) windows:
    events matching the awaited step but outside a window must not
    advance the fold."""
    from whylogs_spark.ops.events import funnel

    t0 = dt.datetime(2024, 1, 1)

    def S(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("u1", "view", S(0)), ("u1", "click", S(10)),
        ("u1", "buy", S(20)),                       # fast completion
        ("u2", "view", S(0)), ("u2", "click", S(1000)),
        ("u2", "buy", S(2000)),                     # slow completion
        ("u3", "view", S(0)), ("u3", "click", S(5)),
        ("u3", "buy", S(900)),                      # big click->buy gap
        ("u4", "view", S(0)), ("u4", "click", S(400)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")

    def counts(**kw):
        return {r.step: r.n_users for r in
                funnel(df, ["view", "click", "buy"], **kw).collect()}

    assert counts() == {"view": 4, "click": 4, "buy": 3}
    assert counts(within=100) == {"view": 4, "click": 2, "buy": 1}
    assert counts(step_within=100) == {"view": 4, "click": 2, "buy": 1}
    assert counts(within=100, step_within=30) == \
        {"view": 4, "click": 2, "buy": 1}
    # boundary is inclusive: exactly at the window edge still counts
    assert counts(within=400) == {"view": 4, "click": 3, "buy": 1}
    with pytest.raises(ValueError, match="within"):
        funnel(df, ["view", "click"], within=-1)
    with pytest.raises(ValueError, match="step_within"):
        funnel(df, ["view", "click"], step_within=-1)


def test_funnel_step_within_is_exists_a_chain(spark):
    """step_within must count a user whenever ANY window-satisfying
    chain exists, not just the greedy earliest-match one: A@0, B@1,
    B@9, C@15 at step_within=10 converts via A->B@9->C@15 even though
    the greedy match (B@1) would end C's window at 11."""
    from whylogs_spark.ops.events import funnel

    t0 = dt.datetime(2024, 1, 1)

    def S(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("u1", "A", S(0)), ("u1", "B", S(1)), ("u1", "B", S(9)),
        ("u1", "C", S(15)),
        # greedy and chain agree here: no B re-occurrence in window
        ("u2", "A", S(0)), ("u2", "B", S(1)), ("u2", "C", S(15)),
        # a later A re-anchor also rescues the chain: A@0,B@20 fails
        # but A@15,B@20 is in-window
        ("u3", "A", S(0)), ("u3", "A", S(15)), ("u3", "B", S(20)),
    ]
    df = spark.createDataFrame(
        rows, "user_id string, event_type string, ts timestamp")
    got = {r.step: r.n_users for r in
           funnel(df, ["A", "B", "C"], step_within=10).collect()}
    assert got == {"A": 3, "B": 3, "C": 1}
    # the fixed anchor of `within` is unaffected: u3's second A does
    # NOT extend the whole-funnel window
    got2 = {r.step: r.n_users for r in
            funnel(df, ["A", "B", "C"], within=10).collect()}
    assert got2 == {"A": 3, "B": 2, "C": 0}
