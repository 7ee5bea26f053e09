"""markov_attribution vs a hand-rolled absorbing-chain reference."""

import numpy as np
import pytest

from whylogs_spark.ops.events import markov_attribution


def _mk(spark):
    # journeys:
    #  u1: a -> b -> CONV
    #  u2: a -> NULL (no conversion)
    #  u3: b -> CONV
    #  u4: a -> b -> NULL
    rows = [
        (1, 1.0, "a", False), (1, 2.0, "b", False), (1, 3.0, None, True),
        (2, 1.0, "a", False),
        (3, 1.0, "b", False), (3, 2.0, None, True),
        (4, 1.0, "a", False), (4, 2.0, "b", False),
    ]
    return spark.createDataFrame(
        rows, "u long, ts double, ch string, conv boolean")


def _ref_removal(trans, channels):
    """Absorbing chain conversion prob from START, removing one
    channel at a time (edges into the removed channel -> NULL)."""
    def conv_p(removed):
        live = ["__START__"] + [c for c in channels if c != removed]
        idx = {s: i for i, s in enumerate(live)}
        k = len(live)
        q = np.zeros((k, k))
        r = np.zeros(k)
        out = {}
        for (a, b), n in trans.items():
            out[a] = out.get(a, 0.0) + n
        for (a, b), n in trans.items():
            if a not in idx:
                continue
            p = n / out[a]
            if b == "__CONV__":
                r[idx[a]] += p
            elif b in idx:
                q[idx[a], idx[b]] += p
        x = np.linalg.solve(np.eye(k) - q, r)
        return x[idx["__START__"]]
    base = conv_p(None)
    return base, {c: max(base - conv_p(c), 0.0) for c in channels}


class TestMarkovAttribution:
    def test_matches_reference_chain(self, spark):
        out = {r["channel"]: r for r in
               markov_attribution(_mk(spark), "u", "ts", "ch",
                                  "conv").collect()}
        # transition counts from the 4 journeys above:
        trans = {("__START__", "a"): 3.0, ("__START__", "b"): 1.0,
                 ("a", "b"): 2.0, ("a", "__NULL__"): 1.0,
                 ("b", "__CONV__"): 2.0, ("b", "__NULL__"): 1.0}
        base, removal = _ref_removal(trans, ["a", "b"])
        tot = sum(removal.values())
        for c in ("a", "b"):
            assert abs(out[c]["removal_effect"] - removal[c]) < 1e-12
            assert abs(out[c]["attribution_share"]
                       - removal[c] / tot) < 1e-12
        # removing b kills ALL conversions -> b dominates
        assert out["b"]["removal_effect"] > out["a"]["removal_effect"]
        assert abs(sum(r["credited_conversions"]
                       for r in out.values()) - 2.0) < 1e-9

    def test_post_conversion_touches_ignored(self, spark):
        rows = [
            (1, 1.0, "a", False), (1, 2.0, None, True),
            (1, 3.0, "b", False),  # after conv -> must not appear
        ]
        df = spark.createDataFrame(
            rows, "u long, ts double, ch string, conv boolean")
        out = markov_attribution(df, "u", "ts", "ch", "conv").collect()
        assert {r["channel"] for r in out} == {"a"}
        assert out[0]["attribution_share"] == 1.0

    def test_max_channels_guard(self, spark):
        rows = [(i, 1.0, f"c{i}", False) for i in range(30)]
        df = spark.createDataFrame(
            rows, "u long, ts double, ch string, conv boolean")
        with pytest.raises(ValueError, match="max_channels"):
            markov_attribution(df, "u", "ts", "ch", "conv",
                               max_channels=5)
