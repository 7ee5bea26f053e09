"""attribution_report vs a hand-rolled python reference."""

import pytest

from whylogs_spark.ops.events import attribution_report


def _mk(spark):
    # user 1: a@1, b@2, c@3, CONV@4 ; another CONV@6 (after c)
    # user 2: b@1, CONV@2
    # user 3: CONV@5 with no touches -> unattributed
    rows = [
        (1, 1.0, "a", False), (1, 2.0, "b", False),
        (1, 3.0, "c", False), (1, 4.0, None, True),
        (1, 6.0, None, True),
        (2, 1.0, "b", False), (2, 2.0, None, True),
        (3, 5.0, None, True),
    ]
    return spark.createDataFrame(
        rows, "u long, ts double, ch string, conv boolean")


class TestAttribution:
    def test_last_touch(self, spark):
        out = {r["channel"]: r for r in attribution_report(
            _mk(spark), "u", "ts", "ch", "conv",
            model="last_touch").collect()}
        # conv(1,4): last=c ; conv(1,6): last=c ; conv(2,2): last=b
        assert out["c"]["credited_conversions"] == 2.0
        assert out["b"]["credited_conversions"] == 1.0
        assert out["(unattributed)"]["credited_conversions"] == 1.0
        assert abs(sum(r["credited_conversions"]
                       for r in out.values()) - 4.0) < 1e-12
        assert abs(out["c"]["share"] - 0.5) < 1e-12

    def test_first_touch(self, spark):
        out = {r["channel"]: r for r in attribution_report(
            _mk(spark), "u", "ts", "ch", "conv",
            model="first_touch").collect()}
        assert out["a"]["credited_conversions"] == 2.0  # both user-1
        assert out["b"]["credited_conversions"] == 1.0

    def test_linear_and_position(self, spark):
        out = {r["channel"]: r for r in attribution_report(
            _mk(spark), "u", "ts", "ch", "conv",
            model="linear").collect()}
        # conv(1,4): a,b,c 1/3 each; conv(1,6): same; conv(2,2): b=1
        assert abs(out["a"]["credited_conversions"] - 2 / 3) < 1e-12
        assert abs(out["b"]["credited_conversions"]
                   - (2 / 3 + 1.0)) < 1e-12
        pos = {r["channel"]: r for r in attribution_report(
            _mk(spark), "u", "ts", "ch", "conv",
            model="position").collect()}
        # k=3: a=0.4, b=0.2, c=0.4 per user-1 conversion (x2)
        assert abs(pos["a"]["credited_conversions"] - 0.8) < 1e-12
        assert abs(pos["b"]["credited_conversions"]
                   - (0.4 + 1.0)) < 1e-12
        assert abs(pos["c"]["credited_conversions"] - 0.8) < 1e-12

    def test_lookback_window(self, spark):
        out = {r["channel"]: r for r in attribution_report(
            _mk(spark), "u", "ts", "ch", "conv",
            model="last_touch", lookback_sec=1.5).collect()}
        # conv(1,4): only c@3 within 1.5s; conv(1,6): nothing ->
        # unattributed; conv(2,2): b@1 within 1.5
        assert out["c"]["credited_conversions"] == 1.0
        assert out["b"]["credited_conversions"] == 1.0
        assert out["(unattributed)"]["credited_conversions"] == 2.0

    def test_bad_model(self, spark):
        with pytest.raises(ValueError):
            attribution_report(_mk(spark), "u", "ts", "ch", "conv",
                               model="shapley")
