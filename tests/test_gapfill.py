"""Gap filling (operators/gapfill.py): dense calendars, fill
policies, span modes, pass-through of present rows, guards."""

from __future__ import annotations

import datetime as dt

import pyspark.sql.functions as F
import pytest


def _sparse(spark):
    d = dt.date
    rows = [
        ("a", d(2026, 1, 1), 2, 10.0),
        ("a", d(2026, 1, 4), 1, 5.0),     # gap: Jan 2-3
        ("b", d(2026, 1, 2), 3, 30.0),
        ("b", d(2026, 1, 3), 1, 7.0),
    ]
    return spark.createDataFrame(rows, "g string, day date, n long, mx double")


class TestResampleDaily:
    def test_per_group_span_and_policies(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        out = resample_daily(
            _sparse(spark), "day", ["g"], {"n": "zero", "mx": "ffill"}
        )
        rows = {(r["g"], str(r["day"])): (r["n"], r["mx"]) for r in out.collect()}
        # a spans Jan 1-4 (4 rows), b spans Jan 2-3 (2 rows)
        assert len(rows) == 6
        assert rows[("a", "2026-01-02")] == (0, 10.0)   # zero + carried max
        assert rows[("a", "2026-01-03")] == (0, 10.0)
        assert rows[("a", "2026-01-04")] == (1, 5.0)    # present row untouched
        assert ("b", "2026-01-01") not in rows          # per-group span

    def test_global_span_and_null_policy(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        out = resample_daily(
            _sparse(spark), "day", ["g"], {"n": "zero", "mx": "null"},
            span="global",
        )
        rows = {(r["g"], str(r["day"])): (r["n"], r["mx"]) for r in out.collect()}
        assert len(rows) == 8                            # 2 groups x 4 days
        assert rows[("b", "2026-01-01")] == (0, None)    # hole stays visible
        assert rows[("b", "2026-01-04")] == (0, None)

    def test_leading_gap_ffill_is_null_until_first_value(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        out = resample_daily(
            _sparse(spark), "day", ["g"], {"mx": "ffill"}, span="global"
        )
        rows = {(r["g"], str(r["day"])): r["mx"] for r in out.collect()}
        assert rows[("b", "2026-01-01")] is None         # nothing to carry yet
        assert rows[("b", "2026-01-04")] == 7.0          # trailing carry

    def test_no_groups_single_series(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        df = _sparse(spark).drop("g").groupBy("day").agg(
            F.sum("n").alias("n"), F.max("mx").alias("mx")
        )
        out = resample_daily(df, "day", [], {"n": "zero", "mx": "ffill"})
        days = sorted(str(r["day"]) for r in out.collect())
        assert days == [f"2026-01-0{i}" for i in range(1, 5)]

    def test_interp_fills_linearly_and_leaves_edges_null(self, spark):
        import datetime as dt

        from cod_stats_spark.operators.gapfill import resample_daily

        d = dt.date
        rows = [
            ("a", d(2026, 1, 2), 10.0),
            ("a", d(2026, 1, 5), 40.0),   # gap Jan 3-4 -> 20, 30
            ("a", d(2026, 1, 6), 0.0),
        ]
        df = spark.createDataFrame(rows, "g string, day date, v double")
        out = resample_daily(
            df, "day", ["g"], {"v": "interp"}, span="global"
        )
        vals = {str(r["day"]): r["v"] for r in out.collect()}
        assert vals["2026-01-03"] == pytest.approx(20.0)
        assert vals["2026-01-04"] == pytest.approx(30.0)
        assert vals["2026-01-02"] == 10.0            # present rows untouched
        assert vals["2026-01-06"] == 0.0
        # span starts at the group's own min here, so no leading edge;
        # force one with a second group sharing the global span
        df2 = df.unionByName(
            spark.createDataFrame(
                [("b", d(2026, 1, 4), 8.0)], "g string, day date, v double"
            )
        )
        out2 = resample_daily(df2, "day", ["g"], {"v": "interp"}, span="global")
        b = {str(r["day"]): r["v"] for r in out2.collect() if r["g"] == "b"}
        assert b["2026-01-02"] is None               # before first value
        assert b["2026-01-06"] is None               # after last value
        assert b["2026-01-04"] == 8.0

    def test_guards(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        df = _sparse(spark)
        with pytest.raises(ValueError, match="unknown fill"):
            resample_daily(df, "day", ["g"], {"n": "interpolate"})
        with pytest.raises(ValueError, match="unknown span"):
            resample_daily(df, "day", ["g"], {"n": "zero"}, span="weekly")

    def test_empty_input_empty_output(self, spark):
        from cod_stats_spark.operators.gapfill import resample_daily

        empty = spark.createDataFrame([], "g string, day date, n long")
        assert resample_daily(empty, "day", ["g"], {"n": "zero"}).count() == 0
