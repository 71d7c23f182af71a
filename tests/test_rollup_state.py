"""Incremental rollup maintenance (operators/rollup_state.py):
merge-tree invariance, append-equals-rebuild, finalizer math, and
the parquet stored-state round trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def _batches(spark, n=3000, groups=4, days=3):
    rows = [
        (i % days, i % groups, float((i * 37) % 100) / 7.0) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "batch int, g int, value double")
    return df, [df.filter(F.col("batch") == b) for b in range(days)]


METRICS = {
    "n": ("count", None),
    "s": ("sum", "value"),
    "ss": ("sumsq", "value"),
    "lo": ("min", "value"),
    "hi": ("max", "value"),
}


class TestRollupState:
    def test_append_equals_rebuild_any_tree(self, spark):
        from cod_stats_spark.operators.rollup_state import (
            rollup_merge,
            rollup_partial,
        )

        df, parts = _batches(spark)
        one_shot = rollup_partial(df, ["g"], METRICS)
        states = [rollup_partial(p, ["g"], METRICS) for p in parts]
        flat = rollup_merge(["g"], METRICS, *states)
        nested = rollup_merge(
            ["g"], METRICS, rollup_merge(["g"], METRICS, states[2], states[0]),
            states[1],
        )
        # float sums differ in addition order → compare at 1e-9
        def rows(d):
            return sorted(
                (r["g"], r["n"], round(r["s"], 9), round(r["ss"], 9),
                 r["lo"], r["hi"])
                for r in d.collect()
            )

        assert rows(one_shot) == rows(flat) == rows(nested)

    def test_finalizers_match_builtin_aggs(self, spark):
        from cod_stats_spark.operators.rollup_state import (
            finalize_avg,
            finalize_var,
            rollup_finalize,
            rollup_partial,
        )

        df, _ = _batches(spark)
        fin = rollup_finalize(
            rollup_partial(df, ["g"], METRICS),
            ["g"],
            {
                "avg_v": finalize_avg("s", "n"),
                "var_v": finalize_var("ss", "s", "n"),
            },
        )
        got = {r["g"]: (r["avg_v"], r["var_v"]) for r in fin.collect()}
        want = {
            r["g"]: (r["a"], r["v"])
            for r in df.groupBy("g")
            .agg(F.avg("value").alias("a"), F.var_pop("value").alias("v"))
            .collect()
        }
        for g in want:
            assert got[g][0] == pytest.approx(want[g][0], rel=1e-12)
            assert got[g][1] == pytest.approx(want[g][1], rel=1e-9)

    def test_stored_state_round_trip(self, spark, tmp_path):
        from cod_stats_spark.operators.rollup_state import (
            rollup_merge,
            rollup_partial,
        )

        df, parts = _batches(spark)
        store = str(tmp_path / "state")
        state = rollup_partial(parts[0], ["g"], METRICS)
        for p in parts[1:]:
            state.write.mode("overwrite").parquet(store)
            state = rollup_merge(
                ["g"], METRICS, spark.read.parquet(store),
                rollup_partial(p, ["g"], METRICS),
            )
        one_shot = rollup_partial(df, ["g"], METRICS)
        a = sorted(
            (r["g"], r["n"], round(r["s"], 9)) for r in state.collect()
        )
        b = sorted(
            (r["g"], r["n"], round(r["s"], 9)) for r in one_shot.collect()
        )
        assert a == b

    def test_nulls_ignored_by_value_metrics(self, spark):
        from cod_stats_spark.operators.rollup_state import rollup_partial

        df = spark.createDataFrame(
            [(0, 1.0), (0, None), (0, 3.0)], "g int, value double"
        )
        r = rollup_partial(df, ["g"], METRICS).first()
        assert (r["n"], r["s"], r["lo"], r["hi"]) == (3, 4.0, 1.0, 3.0)

    def test_spec_guards(self, spark):
        from cod_stats_spark.operators.rollup_state import (
            rollup_merge,
            rollup_partial,
        )

        df, _ = _batches(spark, n=10)
        with pytest.raises(ValueError, match="unknown kind"):
            rollup_partial(df, ["g"], {"x": ("median", "value")})
        with pytest.raises(ValueError, match="needs a column"):
            rollup_partial(df, ["g"], {"x": ("sum", None)})
        with pytest.raises(ValueError, match="at least one"):
            rollup_merge(["g"], METRICS)
