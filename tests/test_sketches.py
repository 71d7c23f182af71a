"""Mergeable HLL sketch state (operators/sketches.py): merge-tree
invariance, accuracy vs exact distincts, null/edge handling."""

from __future__ import annotations

import pyspark.sql.functions as F


def _events(spark, n=6000, users=997, groups=5):
    rows = [(i % groups, f"u{(i * 7919) % users}") for i in range(n)]
    return spark.createDataFrame(rows, "g int, v string")


class TestHll:
    P = 10

    def test_estimate_within_rated_error(self, spark):
        from cod_stats_spark.operators.sketches import hll_estimate, hll_partial

        df = _events(spark)
        est = {
            r["g"]: r["approx_distinct"]
            for r in hll_estimate(
                hll_partial(df, "v", ["g"], p=self.P), ["g"], p=self.P
            ).collect()
        }
        exact = {
            r["g"]: r["n"]
            for r in df.groupBy("g").agg(F.countDistinct("v").alias("n")).collect()
        }
        m = 1 << self.P
        for g, n in exact.items():
            assert abs(est[g] - n) / n <= 3 * 1.04 / (m**0.5), (g, est[g], n)

    def test_merge_tree_invariance(self, spark):
        """max per register is associative/idempotent: daily→total,
        pairwise trees, re-merging a state with itself — all yield the
        IDENTICAL estimate (the property that makes stored sketch
        state trustworthy)."""
        from cod_stats_spark.operators.sketches import (
            hll_estimate,
            hll_merge,
            hll_partial,
        )

        df = _events(spark).withColumn("day", F.abs(F.hash("v")) % 3)
        parts = [
            hll_partial(df.filter(F.col("day") == d), "v", ["g"], p=self.P)
            for d in range(3)
        ]
        one_shot = hll_estimate(
            hll_partial(df, "v", ["g"], p=self.P), ["g"], p=self.P
        )
        flat = hll_estimate(hll_merge(["g"], *parts), ["g"], p=self.P)
        nested = hll_estimate(
            hll_merge(["g"], hll_merge(["g"], parts[0], parts[1]), parts[2],
                      parts[2]),  # re-merge one part: idempotent
            ["g"],
            p=self.P,
        )
        rows = lambda d: sorted((r["g"], r["approx_distinct"]) for r in d.collect())
        assert rows(one_shot) == rows(flat) == rows(nested)

    def test_state_is_bounded_and_nulls_ignored(self, spark):
        from cod_stats_spark.operators.sketches import hll_partial

        df = spark.createDataFrame(
            [(0, f"u{i}") for i in range(5000)] + [(0, None)] * 100,
            "g int, v string",
        )
        st = hll_partial(df, "v", ["g"], p=6)
        assert st.count() <= 64  # at most m rows per group
        # nulls contributed nothing: same state without them
        st2 = hll_partial(df.where(F.col("v").isNotNull()), "v", ["g"], p=6)
        a = sorted(map(tuple, st.collect()))
        assert a == sorted(map(tuple, st2.collect()))

    def test_p_range_guard_and_md5_member(self, spark):
        import pytest

        from cod_stats_spark.operators.sketches import hll_estimate, hll_partial

        df = _events(spark, n=500, users=300, groups=1)
        with pytest.raises(ValueError, match="out of range"):
            hll_partial(df, "v", ["g"], p=2)
        est = hll_estimate(
            hll_partial(df, "v", ["g"], p=8, base_hash="md5_60"),
            ["g"],
            p=8,
            base_hash="md5_60",
        ).first()["approx_distinct"]
        assert abs(est - 300) / 300 < 0.3
