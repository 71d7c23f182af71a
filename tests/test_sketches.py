"""Mergeable sketch state (operators/sketches.py): HLL merge-tree
invariance + accuracy vs exact distincts; count-min never-undercount,
additive merge, bounded state, heavy-hitter recall."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


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


class TestCms:
    D, W = 4, 256

    def _state_and_exact(self, spark, df):
        from cod_stats_spark.operators.sketches import cms_partial

        state = cms_partial(df, "v", ["g"], depth=self.D, width=self.W)
        exact = {
            (r["g"], r["v"]): r["n"]
            for r in df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        return state, exact

    def test_never_undercounts_and_bounded_overcount(self, spark):
        from cod_stats_spark.operators.sketches import cms_query

        df = _events(spark)
        state, exact = self._state_and_exact(spark, df)
        probes = df.distinct()
        est = {
            (r["g"], r["v"]): r["est_count"]
            for r in cms_query(
                state, probes, ["g"], "v", depth=self.D, width=self.W
            ).collect()
        }
        n_per_g = {}
        for (g, _), n in exact.items():
            n_per_g[g] = n_per_g.get(g, 0) + n
        for k, n in exact.items():
            assert est[k] >= n, (k, est[k], n)  # CMS guarantee: no undercount
            # e/width overcount bound holds in aggregate; per-item allow 4x
            assert est[k] - n <= max(4 * 2.72 * n_per_g[k[0]] / self.W, 4), (
                k, est[k], n,
            )

    def test_merge_is_additive_and_order_free(self, spark):
        from cod_stats_spark.operators.sketches import cms_merge, cms_partial

        df = _events(spark).withColumn("day", F.abs(F.hash("v")) % 3)
        parts = [
            cms_partial(
                df.filter(F.col("day") == d), "v", ["g"], depth=self.D, width=self.W
            )
            for d in range(3)
        ]
        one_shot = cms_partial(df, "v", ["g"], depth=self.D, width=self.W)
        flat = cms_merge(["g"], *parts)
        nested = cms_merge(["g"], cms_merge(["g"], parts[2], parts[0]), parts[1])
        rows = lambda d: sorted(map(tuple, d.collect()))
        assert rows(one_shot) == rows(flat) == rows(nested)
        # NOT idempotent: double-merging a part double-counts — by design
        doubled = cms_merge(["g"], flat, parts[0])
        assert sum(r[-1] for r in doubled.collect()) > sum(
            r[-1] for r in flat.collect()
        )

    def test_state_bounded_nulls_ignored_missing_cell_zero(self, spark):
        from cod_stats_spark.operators.sketches import cms_partial, cms_query

        df = spark.createDataFrame(
            [(0, f"u{i}") for i in range(4000)] + [(0, None)] * 50,
            "g int, v string",
        )
        st = cms_partial(df, "v", ["g"], depth=self.D, width=self.W)
        assert st.count() <= self.D * self.W
        assert (
            st.agg(F.sum("cnt")).first()[0] == 4000 * self.D
        )  # nulls contributed nothing
        # a probe the state never saw CAN estimate 0 via the missing-cell
        # left join (width large enough that some cell is empty)
        ghost = spark.createDataFrame([(1, "never-seen")], "g int, v string")
        est = cms_query(st, ghost, ["g"], "v", depth=self.D, width=self.W).first()
        assert est["est_count"] == 0

    def test_heavy_hitters_full_recall(self, spark):
        from cod_stats_spark.operators.sketches import cms_heavy_hitters, cms_partial

        # skewed stream: item 'hot{k}' appears 50+k times, the rest once
        rows = [(0, f"hot{k}") for k in range(5) for _ in range(50 + k)]
        rows += [(0, f"cold{i}") for i in range(2000)]
        df = spark.createDataFrame(rows, "g int, v string")
        state = cms_partial(df, "v", ["g"], depth=self.D, width=self.W)
        hh = cms_heavy_hitters(
            state, df.distinct(), ["g"], "v", threshold=50,
            depth=self.D, width=self.W,
        )
        got = {r["v"] for r in hh.collect()}
        assert {f"hot{k}" for k in range(5)} <= got  # recall is 100%
        # εN false-positive bound: overcount ≤ eN/W w.h.p. keeps the
        # cold tail (count 1) far below threshold 50
        assert not [v for v in got if v.startswith("cold")]

    def test_guards(self, spark):
        import pytest

        from cod_stats_spark.operators.sketches import cms_merge, cms_partial

        df = _events(spark, n=100)
        with pytest.raises(ValueError, match="bad depth"):
            cms_partial(df, "v", ["g"], depth=0)
        with pytest.raises(ValueError, match="at least one"):
            cms_merge(["g"])


class TestHistogram:
    LO, HI, NB = 0.0, 100.0, 50

    def _df(self, spark, n=4000, groups=3):
        rows = [(i % groups, float((i * 37) % 997) / 10.0) for i in range(n)]
        return spark.createDataFrame(rows, "g int, v double")

    def test_quantile_within_bin_width_of_exact(self, spark):
        from cod_stats_spark.operators.sketches import hist_partial, hist_quantile

        df = self._df(spark)
        state = hist_partial(df, "v", ["g"], self.LO, self.HI, self.NB)
        width = (self.HI - self.LO) / self.NB
        for q in (0.1, 0.5, 0.9):
            est = {
                r["g"]: r["approx_quantile"]
                for r in hist_quantile(
                    state, ["g"], q, self.LO, self.HI, self.NB
                ).collect()
            }
            exact = {
                r["g"]: r["p"]
                for r in df.groupBy("g")
                .agg(F.expr(f"percentile(v, {q})").alias("p"))
                .collect()
            }
            for g in exact:
                assert abs(est[g] - exact[g]) <= width + 1e-9, (q, g)

    def test_merge_tree_invariance(self, spark):
        from cod_stats_spark.operators.sketches import (
            hist_merge,
            hist_partial,
            hist_quantile,
        )

        df = self._df(spark).withColumn("day", F.abs(F.hash("v")) % 3)
        parts = [
            hist_partial(
                df.filter(F.col("day") == d), "v", ["g"], self.LO, self.HI, self.NB
            )
            for d in range(3)
        ]
        one = hist_partial(df, "v", ["g"], self.LO, self.HI, self.NB)
        flat = hist_merge(["g"], *parts)
        nested = hist_merge(["g"], hist_merge(["g"], parts[1], parts[2]), parts[0])
        rows = lambda st: sorted(
            map(
                tuple,
                hist_quantile(st, ["g"], 0.5, self.LO, self.HI, self.NB).collect(),
            )
        )
        assert rows(one) == rows(flat) == rows(nested)

    def test_outliers_clamp_to_edge_bins(self, spark):
        from cod_stats_spark.operators.sketches import hist_partial

        df = spark.createDataFrame(
            [(0, -50.0), (0, 20.0), (0, 999.0), (0, None)], "g int, v double"
        )
        st = {r["bin"]: r["cnt"] for r in
              hist_partial(df, "v", ["g"], self.LO, self.HI, self.NB).collect()}
        assert st == {0: 1, 10: 1, self.NB - 1: 1}  # null ignored

    def test_guards(self, spark):
        from cod_stats_spark.operators.sketches import (
            hist_merge,
            hist_partial,
            hist_quantile,
        )

        df = self._df(spark, n=10)
        with pytest.raises(ValueError, match="bad bounds"):
            hist_partial(df, "v", ["g"], 10.0, 10.0, 4)
        with pytest.raises(ValueError, match="outside"):
            hist_quantile(
                hist_partial(df, "v", ["g"], self.LO, self.HI, self.NB),
                ["g"], 1.0, self.LO, self.HI, self.NB,
            )
        with pytest.raises(ValueError, match="at least one"):
            hist_merge(["g"])


class TestHllSliding:
    P = 10

    def test_idle_group_still_reported_inside_window(self, spark):
        """r8 ADVICE: the day frame must be DENSE (groups x days) — a
        group with no events on the anchor day but events within the
        trailing window owes a row whose estimate equals the one-shot
        replay over its window span (merge associativity)."""
        from cod_stats_spark.operators.sketches import (
            hll_estimate,
            hll_partial,
            hll_sliding_estimate,
        )

        rows = (
            # group A: active every day 1..3
            [("A", f"2024-01-0{d}", f"a{i}") for d in (1, 2, 3) for i in range(40)]
            # group B: active ONLY on day 1 — idle on the day-3 anchor
            + [("B", "2024-01-01", f"b{i}") for i in range(25)]
            # group C: active only day 5 — OUTSIDE a day-3 3-day window
            + [("C", "2024-01-05", f"c{i}") for i in range(10)]
        )
        df = spark.createDataFrame(rows, "g string, day string, v string").withColumn(
            "day", F.to_date("day")
        )
        state = hll_partial(df, "v", ["g", "day"], p=self.P)
        trail = hll_sliding_estimate(state, ["g"], "day", 3, p=self.P)
        anchored = {
            r["g"]: r["approx_distinct"]
            for r in trail.where(F.col("day") == F.lit("2024-01-03")).collect()
        }
        # B is reported at the anchor even though it was idle that day
        assert set(anchored) == {"A", "B"}
        # and each equals the one-shot estimate over the same span
        oneshot = {
            r["g"]: r["approx_distinct"]
            for r in hll_estimate(
                hll_partial(
                    df.where(F.col("day") <= F.lit("2024-01-03")), "v", ["g"],
                    p=self.P,
                ),
                ["g"],
                p=self.P,
            ).collect()
        }
        assert anchored == {g: oneshot[g] for g in ("A", "B")}


class TestHllIntersection:
    P = 10

    def test_inclusion_exclusion_tracks_true_overlap(self, spark):
        from cod_stats_spark.operators.sketches import (
            hll_intersection_estimate,
            hll_partial,
        )

        # A = u0..u599, B = u400..u999 -> true overlap 200
        a_rows = [("g", f"u{i}") for i in range(600)]
        b_rows = [("g", f"u{i}") for i in range(400, 1000)]
        mk = lambda rows: hll_partial(
            spark.createDataFrame(rows, "g string, v string"), "v", ["g"],
            p=self.P,
        )
        est = hll_intersection_estimate(
            mk(a_rows), mk(b_rows), ["g"], p=self.P
        ).collect()[0]["approx_intersection"]
        # compounded error of three estimates: allow 3x the single-set
        # rated bound on the UNION size (1000)
        m = 1 << self.P
        assert abs(est - 200) <= 3 * 3 * 1.04 / (m ** 0.5) * 1000

    def test_disjoint_sets_floor_at_zero(self, spark):
        from cod_stats_spark.operators.sketches import (
            hll_intersection_estimate,
            hll_partial,
        )

        mk = lambda lo, hi: hll_partial(
            spark.createDataFrame(
                [("g", f"u{i}") for i in range(lo, hi)], "g string, v string"
            ),
            "v", ["g"], p=self.P,
        )
        est = hll_intersection_estimate(
            mk(0, 300), mk(10_000, 10_300), ["g"], p=self.P
        ).collect()[0]["approx_intersection"]
        assert 0.0 <= est <= 3 * 3 * 1.04 / ((1 << self.P) ** 0.5) * 600
