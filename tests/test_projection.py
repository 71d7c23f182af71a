"""Dimensionality reduction (operators/projection.py): JL geometry
preservation, Column/GEMM parity, PCA variance recovery and
determinism, guards."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _vecs(spark, n=300, d=16, seed=7):
    import random

    rnd = random.Random(seed)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(d)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>"), rows


class TestRandomProjection:
    def test_column_and_gemm_paths_agree(self, spark):
        from cod_stats_spark.operators.projection import (
            project_gemm,
            projection_planes,
            random_project,
        )

        df, _ = _vecs(spark, n=50, d=16)
        a = {
            r["vec_id"]: [round(v, 9) for v in r["rp"]]
            for r in random_project(df, "embedding", 16, 6).collect()
        }
        b = {
            r["vec_id"]: [round(v, 9) for v in r["proj"]]
            for r in project_gemm(
                df, "embedding", projection_planes(16, 6)
            ).collect()
        }
        assert a == b

    def test_jl_preserves_cluster_separation(self, spark):
        """Reduced-space cosines must keep real structure apart: two
        clusters around orthogonal directions stay separated after
        projection (the property that makes reduced-space ANN recall
        work — pure-noise cosines carry no signal to preserve, so the
        test plants signal)."""
        import random

        from cod_stats_spark.operators.projection import (
            project_gemm,
            projection_planes,
        )

        rnd = random.Random(11)
        d = 32
        u = [1.0] * (d // 2) + [0.0] * (d // 2)
        v = [0.0] * (d // 2) + [1.0] * (d // 2)
        rows = []
        for i in range(80):
            base = u if i % 2 == 0 else v
            rows.append(
                (i, [b * 4.0 + rnd.gauss(0, 0.5) for b in base])
            )
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        got = {
            r["vec_id"]: r["proj"]
            for r in project_gemm(
                df, "embedding", projection_planes(d, 12)
            ).collect()
        }

        def cos(a, b):
            num = sum(x * y for x, y in zip(a, b))
            return num / (
                math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
            )

        within = [cos(got[i], got[i + 2]) for i in range(0, 76)]
        across = [cos(got[i], got[i + 1]) for i in range(0, 76)]
        assert sum(within) / len(within) > sum(across) / len(across) + 0.3

    def test_matrix_is_deterministic_and_namespaced(self):
        from cod_stats_spark.operators.projection import projection_planes

        assert projection_planes(8, 4) == projection_planes(8, 4)
        assert projection_planes(8, 4) != projection_planes(8, 4, namespace="other")


class TestPca:
    def _low_rank(self, spark, n=400, d=10):
        """Data living (noisily) on a 2-plane inside R^d."""
        import random

        rnd = random.Random(3)
        u = [1.0 if i < d // 2 else 0.0 for i in range(d)]
        v = [0.0 if i < d // 2 else 1.0 for i in range(d)]
        rows = []
        for i in range(n):
            a, b = rnd.gauss(0, 3), rnd.gauss(0, 1)
            vec = [a * ui + b * vi + rnd.gauss(0, 0.05) + 2.0 for ui, vi in zip(u, v)]
            rows.append((i, vec))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_recovers_low_rank_variance(self, spark):
        from cod_stats_spark.operators.projection import pca_fit

        df = self._low_rank(spark)
        comps, mean, evr = pca_fit(df, "embedding", d=10, k=2)
        assert len(comps) == 2 and len(mean) == 10
        assert sum(evr) > 0.99                      # 2 dims explain the plane
        assert evr[0] > evr[1] > 0

    def test_projection_centers_and_orders_variance(self, spark):
        import statistics

        from cod_stats_spark.operators.projection import pca_fit, pca_project

        df = self._low_rank(spark)
        comps, mean, _ = pca_fit(df, "embedding", d=10, k=2)
        proj = [r["pca"] for r in pca_project(df, "embedding", comps, mean).collect()]
        c0 = [p[0] for p in proj]
        c1 = [p[1] for p in proj]
        assert abs(statistics.mean(c0)) < 1e-9      # centered
        assert statistics.pvariance(c0) > statistics.pvariance(c1)

    def test_partitioning_invariant_fit(self, spark):
        from cod_stats_spark.operators.projection import pca_fit

        df = self._low_rank(spark)
        a = pca_fit(df, "embedding", d=10, k=2)
        b = pca_fit(df.repartition(17), "embedding", d=10, k=2)
        for ca, cb in zip(a[0], b[0]):
            for x, y in zip(ca, cb):
                assert x == pytest.approx(y, abs=1e-9)

    def test_guards(self, spark):
        from cod_stats_spark.operators.projection import pca_fit

        df, _ = _vecs(spark, n=5, d=4)
        with pytest.raises(ValueError, match="outside"):
            pca_fit(df, "embedding", d=4, k=5)
        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="empty input"):
            pca_fit(empty, "embedding", d=4, k=2)
