"""Distributed k-means (operators/clustering.py)."""

from __future__ import annotations

import math
import random


def _blobs(n_per=40, seed=3):
    """Three well-separated 8-d blobs; returns (rows, centers)."""
    rng = random.Random(seed)
    centers = [
        [5.0] * 4 + [0.0] * 4,
        [0.0] * 4 + [5.0] * 4,
        [-5.0] * 8,
    ]
    rows = []
    i = 0
    for c in centers:
        for _ in range(n_per):
            rows.append((i, [x + rng.gauss(0, 0.3) for x in c]))
            i += 1
    return rows, centers


class TestKMeans:
    def test_recovers_blob_centers(self, spark):
        from cod_stats_spark.operators.clustering import kmeans_fit

        rows, centers = _blobs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        fitted, history = kmeans_fit(
            df.repartition(5), "embedding", "vec_id", k=3, max_iter=25
        )
        assert len(fitted) == 3 and history[-1] <= history[0]
        # every true center has a fitted centroid within noise distance
        for c in centers:
            d = min(
                math.dist(c, f) for f in fitted
            )
            assert d < 0.5, f"no centroid near {c} (closest at {d})"

    def test_deterministic_across_runs(self, spark):
        from cod_stats_spark.operators.clustering import kmeans_fit

        rows, _ = _blobs(seed=9)
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a, _ = kmeans_fit(df.repartition(4), "embedding", "vec_id", k=3)
        b, _ = kmeans_fit(df.repartition(4), "embedding", "vec_id", k=3)
        assert a == b

    def test_assign_groups_blobs(self, spark):
        from cod_stats_spark.operators.clustering import kmeans_assign, kmeans_fit

        rows, _ = _blobs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        fitted, _ = kmeans_fit(df, "embedding", "vec_id", k=3)
        out = kmeans_assign(df, "embedding", fitted).collect()
        by_blob = {}
        for r in out:
            by_blob.setdefault(r["vec_id"] // 40, set()).add(r["cluster"])
        # each blob maps to exactly one cluster, and the three differ
        assert all(len(s) == 1 for s in by_blob.values())
        assert len(set().union(*by_blob.values())) == 3

    def test_k_larger_than_points_reseeds(self, spark):
        from cod_stats_spark.operators.clustering import kmeans_fit

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [4.0, 4.0])], "vec_id long, embedding array<double>"
        )
        fitted, _ = kmeans_fit(df, "embedding", "vec_id", k=2, max_iter=5)
        assert len(fitted) == 2

    def test_ivf_with_kmeans_centroids_matches_brute_force(self, spark):
        """Real centroids make IVF exact on separated data: nprobe=1
        already returns the brute-force top-k for a blob query."""
        from cod_stats_spark.operators.clustering import kmeans_fit
        from cod_stats_spark.operators.similarity import brute_force_topk, ivf_topk

        rows, centers = _blobs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        fitted, _ = kmeans_fit(df, "embedding", "vec_id", k=3)
        q = [x + 0.1 for x in centers[0]]
        ivf = ivf_topk(
            df, "embedding", "vec_id", q, list(enumerate(fitted)), k=5, nprobe=1
        ).collect()
        brute = brute_force_topk(df, "embedding", "vec_id", q, k=5).collect()
        assert [r["id"] for r in ivf] == [r["id"] for r in brute]


class TestIvfIndex:
    def test_ivf_index_partition_pruning_and_parity(self, spark, tmp_path):
        """The written IVF index must (a) prune the scan to the probed
        cluster directories and (b) return the same top-k as scoring
        the unindexed table, on separated blobs."""
        from cod_stats_spark.operators.clustering import kmeans_fit
        from cod_stats_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk_indexed,
            write_ivf_index,
        )

        rows, centers = _blobs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        fitted, _ = kmeans_fit(df, "embedding", "vec_id", k=3)
        path = str(tmp_path / "ivf_index")
        write_ivf_index(df, path, "embedding", "vec_id", fitted)

        q = [x + 0.1 for x in centers[1]]
        out = ivf_topk_indexed(
            spark, path, "embedding", "vec_id", q, fitted, k=5, nprobe=1
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan and "ivf_cluster" in plan
        got = [r["id"] for r in out.collect()]
        want = [r["id"] for r in brute_force_topk(df, "embedding", "vec_id", q, k=5).collect()]
        assert got == want
        # only the probed cluster's directory is touched (inputFiles()
        # reports the PRE-pruning FileIndex listing, so ask the scan
        # which files rows actually came from — the LSH test's device)
        from pyspark.sql import functions as F

        indexed = spark.read.parquet(path)
        probed = indexed.filter(F.col("ivf_cluster").isin(
            [r["ivf_cluster"] for r in out.join(
                indexed.withColumnRenamed("vec_id", "id"), "id"
            ).select("ivf_cluster").distinct().collect()]
        ))
        touched = {
            r["f"]
            for r in probed.select(F.input_file_name().alias("f")).distinct().collect()
        }
        assert touched
        assert len({f.split("ivf_cluster=")[1].split("/")[0] for f in touched}) == 1


class TestAssignGemmParity:
    def test_column_and_gemm_paths_agree(self, spark):
        """Both strategies must produce the identical assignment,
        including first-minimum tie order — compared at the LARGEST k
        the Column path can still evaluate (k=512 StackOverflows the
        nested least() chain during analysis, which is exactly why the
        GEMM route exists)."""
        import random

        from cod_stats_spark.operators.clustering import (
            GEMM_ASSIGN_THRESHOLD,
            _kmeans_assign_columns,
            _kmeans_assign_gemm,
        )
        import numpy as np

        rows, _ = _blobs()
        rows.append((len(rows), None))  # null vector → null cluster
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        rng = random.Random(11)
        k = GEMM_ASSIGN_THRESHOLD  # the dispatch boundary
        cents = [[rng.uniform(-6, 6) for _ in range(8)] for _ in range(k)]
        M = np.asarray(cents, dtype=np.float64)
        col = {
            r["vec_id"]: r["cluster"]
            for r in _kmeans_assign_columns(df, "embedding", M).collect()
        }
        gemm = {
            r["vec_id"]: r["cluster"]
            for r in _kmeans_assign_gemm(df, "embedding", M).collect()
        }
        assert col == gemm
        assert col[max(col)] is None  # the null vector on both paths

    def test_dispatcher_routes_k512_through_gemm(self, spark):
        """k=512 > threshold: the public entry point must avoid the
        literal least() chain (which StackOverflows at this k) and the
        distributed answer must equal a local numpy argmin ground
        truth."""
        import random

        from cod_stats_spark.operators.clustering import (
            GEMM_ASSIGN_THRESHOLD,
            kmeans_assign,
        )
        import numpy as np

        rows, _ = _blobs()
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        rng = random.Random(13)
        k = 512
        assert k > GEMM_ASSIGN_THRESHOLD
        cents = [[rng.uniform(-6, 6) for _ in range(8)] for _ in range(k)]
        dispatched = kmeans_assign(df, "embedding", cents)
        plan = dispatched._jdf.queryExecution().analyzed().toString()
        assert "least(" not in plan
        M = np.asarray(cents, dtype=np.float64)
        X = np.asarray([v for _, v in rows], dtype=np.float64)
        want = (
            (M * M).sum(axis=1)[None, :] - 2.0 * (X @ M.T)
        ).argmin(axis=1)
        got = {r["vec_id"]: r["cluster"] for r in dispatched.collect()}
        assert got == {i: int(c) for (i, _), c in zip(rows, want)}

    def test_exact_tie_breaks_to_lowest_index_on_both_paths(self, spark):
        """Duplicate centroids produce exactly-equal distances — both
        strategies must pick the lowest centroid index."""
        import numpy as np

        from cod_stats_spark.operators.clustering import (
            _kmeans_assign_columns,
            _kmeans_assign_gemm,
        )

        df = spark.createDataFrame(
            [(1, [2.0, 2.0])], "vec_id long, embedding array<double>"
        )
        M = np.asarray([[9.0, 9.0], [2.0, 2.0], [2.0, 2.0]], dtype=np.float64)
        for path in (_kmeans_assign_columns, _kmeans_assign_gemm):
            assert path(df, "embedding", M).collect()[0]["cluster"] == 1


def test_assign_empty_centroids_raises(spark):
    import pytest

    from cod_stats_spark.operators.clustering import kmeans_assign

    df = spark.createDataFrame([(1, [0.0, 1.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="at least one centroid"):
        kmeans_assign(df, "embedding", [])


def test_fit_ignores_null_vectors(spark):
    from cod_stats_spark.operators.clustering import kmeans_fit

    rows = [(1, [0.0, 0.0]), (2, [4.0, 4.0]), (3, None), (4, [4.1, 4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fitted, _ = kmeans_fit(df, "embedding", "vec_id", k=2, max_iter=10)
    assert len(fitted) == 2
