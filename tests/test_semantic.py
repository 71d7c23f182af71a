"""SemDeDup (operators/semantic.py): keeper rule, cluster
restriction, clique vs non-clique neighborhoods, oracle parity, and
guards. SQL value verification on the real embeddings lives in the
ann_topk gate's 'semdedup' rows."""

from __future__ import annotations

import pytest

CENTROIDS = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0]]


def _emb(spark):
    rows = [
        # cluster 0: 1 ~ 2 (cosine ≈ 0.9987); 2 is farther from the
        # centroid → 1 (the centroid itself) is the WORSE side
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.95, 0.05, 0.0, 0.0]),
        # ties to both centroids → cluster 0 (lowest index); no
        # ≥threshold partner → survives untouched
        (3, [0.0, 0.0, 1.0, 0.0]),
        # cluster 1: a clique 4 ~ 5 ~ 6; 5 is the farthest from the
        # centroid → sole survivor of the group
        (4, [0.0, 1.0, 0.0, 0.0]),
        (5, [0.05, 0.95, 0.0, 0.0]),
        (6, [0.0, 0.97, 0.01, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSemanticDedup:
    def test_keeper_is_farthest_from_centroid(self, spark):
        from cod_stats_spark.operators.semantic import semantic_dedup

        out = semantic_dedup(
            _emb(spark), "embedding", "vec_id", CENTROIDS, threshold=0.99
        )
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert set(got) == {2, 3, 5}
        assert got[2] == 0 and got[3] == 0 and got[5] == 1

    def test_threshold_and_cluster_restriction(self, spark):
        """Above the group's pair cosines nothing is dropped; and a
        near-identical pair SPLIT across clusters never pairs."""
        from cod_stats_spark.operators.semantic import semantic_dedup

        out = semantic_dedup(
            _emb(spark), "embedding", "vec_id", CENTROIDS, threshold=0.99999
        )
        assert out.count() == 6
        rows = [
            (1, [1.0, 0.001, 0.0, 0.0]),   # cluster 0
            (2, [0.001, 1.0, 0.0, 0.0]),   # cluster 1 — cosine(1,2)≈0.002
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assert semantic_dedup(
            df, "embedding", "vec_id", CENTROIDS, threshold=0.5
        ).count() == 2

    def test_oracle_parity(self, spark):
        """The DuckDB replica (md5-sampled centroids) must match the
        operator id-for-id and value-for-value."""
        import duckdb

        from cod_stats_spark.operators.semantic import (
            semantic_dedup,
            semantic_dedup_oracle_sql,
        )
        from pyspark.sql import functions as F

        rows = [
            (i, [float((i * 7 + j * 3) % 11) / 11.0 for j in range(4)])
            for i in range(30)
        ] + [
            # planted near-dups of ids 0..4 (scaled copies, cosine 1.0)
            (100 + i, [float((i * 7 + j * 3) % 11) / 11.0 * 2.0 for j in range(4)])
            for i in range(5)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        k = 4
        sample = (
            df.orderBy(
                F.md5(F.col("vec_id").cast("string").cast("binary")),
                F.col("vec_id"),
            )
            .limit(k)
            .collect()
        )
        cents = [[float(x) for x in r["embedding"]] for r in sample]
        got = sorted(
            (r["vec_id"], round(r["centroid_cosine"], 6))
            for r in semantic_dedup(
                df, "embedding", "vec_id", cents, threshold=0.999
            ).collect()
        )
        con = duckdb.connect()
        con.register("embeddings", df.toPandas())
        want = sorted(
            (int(i), round(float(c), 6))
            for i, c in con.execute(
                semantic_dedup_oracle_sql(k, 0.999)
            ).fetchall()
        )
        assert got == want
        assert len(got) < len(rows)  # drops actually happened

    def test_null_embeddings_pass_through(self, spark):
        """A null embedding can't make a cosine decision: the row must
        PASS THROUGH with null cluster/score, never silently vanish in
        the assignment/centroid joins (r10 review)."""
        from cod_stats_spark.operators.semantic import semantic_dedup

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.95, 0.05, 0.0, 0.0]),   # near-dup: the pair still dedups
            (3, None),                      # embedder failure
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            r["vec_id"]: (r["cluster"], r["centroid_cosine"])
            for r in semantic_dedup(
                df, "embedding", "vec_id", CENTROIDS, threshold=0.99
            ).collect()
        }
        assert set(got) == {2, 3}
        assert got[3] == (None, None)

    def test_nan_components_never_pair_or_outrank(self, spark):
        """Spark's NaN ordering makes NaN >= threshold TRUE: without
        the isnan guards a NaN vector would pair with every cluster
        member and drop rows spuriously (r10 review). It must survive
        with score 0 and leave the others' decisions unchanged."""
        from cod_stats_spark.operators.semantic import semantic_dedup

        rows = [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (2, [0.95, 0.05, 0.0, 0.0]),          # real pair with 1
            (3, [float("nan"), 1.0, 0.0, 0.0]),   # poisoned vector
            (4, [0.0, 0.0, 1.0, 0.0]),            # unrelated
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        got = {
            r["vec_id"]: r["centroid_cosine"]
            for r in semantic_dedup(
                df, "embedding", "vec_id", CENTROIDS, threshold=0.99
            ).collect()
        }
        # 1 dies to 2 as usual; the NaN row survives with score 0;
        # 4 untouched — the NaN row dropped nobody
        assert set(got) == {2, 3, 4}
        assert got[3] == 0.0

    def test_guards_and_empty(self, spark):
        from cod_stats_spark.operators.semantic import semantic_dedup

        df = spark.createDataFrame([], "vec_id long, embedding array<double>")
        assert semantic_dedup(
            df, "embedding", "vec_id", CENTROIDS
        ).count() == 0
        with pytest.raises(ValueError):
            semantic_dedup(df, "embedding", "vec_id", [])
