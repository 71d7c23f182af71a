"""Embedding-space decontamination (operators/decontaminate.py
semantic_* family): planted paraphrase-shaped contamination is
flagged, the Column "pairs" path and the BLAS "gemm" path agree on
the rounded values, degenerate vectors (zero-norm, NaN) can never
flag, the bench-size guard refuses silent truncation, and the DuckDB
oracle replays the pairs method. SQL value verification on the real
embeddings table lives in the ann_topk gate's 'semdecon' arm."""

from __future__ import annotations

import pytest


def _data(spark):
    """Corpus of 12 unit-ish vectors; benchmark = near-copies of docs
    0 and 5 (cos ≈ 0.999+) plus one unrelated direction."""
    import numpy as np

    rng = np.random.default_rng(7)
    corpus = [(i, [float(x) for x in rng.normal(0, 1, 8)]) for i in range(12)]
    def near(v):
        return [float(x + 0.001) for x in v]
    bench = [
        (100, near(corpus[0][1])),
        (101, near(corpus[5][1])),
        (102, [float(x) for x in rng.normal(0, 1, 8)]),
    ]
    c = spark.createDataFrame(corpus, "vec_id long, embedding array<double>")
    b = spark.createDataFrame(bench, "vec_id long, embedding array<double>")
    return c, b


class TestFlagging:
    def test_planted_contamination_flagged_and_cleaned(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
            semantic_decontaminate,
        )

        c, b = _data(spark)
        flagged = {
            r["doc_id"]: r["max_cosine"]
            for r in semantic_contaminated_docs(
                c, b, "embedding", "vec_id", threshold=0.99
            ).collect()
        }
        assert set(flagged) == {0, 5}
        assert all(v >= 0.99 for v in flagged.values())
        clean = semantic_decontaminate(
            c, b, "embedding", "vec_id", threshold=0.99
        )
        assert sorted(r["vec_id"] for r in clean.collect()) == [
            1, 2, 3, 4, 6, 7, 8, 9, 10, 11
        ]

    def test_degenerate_vectors_never_flag(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c = spark.createDataFrame(
            [
                (1, [0.0, 0.0, 0.0]),
                (2, [float("nan"), 1.0, 0.0]),
                (3, [1.0, 0.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        b = spark.createDataFrame(
            [(9, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        for method in ("pairs", "gemm"):
            got = {
                r["doc_id"]
                for r in semantic_contaminated_docs(
                    c, b, "embedding", "vec_id",
                    threshold=0.5, method=method,
                ).collect()
            }
            assert got == {3}, method


class TestGemmParity:
    def test_paths_agree_on_rounded_values(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c, b = _data(spark)
        kw = dict(threshold=0.0)  # keep every doc: compare full maps
        pairs = {
            r["doc_id"]: r["max_cosine"]
            for r in semantic_contaminated_docs(
                c, b, "embedding", "vec_id", method="pairs", **kw
            ).collect()
        }
        gemm = {
            r["doc_id"]: r["max_cosine"]
            for r in semantic_contaminated_docs(
                c, b, "embedding", "vec_id", method="gemm", **kw
            ).collect()
        }
        assert set(pairs) == set(gemm)
        for k in pairs:
            assert gemm[k] == pytest.approx(pairs[k], abs=2e-6)

    def test_bench_size_guard(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c, b = _data(spark)
        with pytest.raises(ValueError, match="max_bench_rows"):
            semantic_contaminated_docs(
                c, b, "embedding", "vec_id", method="gemm",
                max_bench_rows=2,
            )

    def test_unknown_method(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c, b = _data(spark)
        with pytest.raises(ValueError, match="unknown method"):
            semantic_contaminated_docs(
                c, b, "embedding", "vec_id", method="ivf"
            )


class TestOracle:
    def test_oracle_replays_pairs_method(self, spark):
        import duckdb

        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
            semantic_contamination_oracle_sql,
        )

        c, b = _data(spark)
        got = {
            r["doc_id"]: r["max_cosine"]
            for r in semantic_contaminated_docs(
                c, b, "embedding", "vec_id", threshold=0.2
            ).collect()
        }
        con = duckdb.connect()
        con.register("corpus", c.toPandas())
        con.register("bench", b.toPandas())
        want = {
            int(i): float(v)
            for i, v in con.execute(
                semantic_contamination_oracle_sql(0.2, "corpus", "bench")
            ).fetchall()
        }
        assert got == want


class TestGemmRobustness:
    def test_empty_benchmark_is_a_noop_both_paths(self, spark):
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c, _ = _data(spark)
        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        for method in ("pairs", "gemm"):
            got = semantic_contaminated_docs(
                c, empty, "embedding", "vec_id",
                threshold=0.1, method=method,
            ).collect()
            assert got == [], method

    def test_null_and_ragged_corpus_vectors_score_zero(self, spark):
        """A NULL or wrong-length embedding must pass through unflagged
        (score 0) on BOTH paths — not kill the gemm task with numpy's
        ragged-sequence error (r13 review, verified repro)."""
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c = spark.createDataFrame(
            [
                (1, None),
                (2, [1.0, 0.0]),          # wrong dim vs bench
                (3, [1.0, 0.0, 0.0]),
            ],
            "vec_id long, embedding array<double>",
        )
        b = spark.createDataFrame(
            [(9, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        for method in ("pairs", "gemm"):
            got = {
                r["doc_id"]
                for r in semantic_contaminated_docs(
                    c, b, "embedding", "vec_id",
                    threshold=0.5, method=method,
                ).collect()
            }
            assert got == {3}, method

    def test_ragged_benchmark_raises_loudly(self, spark):
        """Mixed-length benchmark embeddings are malformed: the gemm
        path must REFUSE rather than let a nondeterministic collect
        order pick which dimension wins (a contaminated doc could
        silently ship; r13 second review). NULL bench rows drop."""
        from cod_stats_spark.operators.decontaminate import (
            semantic_contaminated_docs,
        )

        c = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>"
        )
        ragged = spark.createDataFrame(
            [(8, [1.0, 0.0]), (9, [1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        with pytest.raises(ValueError, match="mixed lengths"):
            semantic_contaminated_docs(
                c, ragged, "embedding", "vec_id", method="gemm"
            )
        with_null = spark.createDataFrame(
            [(8, None), (9, [1.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["doc_id"]
            for r in semantic_contaminated_docs(
                c, with_null, "embedding", "vec_id",
                threshold=0.5, method="gemm",
            ).collect()
        }
        assert got == {1}
