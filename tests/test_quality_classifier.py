"""Trained quality classifier (operators/quality_classifier.py):
training separates fluent from junk, loss decreases, the codegen
expression path equals the relation path (broadcast and shuffled),
empty docs score sigmoid(bias), and the DuckDB oracle replays the
forward pass exactly. SQL value verification on the real tables lives
in the quality_tokens gate's qc_score column."""

from __future__ import annotations

import math

import pytest


def _labeled(spark, n=40):
    """Fluent English (label 1) vs the same docs reversed char-wise
    (label 0) — unigram-separable junk, ids disjoint."""
    from pyspark.sql import functions as F

    fluent = [
        (i, 1, f"the quick brown fox number {i} jumps over the lazy dog "
               "while the curious cat watches from the warm windowsill")
        for i in range(n)
    ]
    df = spark.createDataFrame(fluent, "doc_id long, label int, text string")
    junk = df.select(
        (F.col("doc_id") + 10_000).alias("doc_id"),
        F.lit(0).alias("label"),
        F.reverse(F.col("text")).alias("text"),
    )
    return df.unionByName(junk)


class TestFit:
    def test_separates_fluent_from_junk_and_loss_decreases(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_fit,
            quality_classifier_score,
        )

        train = _labeled(spark)
        model = quality_classifier_fit(
            train, dim=1 << 10, ngrams=1, iters=12, lr=10.0
        )
        assert model.loss_history[0] == pytest.approx(math.log(2), abs=1e-6)
        assert model.loss_history[-1] < 0.5 * model.loss_history[0]
        # held-out: unseen fluent vs unseen junk must order correctly
        probe = spark.createDataFrame(
            [
                (1, "the small dog jumps over the brown fence while the "
                    "happy cat watches from the quiet garden"),
                (2, "nedrag teiuq eht morf sehctaw tac yppah eht elihw"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["qc_score"]
            for r in quality_classifier_score(probe, model).collect()
        }
        assert got[1] > 0.5 > got[2]

    def test_bigram_features_separate_token_order(self, spark):
        """Sorted-token junk keeps the unigram distribution — only the
        bigram features can tell it apart."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_fit,
            quality_classifier_score,
        )

        base = _labeled(spark).where("label = 1")
        junk = base.select(
            (F.col("doc_id") + 10_000).alias("doc_id"),
            F.lit(0).alias("label"),
            F.array_join(
                F.sort_array(F.split(F.col("text"), " ")), " "
            ).alias("text"),
        )
        train = base.unionByName(junk)
        model = quality_classifier_fit(
            train, dim=1 << 12, ngrams=2, iters=60, lr=10.0
        )
        scored = quality_classifier_score(train, model)
        acc = scored.selectExpr(
            "avg(CASE WHEN (qc_score >= 0.5) = (label = 1) THEN 1.0 "
            "ELSE 0.0 END) AS acc"
        ).first()["acc"]
        assert acc >= 0.9
        # the shared unigrams cancel; separation is entirely bigram mass
        rows = scored.select("label", "qc_score").collect()
        lo_fluent = min(r["qc_score"] for r in rows if r["label"] == 1)
        hi_junk = max(r["qc_score"] for r in rows if r["label"] == 0)
        assert lo_fluent > hi_junk

    def test_fit_is_bit_deterministic(self, spark):
        """Training sums run as DECIMAL (exact, order-independent), so
        two fits on the same data yield IDENTICAL weights — required
        because the learned bias is baked into downstream plan
        signatures (bench comparability)."""
        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_fit,
        )

        train = _labeled(spark, n=10)
        a = quality_classifier_fit(train, dim=256, ngrams=2, iters=4)
        b = quality_classifier_fit(train, dim=256, ngrams=2, iters=4)
        assert a.bias == b.bias
        assert a.weights == b.weights
        assert a.loss_history == b.loss_history

    def test_save_load_roundtrip_scores_identically(self, spark, tmp_path):
        """The shipped artifact must restore the EXACT model: same
        hyperparameters, same bias, bit-identical scores."""
        from cod_stats_spark.operators.quality_classifier import (
            load_classifier,
            quality_classifier_fit,
            quality_classifier_score,
            save_classifier,
        )

        train = _labeled(spark, n=10)
        a = quality_classifier_fit(train, dim=256, ngrams=2, iters=4)
        save_classifier(spark, a, str(tmp_path / "model"))
        b = load_classifier(spark, str(tmp_path / "model"))
        assert (b.dim, b.ngrams, b.base_hash, b.lowercase, b.bias) == (
            a.dim, a.ngrams, a.base_hash, a.lowercase, a.bias
        )
        assert b.weights == a.weights
        probe = train.limit(5)
        sa = {r["doc_id"]: r["qc_score"]
              for r in quality_classifier_score(probe, a).collect()}
        sb = {r["doc_id"]: r["qc_score"]
              for r in quality_classifier_score(probe, b).collect()}
        assert sa == sb

    def test_torn_save_rejected_exactly(self, spark, tmp_path):
        """A weights/ tree from one save under a meta/ from another
        (crash between the two overwrites) must refuse to load; the
        fingerprint is integer-exact and order-independent, so an
        INTACT artifact never trips it however parquet reorders the
        read-back (r10 advice: the old float-sum tolerance could
        spuriously reject large-dim models)."""
        import shutil

        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
            _weights_fingerprint,
            load_classifier,
            save_classifier,
        )

        w1 = [0.0] * 256
        w2 = [0.0] * 256
        for i in range(0, 256, 3):
            w1[i] = (i - 128) / 7.0
            w2[i] = (i - 128) / 7.0 + 1e-9  # sub-float-tolerance tear
        m1 = QualityClassifierModel(dim=256, ngrams=2, weights=w1, bias=0.1)
        m2 = QualityClassifierModel(dim=256, ngrams=2, weights=w2, bias=0.1)
        save_classifier(spark, m1, str(tmp_path / "a"))
        save_classifier(spark, m2, str(tmp_path / "b"))
        # intact artifacts load
        assert load_classifier(spark, str(tmp_path / "a")).weights == w1
        # tear: a's meta over b's weights — same n_nonzero, weight
        # values differing below any float-sum tolerance
        shutil.rmtree(tmp_path / "b" / "meta")
        shutil.copytree(tmp_path / "a" / "meta", tmp_path / "b" / "meta")
        with pytest.raises(ValueError, match="torn"):
            load_classifier(spark, str(tmp_path / "b"))
        # the fingerprint itself is order-independent
        pairs = [(i, w) for i, w in enumerate(w1) if w != 0.0]
        assert _weights_fingerprint(pairs) == _weights_fingerprint(
            list(reversed(pairs))
        )

    def test_legacy_wsum_artifact_loads(self, spark, tmp_path):
        """A pre-r11 artifact (meta with the float-sum 'wsum' column,
        no 'wfp') must still load — crashing on the missing field
        would strand every previously shipped model (r11 review)."""
        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
            load_classifier,
        )

        w = [0.0] * 64
        for i in range(0, 64, 5):
            w[i] = (i - 32) / 11.0
        m = QualityClassifierModel(dim=64, ngrams=2, weights=w, bias=0.25)
        nz = [(i, float(v)) for i, v in enumerate(w) if v != 0.0]
        path = str(tmp_path / "legacy")
        spark.createDataFrame(nz, "fid int, w double").coalesce(
            1
        ).write.parquet(f"{path}/weights")
        # the r10 meta shape: wsum = round(sum(w), 9)
        spark.createDataFrame(
            [(64, 2, "xxhash64", True, 0.25, len(nz),
              round(sum(v for _, v in nz), 9))],
            "dim int, ngrams int, base_hash string, lowercase boolean, "
            "bias double, n_nonzero int, wsum double",
        ).coalesce(1).write.parquet(f"{path}/meta")
        got = load_classifier(spark, path)
        assert got.weights == m.weights and got.bias == m.bias
        # and a genuinely torn legacy artifact still refuses
        spark.createDataFrame(
            [(64, 2, "xxhash64", True, 0.25, len(nz),
              round(sum(v for _, v in nz), 9) + 0.5)],
            "dim int, ngrams int, base_hash string, lowercase boolean, "
            "bias double, n_nonzero int, wsum double",
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/meta")
        with pytest.raises(ValueError, match="torn"):
            load_classifier(spark, path)

    def test_guards(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
            quality_classifier_fit,
        )

        df = _labeled(spark, n=2)
        with pytest.raises(ValueError):
            quality_classifier_fit(df, dim=1 << 23)  # driver-state bound
        with pytest.raises(ValueError):
            quality_classifier_fit(df.where("doc_id < 0"), dim=64)  # empty
        with pytest.raises(ValueError):
            QualityClassifierModel(dim=8, ngrams=3)
        with pytest.raises(ValueError):
            QualityClassifierModel(dim=8, base_hash="nope")
        with pytest.raises(ValueError):
            QualityClassifierModel(dim=8, weights=[0.0] * 4)


class TestScorePaths:
    def _model(self):
        import random

        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
        )

        rng = random.Random(7)
        return QualityClassifierModel(
            dim=64,
            ngrams=2,
            base_hash="md5_60",
            bias=-0.2,
            weights=[rng.uniform(-1, 1) for _ in range(64)],
        )

    def _docs(self, spark):
        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "Mixed CASE text   with   extra   spaces"),
            (3, ""),
            (4, "one"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_expression_equals_relation_paths(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_score,
        )

        model, docs = self._model(), self._docs(spark)
        by = lambda df: {
            r["doc_id"]: round(r["qc_score"], 10) for r in df.collect()
        }
        a = by(quality_classifier_score(docs, model, as_expression=True))
        b = by(quality_classifier_score(docs, model, as_expression=False))
        c = by(
            quality_classifier_score(
                docs, model, as_expression=False, broadcast_model=False
            )
        )
        assert a == b == c
        # empty doc scores exactly sigmoid(bias)
        assert a[3] == pytest.approx(1 / (1 + math.exp(0.2)), abs=1e-9)

    def test_expression_path_refuses_big_dims(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
            quality_classifier_expr,
        )

        big = QualityClassifierModel(dim=1 << 13)
        with pytest.raises(ValueError):
            quality_classifier_expr(big)

    def test_oracle_sql_replays_forward_pass(self, spark):
        """The DuckDB replica must match the Spark expression path to
        6 decimals on the same rows (the gate's rounding)."""
        import duckdb

        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_oracle_sql,
            quality_classifier_score,
        )

        model, docs = self._model(), self._docs(spark)
        got = {
            r["doc_id"]: round(r["qc_score"], 6)
            for r in quality_classifier_score(docs, model).collect()
        }
        pdf = docs.toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        want = {
            int(d): float(s)
            for d, s in con.execute(
                quality_classifier_oracle_sql(model)
            ).fetchall()
        }
        assert got == {k: round(v, 6) for k, v in want.items()}

    def test_oracle_requires_replayable_hash(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            QualityClassifierModel,
            quality_classifier_oracle_sql,
        )

        with pytest.raises(ValueError):
            quality_classifier_oracle_sql(QualityClassifierModel(dim=8))

    def test_expression_path_is_zero_shuffle(self, spark):
        from cod_stats_spark.operators.quality_classifier import (
            quality_classifier_score,
        )

        model, docs = self._model(), self._docs(spark)
        plan = quality_classifier_score(
            docs, model
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
