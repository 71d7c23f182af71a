"""Trained language ID (operators/lang_classifier.py): multiclass
hashed char-n-gram softmax — fit properties, path equivalences, oracle
replay, artifact round-trip, heuristic parity, and the CCNet funnel
composition (lang_pred feeding perplexity_partition(by=))."""

import math

import pytest

from pyspark.sql import functions as F


def _corpus_df(spark, n_per_lang=60, seed=7, doc_id_start=0):
    from cod_stats_spark.operators.lang_classifier import (
        synthetic_lang_corpus,
    )

    rows = synthetic_lang_corpus(
        n_per_lang=n_per_lang, seed=seed, doc_id_start=doc_id_start
    )
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    )


@pytest.fixture(scope="module")
def trained(spark):
    """One fit shared across the module (fit is the slow part)."""
    from cod_stats_spark.operators.lang_classifier import (
        lang_classifier_fit,
    )

    train = _corpus_df(spark, n_per_lang=60, seed=7)
    return lang_classifier_fit(
        train, dim=1 << 10, orders=(1, 2, 3), iters=12, lr=10.0
    )


class TestFit:
    def test_loss_decreases_and_holdout_accuracy(self, spark, trained):
        assert trained.loss_history[0] > trained.loss_history[-1]
        # untrained loss is ln(K) (uniform softmax)
        assert abs(trained.loss_history[0] - math.log(5)) < 1e-6
        # held-out synthetic docs (different seed -> different stems)
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
        )

        test = _corpus_df(spark, n_per_lang=25, seed=99, doc_id_start=10_000)
        scored = lang_classifier_score(test, trained).select(
            "lang", "lang_pred"
        )
        rows = scored.collect()
        acc = sum(r["lang"] == r["lang_pred"] for r in rows) / len(rows)
        assert acc >= 0.95, f"holdout accuracy {acc}"

    def test_fit_is_bit_deterministic(self, spark):
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_fit,
        )

        train = _corpus_df(spark, n_per_lang=15, seed=3)
        a = lang_classifier_fit(train, dim=256, iters=3)
        b = lang_classifier_fit(
            train.repartition(13), dim=256, iters=3
        )
        assert a.weights == b.weights
        assert a.biases == b.biases

    def test_guards(self, spark):
        from cod_stats_spark.operators.lang_classifier import (
            LangClassifierModel,
            lang_classifier_fit,
        )

        df = _corpus_df(spark, n_per_lang=2)
        with pytest.raises(ValueError, match=">= 2 classes"):
            lang_classifier_fit(df.where("lang = 'en'"), dim=64)
        with pytest.raises(ValueError, match="no labeled"):
            lang_classifier_fit(df.where("doc_id < 0"), dim=64,
                                classes=["de", "en"])
        with pytest.raises(ValueError, match="sorted"):
            LangClassifierModel(dim=8, classes=["en", "de"])
        with pytest.raises(ValueError, match="shape"):
            LangClassifierModel(
                dim=8, classes=["de", "en"], biases=[0.0]
            )
        with pytest.raises(ValueError, match="orders"):
            LangClassifierModel(dim=8, classes=["de", "en"], orders=(0,))


def _fixed_model(base_hash="md5_60", dim=48):
    """Small fixed-literal model (seeded weights, 6-dp) — the gate
    posture: forward-pass verification doesn't need a trained model."""
    import random

    from cod_stats_spark.operators.lang_classifier import (
        LangClassifierModel,
    )

    classes = ["de", "en", "es", "fr", "zh"]
    rng = random.Random(20260816)
    return LangClassifierModel(
        dim=dim,
        classes=classes,
        orders=(1, 2, 3),
        base_hash=base_hash,
        biases=[round(rng.uniform(-0.5, 0.5), 6) for _ in classes],
        weights=[
            [round(rng.uniform(-1.0, 1.0), 6) for _ in range(dim)]
            for _ in classes
        ],
    )


class TestForwardPass:
    def test_expression_equals_relation_paths(self, spark):
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
        )

        m = _fixed_model()
        docs = _corpus_df(spark, n_per_lang=10, seed=11).union(
            spark.createDataFrame(
                [(9001, None, None), (9002, None, ""), (9003, None, "   ")],
                "doc_id long, lang string, text string",
            )
        )
        kw = dict(margin_col="lang_margin")
        a = lang_classifier_score(
            docs, m, as_expression=True, **kw
        ).orderBy("doc_id").collect()
        b = lang_classifier_score(
            docs, m, as_expression=False, **kw
        ).orderBy("doc_id").collect()
        c = lang_classifier_score(
            docs, m, as_expression=False, broadcast_model=False, **kw
        ).orderBy("doc_id").collect()
        for ra, rb, rc in zip(a, b, c):
            assert ra["lang_pred"] == rb["lang_pred"] == rc["lang_pred"]
            assert ra["lang_margin"] == rb["lang_margin"] == rc["lang_margin"]

    def test_expression_path_refuses_big_models(self, spark):
        from cod_stats_spark.operators.lang_classifier import (
            LangClassifierModel,
            lang_classifier_expr,
        )

        big = LangClassifierModel(dim=2048, classes=["de", "en", "es"])
        with pytest.raises(ValueError, match="relation path"):
            lang_classifier_expr(big)

    def test_tie_breaks_ascending_class_code(self, spark):
        """All-zero weights and equal biases -> every margin ties; the
        prediction must be the ascending-first class on every path."""
        from cod_stats_spark.operators.lang_classifier import (
            LangClassifierModel,
            lang_classifier_score,
        )

        m = LangClassifierModel(dim=16, classes=["de", "en", "zh"])
        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "")], "doc_id long, text string"
        )
        for expr in (True, False):
            got = {
                r["doc_id"]: r["lang_pred"]
                for r in lang_classifier_score(
                    docs, m, as_expression=expr
                ).collect()
            }
            assert got == {1: "de", 2: "de"}

    def test_oracle_sql_replays_forward_pass(self, spark):
        import duckdb

        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_oracle_sql,
            lang_classifier_score,
        )

        m = _fixed_model()
        docs = _corpus_df(spark, n_per_lang=12, seed=5).union(
            spark.createDataFrame(
                [(9001, None, None), (9002, None, "1 < 2 & x 'y'")],
                "doc_id long, lang string, text string",
            )
        )
        got = {
            r["doc_id"]: (r["lang_pred"], r["lang_margin"])
            for r in lang_classifier_score(
                docs, m, as_expression=False, margin_col="lang_margin"
            ).collect()
        }
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        duck = {
            r[0]: (r[1], r[2])
            for r in con.sql(lang_classifier_oracle_sql(m)).fetchall()
        }
        assert got == duck

    def test_oracle_requires_replayable_hash(self):
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_oracle_sql,
        )

        with pytest.raises(ValueError, match="md5_60"):
            lang_classifier_oracle_sql(_fixed_model(base_hash="xxhash64"))


class TestArtifact:
    def test_save_load_roundtrip_scores_identically(
        self, spark, trained, tmp_path
    ):
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
            load_lang_classifier,
            save_lang_classifier,
        )

        path = str(tmp_path / "langid")
        save_lang_classifier(spark, trained, path)
        back = load_lang_classifier(spark, path)
        assert back.weights == trained.weights
        assert back.biases == trained.biases
        assert back.classes == trained.classes
        assert back.orders == trained.orders
        docs = _corpus_df(spark, n_per_lang=5, seed=42)
        a = lang_classifier_score(docs, trained).orderBy("doc_id").collect()
        b = lang_classifier_score(docs, back).orderBy("doc_id").collect()
        assert [r["lang_pred"] for r in a] == [r["lang_pred"] for r in b]

    def test_torn_save_rejected(self, spark, tmp_path):
        from cod_stats_spark.operators.lang_classifier import (
            load_lang_classifier,
            save_lang_classifier,
        )

        m1 = _fixed_model(dim=32)
        m2 = _fixed_model(dim=32)
        m2.weights = [[round(w * 0.5, 6) for w in row] for row in m2.weights]
        path = str(tmp_path / "torn")
        save_lang_classifier(spark, m1, path)
        # simulate a crash between the two overwrites: new weights,
        # old meta
        import shutil

        meta_bak = str(tmp_path / "meta_bak")
        shutil.copytree(f"{path}/meta", meta_bak)
        save_lang_classifier(spark, m2, path)
        shutil.rmtree(f"{path}/meta")
        shutil.copytree(meta_bak, f"{path}/meta")
        with pytest.raises(ValueError, match="torn"):
            load_lang_classifier(spark, path)


class TestHeuristicParity:
    def test_agrees_with_heuristic_on_its_own_markers(self, spark, trained):
        """Confusion check on the heuristic's home turf: documents made
        purely of one language's marker words must get the same label
        from the trained model as from functions/text.lang_id."""
        from cod_stats_spark.functions.text import LANG_MARKERS, lang_id
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
        )

        rows = [
            (i, lang, " ".join(LANG_MARKERS[lang] * 4))
            for i, lang in enumerate(sorted(LANG_MARKERS))
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        scored = lang_classifier_score(docs, trained).withColumn(
            "lang_heur", lang_id(F.col("text"))
        )
        for r in scored.collect():
            assert r["lang_pred"] == r["lang_heur"] == r["lang"]


class TestFunnelComposition:
    def test_perplexity_partition_by_trained_lang(self, spark, trained):
        """The CCNet chain the verdict asked for: trained lang_pred ->
        per-language LM perplexity partitioning. Buckets must be
        balanced WITHIN each predicted language (per-group cuts), and
        every predicted language present."""
        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
        )
        from cod_stats_spark.operators.lm_score import (
            perplexity_partition,
            unigram_lm_fit,
            unigram_lm_score,
        )

        docs = _corpus_df(spark, n_per_lang=30, seed=21)
        labeled = lang_classifier_score(docs, trained)
        model = unigram_lm_fit(labeled)
        scored = unigram_lm_score(labeled, model).join(
            labeled.select("doc_id", "lang_pred"), "doc_id"
        )
        parts = perplexity_partition(
            scored, nll_col="lm_nll", buckets=3, by="lang_pred"
        )
        counts = {
            (r["lang_pred"], r["ppl_bucket"]): r["n"]
            for r in parts.groupBy("lang_pred", "ppl_bucket")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        langs = {k[0] for k in counts}
        assert langs == {"de", "en", "es", "fr", "zh"}
        for lang in langs:
            per = [counts.get((lang, b), 0) for b in (1, 2, 3)]
            assert sum(per) == 30
            # value-based buckets on continuous scores: near-balanced
            assert all(5 <= c <= 20 for c in per), (lang, per)


class TestMixtureComposition:
    def test_temperature_mixture_by_trained_lang(self, spark, trained):
        """The other half of the CCNet/mC4 chain (r13): trained
        lang_pred feeds temperature rebalancing — the dominant
        predicted language thins, the scarce one upsamples, and the
        output reproduces under repartitioning (the weights derive
        from the PREDICTED distribution, end to end trained)."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.lang_classifier import (
            lang_classifier_score,
        )
        from cod_stats_spark.operators.sampling import temperature_mixture

        # skewed corpus: lots of en, little zh
        docs = _corpus_df(spark, n_per_lang=8, seed=11).where(
            "lang != 'en' OR doc_id % 1 = 0"
        ).unionByName(
            _corpus_df(spark, n_per_lang=40, seed=12, doc_id_start=10_000)
            .where("lang = 'en'")
        )
        labeled = lang_classifier_score(docs, trained)
        mixed = temperature_mixture(
            labeled, "doc_id", "lang_pred", alpha=0.3, max_weight=4.0
        )
        by = {
            r["lang_pred"]: r["n"]
            for r in mixed.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        pre = {
            r["lang_pred"]: r["n"]
            for r in labeled.groupBy("lang_pred")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert by["en"] < pre["en"]          # dominant thins
        scarce = min(pre, key=pre.get)
        assert by[scarce] > pre[scarce]      # scarce upsamples
        again = sorted(
            (r["doc_id"], r["epoch"])
            for r in temperature_mixture(
                labeled.repartition(9), "doc_id", "lang_pred",
                alpha=0.3, max_weight=4.0,
            ).collect()
        )
        assert again == sorted(
            (r["doc_id"], r["epoch"]) for r in mixed.collect()
        )


class TestZeroGramDocs:
    def test_paths_agree_when_no_order_fits(self, spark):
        """min(orders) > 2 on empty/NULL text yields ZERO grams (the
        two padding spaces only cover 1/2-grams): both paths must
        return the bias-argmax label and the winning bias as the
        margin — not divide by zero (ANSI crash; r13 review,
        verified repro)."""
        import random

        from cod_stats_spark.operators.lang_classifier import (
            LangClassifierModel,
            lang_classifier_score,
        )

        rng = random.Random(3)
        model = LangClassifierModel(
            dim=16,
            classes=["de", "en", "fr"],
            orders=(3,),
            biases=[0.1, 0.7, -0.2],
            weights=[[round(rng.uniform(-1, 1), 6) for _ in range(16)]
                     for _ in range(3)],
        )
        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "hello there friend")],
            "doc_id long, text string",
        )
        results = {}
        for as_expr in (True, False):
            results[as_expr] = {
                r["doc_id"]: (r["lang_pred"], r["lang_margin"])
                for r in lang_classifier_score(
                    docs, model, as_expression=as_expr,
                    margin_col="lang_margin",
                ).collect()
            }
        assert results[True] == results[False]
        # zero-gram docs take the winning bias (en, 0.7)
        assert results[True][1] == ("en", 0.7)
        assert results[True][2] == ("en", 0.7)
