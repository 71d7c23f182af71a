"""DSIR importance resampling (operators/dsir.py): the fit prefers
target-like documents, is bit-deterministic, both scoring paths agree
on exact integer micro-units, Gumbel top-k selection is a pure
function of the data (partitioning-independent, salt-sensitive), the
DuckDB oracle replays scoring AND selection exactly, and artifacts
round-trip with torn-save detection. SQL value verification on the
real tables lives in the stratified_sample gate's 'dsir' arm."""

from __future__ import annotations

import pytest


def _corpora(spark):
    """Target: science-flavored prose. Raw: the same science docs
    interleaved with spam-flavored ones — DSIR should pull science."""
    sci = [
        (i, f"the experiment number {i} measured the electron energy "
            "spectrum and the detector recorded the particle decay")
        for i in range(30)
    ]
    spam = [
        (1000 + i, f"click here winner {i} free prize casino jackpot "
                   "buy now limited offer click click prize")
        for i in range(30)
    ]
    target = spark.createDataFrame(sci, "doc_id long, text string")
    raw = spark.createDataFrame(sci + spam, "doc_id long, text string")
    return target, raw


class TestFit:
    def test_prefers_target_like_docs(self, spark):
        from cod_stats_spark.operators.dsir import dsir_fit, dsir_score

        target, raw = _corpora(spark)
        model = dsir_fit(target, raw, dim=1 << 10, ngrams=1)
        got = {
            r["doc_id"]: r["dsir_logw"]
            for r in dsir_score(raw, model).collect()
        }
        sci_min = min(v for k, v in got.items() if k < 1000)
        spam_max = max(v for k, v in got.items() if k >= 1000)
        assert sci_min > spam_max

    def test_fit_is_deterministic(self, spark):
        from cod_stats_spark.operators.dsir import dsir_fit

        target, raw = _corpora(spark)
        a = dsir_fit(target, raw.repartition(7), dim=256, ngrams=2)
        b = dsir_fit(target.repartition(3), raw, dim=256, ngrams=2)
        assert a.log_ratio6 == b.log_ratio6

    def test_empty_corpus_raises(self, spark):
        from cod_stats_spark.operators.dsir import dsir_fit

        target, raw = _corpora(spark)
        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="empty feature stream"):
            dsir_fit(target, empty, dim=64)

    def test_parameter_validation(self):
        from cod_stats_spark.operators.dsir import DsirModel

        with pytest.raises(ValueError):
            DsirModel(dim=8, smoothing=0.0)
        with pytest.raises(ValueError):
            DsirModel(dim=8, ngrams=3)
        with pytest.raises(ValueError):
            DsirModel(dim=8, base_hash="sha1")
        with pytest.raises(ValueError):
            DsirModel(dim=8, log_ratio6=[1, 2])


def _fixed_model(dim=64, ngrams=2, base_hash="md5_60"):
    import random

    from cod_stats_spark.operators.dsir import DsirModel

    rng = random.Random(20260816)
    return DsirModel(
        dim=dim,
        ngrams=ngrams,
        base_hash=base_hash,
        log_ratio6=[rng.randint(-2_000_000, 2_000_000) for _ in range(dim)],
    )


class TestScore:
    def test_expression_equals_relation_paths(self, spark):
        from cod_stats_spark.operators.dsir import dsir_score

        _, raw = _corpora(spark)
        model = _fixed_model()
        kw = dict(micro_col="m")
        e = {r["doc_id"]: r["m"] for r in dsir_score(
            raw, model, as_expression=True, **kw).collect()}
        rel = {r["doc_id"]: r["m"] for r in dsir_score(
            raw, model, as_expression=False, **kw).collect()}
        shuf = {r["doc_id"]: r["m"] for r in dsir_score(
            raw, model, as_expression=False, broadcast_model=False,
            **kw).collect()}
        assert e == rel == shuf
        assert any(v != 0 for v in e.values())

    def test_null_and_empty_text_score_zero(self, spark):
        from cod_stats_spark.operators.dsir import dsir_score

        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "   ")], "doc_id long, text string"
        )
        model = _fixed_model()
        for as_expr in (True, False):
            got = {
                r["doc_id"]: (r["m"], r["dsir_logw"])
                for r in dsir_score(
                    docs, model, micro_col="m", as_expression=as_expr
                ).collect()
            }
            assert got == {1: (0, 0.0), 2: (0, 0.0), 3: (0, 0.0)}

    def test_expression_path_is_zero_shuffle(self, spark):
        from cod_stats_spark.operators.dsir import dsir_score

        _, raw = _corpora(spark)
        plan = dsir_score(
            raw, _fixed_model(), as_expression=True
        )._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_expression_dim_cap(self, spark):
        from cod_stats_spark.operators.dsir import (
            DsirModel,
            dsir_logweight_expr,
        )

        with pytest.raises(ValueError, match="relation path"):
            dsir_logweight_expr(DsirModel(dim=1 << 13))


class TestSelect:
    def test_partitioning_independent_and_salt_sensitive(self, spark):
        from cod_stats_spark.operators.dsir import dsir_select

        _, raw = _corpora(spark)
        model = _fixed_model()
        a = sorted(
            r["doc_id"]
            for r in dsir_select(raw, model, n=20, salt="s1").collect()
        )
        b = sorted(
            r["doc_id"]
            for r in dsir_select(
                raw.repartition(11), model, n=20, salt="s1"
            ).collect()
        )
        c = sorted(
            r["doc_id"]
            for r in dsir_select(raw, model, n=20, salt="s2").collect()
        )
        assert a == b
        assert a != c

    def test_selection_biases_toward_high_weight(self, spark):
        """With the fitted science-vs-spam model, a 20-of-60 resample
        must be dominated by science docs (their importance weights
        are exponentially larger)."""
        from cod_stats_spark.operators.dsir import dsir_fit, dsir_select

        target, raw = _corpora(spark)
        model = dsir_fit(target, raw, dim=1 << 10, ngrams=1)
        picked = [
            r["doc_id"] for r in dsir_select(raw, model, n=20).collect()
        ]
        assert len(picked) == 20
        assert sum(1 for d in picked if d < 1000) >= 18

    def test_select_plan_is_top_k_not_full_sort(self, spark):
        from cod_stats_spark.operators.dsir import dsir_select

        _, raw = _corpora(spark)
        plan = dsir_select(
            raw, _fixed_model(), n=5
        )._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan

    def test_micro_col_exposed_when_asked(self, spark):
        from cod_stats_spark.operators.dsir import dsir_select

        _, raw = _corpora(spark)
        out = dsir_select(raw, _fixed_model(), n=5, micro_col="m")
        assert "m" in out.columns and "dsir_logw" in out.columns
        row = out.first()
        assert row["dsir_logw"] == pytest.approx(row["m"] / 1e6)


class TestOracle:
    def _duck(self, raw):
        import duckdb

        con = duckdb.connect()
        con.register("documents", raw.toPandas())
        return con

    def test_scoring_oracle_matches_exact_integers(self, spark):
        from cod_stats_spark.operators.dsir import dsir_oracle_sql, dsir_score

        _, raw = _corpora(spark)
        model = _fixed_model()
        got = {
            r["doc_id"]: r["m"]
            for r in dsir_score(raw, model, micro_col="m").collect()
        }
        con = self._duck(raw)
        want = {
            int(d): int(m)
            for d, m, _ in con.execute(dsir_oracle_sql(model)).fetchall()
        }
        assert got == want

    def test_selection_oracle_matches_exact_ids(self, spark):
        from cod_stats_spark.operators.dsir import (
            dsir_select,
            dsir_select_oracle_sql,
        )

        _, raw = _corpora(spark)
        model = _fixed_model()
        got = [
            (r["doc_id"], r["m"])
            for r in dsir_select(
                raw, model, n=15, salt="g", micro_col="m"
            ).collect()
        ]
        con = self._duck(raw)
        want = [
            (int(d), int(m))
            for d, m in con.execute(
                dsir_select_oracle_sql(model, n=15, salt="g")
            ).fetchall()
        ]
        assert sorted(got) == sorted(want)

    def test_oracle_requires_replayable_hash(self):
        from cod_stats_spark.operators.dsir import dsir_oracle_sql

        with pytest.raises(ValueError, match="md5_60"):
            dsir_oracle_sql(_fixed_model(base_hash="xxhash64"))


class TestArtifact:
    def test_round_trip(self, spark, tmp_path):
        from cod_stats_spark.operators.dsir import (
            dsir_fit,
            load_dsir,
            save_dsir,
        )

        target, raw = _corpora(spark)
        model = dsir_fit(target, raw, dim=256, ngrams=2)
        save_dsir(spark, model, str(tmp_path / "m"))
        back = load_dsir(spark, str(tmp_path / "m"))
        assert back.log_ratio6 == model.log_ratio6
        assert (back.dim, back.ngrams, back.base_hash, back.smoothing) == (
            model.dim, model.ngrams, model.base_hash, model.smoothing
        )

    def test_torn_artifact_refuses_to_load(self, spark, tmp_path):
        from cod_stats_spark.operators.dsir import (
            dsir_fit,
            load_dsir,
            save_dsir,
        )

        target, raw = _corpora(spark)
        model = dsir_fit(target, raw, dim=64, ngrams=1)
        path = str(tmp_path / "m")
        save_dsir(spark, model, path)
        # simulate a crash mid re-save: ratios overwritten, meta stale
        spark.createDataFrame(
            [(0, 42)], "fid int, lam6 long"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/ratios")
        with pytest.raises(ValueError, match="torn"):
            load_dsir(spark, path)
