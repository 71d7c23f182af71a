"""Order-K interpolated Kneser-Ney (operators/lm_score.py
ngram_lm_fit / kn_ngram_score / kn_ngram_oracle_sql / the generalized
kn_to_arpa / save_arpa_relations+load_arpa_relations): hand-computed
order-2 probabilities, exact K=3 parity with the hardwired
kn_lm_score, DuckDB re-derivation at every order 2..5, the order-5
export parity pin (the r15 verdict's "done" criterion), the same-fit
contract probes, and the parquet relation round trip."""

from __future__ import annotations

import math
import os

import pytest


_CORPUS = [
    (1, "a b c a b d e f a b c"),
    (2, "b c a b c e f a a b"),
    (3, "c a a d b c f e a b c d"),
    (4, "e f a b c d a b"),
]
# probes exercising every branch at order 5: seen 5-gram; unseen
# n-grams with seen contexts at each layer; unseen contexts; OOV
# target; OOV context; 1..4-token docs; zero tokens
_PROBES = [
    (10, "a b c d e"), (11, "a b a"), (12, "d d c"), (13, "a b z"),
    (14, "z a b"), (15, "c a"), (16, "q"), (17, "f a b c d"),
    (18, "c c c a b d e f a b"), (19, "   "), (20, "e f a b"),
]


def _fit_models(spark, order, rows=None):
    from cod_stats_spark.operators.lm_score import ngram_lm_fit

    docs = spark.createDataFrame(
        rows or _CORPUS, "doc_id long, text string"
    )
    return docs, [ngram_lm_fit(docs, k) for k in range(1, order + 1)]


def _probe_df(spark):
    return spark.createDataFrame(
        _CORPUS + _PROBES, "doc_id long, text string"
    )


class TestNgramFit:
    def test_matches_specialized_fits(self, spark):
        from cod_stats_spark.operators.lm_score import (
            bigram_lm_fit,
            ngram_lm_fit,
            trigram_lm_fit,
            unigram_lm_fit,
        )

        docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
        assert {tuple(r) for r in ngram_lm_fit(docs, 1).collect()} == {
            tuple(r) for r in unigram_lm_fit(docs).collect()
        }
        assert {tuple(r) for r in ngram_lm_fit(docs, 2).collect()} == {
            tuple(r) for r in bigram_lm_fit(docs).collect()
        }
        assert {tuple(r) for r in ngram_lm_fit(docs, 3).collect()} == {
            tuple(r) for r in trigram_lm_fit(docs).collect()
        }

    def test_order4_hand_counted(self, spark):
        from cod_stats_spark.operators.lm_score import ngram_lm_fit

        docs = spark.createDataFrame(
            [(1, "a b a b a b")], "doc_id long, text string"
        )
        got = {
            (r["w1"], r["w2"], r["w3"], r["w4"]): r["cnt"]
            for r in ngram_lm_fit(docs, 4).collect()
        }
        assert got == {
            ("a", "b", "a", "b"): 2,
            ("b", "a", "b", "a"): 1,
        }

    def test_validation(self, spark):
        from cod_stats_spark.operators.lm_score import ngram_lm_fit

        docs = spark.createDataFrame(_CORPUS, "doc_id long, text string")
        with pytest.raises(ValueError, match="n must be >= 1"):
            ngram_lm_fit(docs, 0)


class TestKnNgramScore:
    def test_k2_hand_computed(self, spark):
        """Corpus = one doc 'a b a b c' (D=0.5, α=1).

        Bigram types ab(2) ba(1) bc(1) -> ncc=3; V=3;
        P1(w) = (1+1)/(3+3) = 1/3 for a, b, c.
        c(a)=2 c(b)=2; N1+(a·)=1 (ab), N1+(b·)=2 (ba, bc).
        pos1 'a': 1/3.
        pos 'b'|a: (2-.5)/2 + .5*1/2*(1/3) = 3/4 + 1/12 = 5/6.
        pos 'a'|b: (1-.5)/2 + .5*2/2*(1/3) = 1/4 + 1/6 = 5/12.
        pos 'c'|b: same shape = 5/12.
        """
        from cod_stats_spark.operators.lm_score import kn_ngram_score

        docs, models = _fit_models(spark, 2, [(1, "a b a b c")])
        got = kn_ngram_score(
            docs, models, discount=0.5, alpha=1.0
        ).first()
        assert got["kn_tokens"] == 5
        want = -(
            math.log(1 / 3)
            + 2 * math.log(5 / 6)
            + 2 * math.log(5 / 12)
        ) / 5
        assert got["kn_nll"] == pytest.approx(want, rel=1e-12)

    def test_k3_matches_kn_lm_score(self, spark):
        """The generic recursion at K=3 is the hardwired trigram
        scorer formula for formula — exact, not approximate."""
        from cod_stats_spark.operators.lm_score import (
            kn_lm_score,
            kn_ngram_score,
        )

        _, models = _fit_models(spark, 3)
        probes = _probe_df(spark)
        old = {
            r["doc_id"]: (r["lm3_tokens"], r["lm3_nll"])
            for r in kn_lm_score(
                probes, models[0], models[1], models[2]
            ).collect()
        }
        new = {
            r["doc_id"]: (r["kn_tokens"], r["kn_nll"])
            for r in kn_ngram_score(probes, models).collect()
        }
        assert set(old) == set(new)
        for k in old:
            assert new[k][0] == old[k][0], k
            assert new[k][1] == pytest.approx(
                old[k][1], rel=1e-12, abs=1e-15
            ), k

    def test_broadcast_shuffled_parity_k5(self, spark):
        from cod_stats_spark.operators.lm_score import kn_ngram_score

        _, models = _fit_models(spark, 5)
        probes = _probe_df(spark)
        a = {
            r["doc_id"]: (r["kn_tokens"], r["kn_nll"])
            for r in kn_ngram_score(probes, models).collect()
        }
        b = {
            r["doc_id"]: (r["kn_tokens"], r["kn_nll"])
            for r in kn_ngram_score(
                probes, models, broadcast_model=False
            ).collect()
        }
        assert a == b

    def test_zero_and_short_docs(self, spark):
        """Zero-token docs score (0, 0.0); a corpus of docs SHORTER
        than the order leaves the upper tables empty and every
        position backs off below them."""
        from cod_stats_spark.operators.lm_score import kn_ngram_score

        docs, models = _fit_models(
            spark, 5, [(1, "a b"), (2, "b a"), (3, "a b")]
        )
        probe = spark.createDataFrame(
            [(1, "a b"), (9, "")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["kn_tokens"], r["kn_nll"])
            for r in kn_ngram_score(probe, models).collect()
        }
        assert got[9] == (0, 0.0)
        assert got[1][0] == 2 and got[1][1] > 0

    def test_validation(self, spark):
        from cod_stats_spark.operators.lm_score import kn_ngram_score

        docs, models = _fit_models(spark, 5)
        probes = _probe_df(spark)
        with pytest.raises(ValueError, match="discount"):
            kn_ngram_score(probes, models, discount=1.5)
        with pytest.raises(ValueError, match="alpha"):
            kn_ngram_score(probes, models, alpha=0.0)
        with pytest.raises(ValueError, match="K >= 2"):
            kn_ngram_score(probes, models[:1])
        with pytest.raises(ValueError, match="exceeds the supported"):
            kn_ngram_score(probes, models + [models[0]])
        with pytest.raises(ValueError, match="missing columns"):
            kn_ngram_score(probes, [models[0], models[0]])

    def test_broadcast_cap(self, spark, monkeypatch):
        import cod_stats_spark.operators.lm_score as L

        docs, models = _fit_models(spark, 4)
        monkeypatch.setattr(L, "_KN_BROADCAST_ROW_CAP", 1)
        with pytest.raises(ValueError, match="broadcast cap"):
            L.kn_ngram_score(docs, models)
        got = L.kn_ngram_score(
            docs, models, broadcast_model=False
        ).count()
        assert got == len(_CORPUS)

    @pytest.mark.parametrize("order", [2, 3, 4, 5])
    def test_duckdb_replays_fit_and_score(self, spark, order):
        import duckdb
        import pandas as pd

        from cod_stats_spark.operators.lm_score import (
            kn_ngram_oracle_sql,
            kn_ngram_score,
        )

        docs, models = _fit_models(spark, order)
        got = {
            r["doc_id"]: (r["kn_tokens"], round(r["kn_nll"], 6))
            for r in kn_ngram_score(docs, models).collect()
        }
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(_CORPUS, columns=["doc_id", "text"])
        )
        want = {
            int(r[0]): (int(r[1]), round(float(r[2]), 6))
            for r in con.execute(
                kn_ngram_oracle_sql("documents", order=order)
            ).fetchall()
        }
        assert got == want


class TestKnToArpaGeneric:
    """The generalized export: parity pins at orders 2/4/5 (the K=3
    pin lives in test_arpa.py's TestKnToArpa, now running through the
    same generic code), the same-fit contract probes, and the file
    round trip at order 5."""

    def _parity(self, spark, order):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            kn_ngram_score,
            kn_to_arpa,
        )

        _, models = _fit_models(spark, order)
        probes = _probe_df(spark)
        want = {
            r["doc_id"]: (r["kn_tokens"], r["kn_nll"])
            for r in kn_ngram_score(probes, models).collect()
        }
        model = kn_to_arpa(*models)
        assert model.order == order
        got = {
            r["doc_id"]: (r["arpa_tokens"], r["arpa_nll"])
            for r in arpa_lm_score(probes, model).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0], k
            assert got[k][1] == pytest.approx(
                want[k][1], rel=1e-9, abs=1e-12
            ), k
        return model

    def test_order5_parity_pin(self, spark):
        """THE no-divergence pin at the top supported order: the
        5-gram artifact kn_to_arpa exports scores IDENTICALLY to the
        interpolated model it came from, on every branch the probe
        set reaches (seen/unseen n-grams at each layer, OOV target
        and context, early positions, empty docs)."""
        model = self._parity(spark, 5)
        assert sorted(model.grams) == [1, 2, 3, 4, 5]

    def test_order4_parity_pin(self, spark):
        self._parity(spark, 4)

    def test_order2_parity_pin(self, spark):
        self._parity(spark, 2)

    def test_order5_file_round_trip(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            kn_to_arpa,
            load_arpa,
            write_arpa,
        )

        _, models = _fit_models(spark, 5)
        model = kn_to_arpa(*models)
        p = str(tmp_path / "kn5.arpa")
        write_arpa(model, p)
        re = load_arpa(spark, p)
        assert re.counts == model.counts
        probes = _probe_df(spark)
        a = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, model).collect()
        }
        b = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, re).collect()
        }
        assert a == b  # exact — same doubles end to end

    def test_contract_probe_orphan_suffix(self, spark):
        """A trigram whose suffix bigram was never observed (the
        hand-merged-models case) raises loudly instead of being
        silently dropped by the inner joins (r15 advice)."""
        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 3)
        bad_tri = models[2].unionByName(
            spark.createDataFrame(
                [("a", "zz", "qq", 1)],
                "w1 string, w2 string, w3 string, cnt long",
            )
        )
        with pytest.raises(ValueError, match="same corpus fit"):
            kn_to_arpa(models[0], models[1], bad_tri)

    def test_contract_probe_orphan_prefix(self, spark):
        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 2)
        bad_bi = models[1].unionByName(
            spark.createDataFrame(
                [("zz", "a", 1)], "w1 string, w2 string, cnt long"
            )
        )
        with pytest.raises(ValueError, match="same corpus fit"):
            kn_to_arpa(models[0], bad_bi)

    def test_order_cap(self, spark):
        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 5)
        with pytest.raises(ValueError, match="exceeds the supported"):
            kn_to_arpa(*(models + [models[0]]))

    def test_probe_failure_releases_caches(self, spark):
        """The contract probes are the function's designed raise —
        the just-persisted input caches must be released on the way
        out (r16 review: they stayed pinned for the session)."""
        from pyspark.storagelevel import StorageLevel

        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 3)
        bad_tri = models[2].unionByName(
            spark.createDataFrame(
                [("a", "zz", "qq", 1)],
                "w1 string, w2 string, w3 string, cnt long",
            )
        )
        inputs = [models[0], models[1], bad_tri]
        with pytest.raises(ValueError, match="same corpus fit"):
            kn_to_arpa(*inputs)
        assert all(
            m.storageLevel == StorageLevel.NONE for m in inputs
        )

    def test_caller_persisted_models_survive(self, spark):
        """kn_to_arpa must not evict caches it does not own: the
        fit-score-export workflow passes the same tables to
        kn_ngram_score (which persists the top order for the returned
        plan's lifetime) and then here (r16 review)."""
        from pyspark.storagelevel import StorageLevel

        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 3)
        for m in models:
            m.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            model = kn_to_arpa(*models)
            assert sorted(model.grams) == [1, 2, 3]
            assert all(
                m.storageLevel != StorageLevel.NONE for m in models
            )
        finally:
            for m in models:
                m.unpersist()


class TestArpaRelations:
    """save_arpa_relations / load_arpa_relations — the parquet
    round trip that makes write_arpa's over-cap remedy an operator
    (r15 verdict Missing #3)."""

    @pytest.fixture()
    def model5(self, spark):
        from cod_stats_spark.operators.lm_score import kn_to_arpa

        _, models = _fit_models(spark, 5)
        return kn_to_arpa(*models)

    def test_round_trip_scores_identical(self, spark, tmp_path, model5):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            load_arpa_relations,
            save_arpa_relations,
        )

        d = str(tmp_path / "m5")
        save_arpa_relations(model5, d)
        re = load_arpa_relations(spark, d)
        assert re.counts == model5.counts
        probes = _probe_df(spark)
        a = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, model5).collect()
        }
        b = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, re).collect()
        }
        assert a == b  # parquet doubles round-trip bit-exactly

    def test_missing_sidecar_rejected(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import (
            load_arpa_relations,
        )

        d = tmp_path / "not_a_model"
        d.mkdir()
        with pytest.raises(ValueError, match="counts sidecar"):
            load_arpa_relations(spark, str(d))

    def test_save_validates_counts(self, tmp_path, model5):
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            save_arpa_relations,
        )

        lying = ArpaModel(model5.grams, {**model5.counts, 1: 999})
        with pytest.raises(ValueError, match="disagree"):
            save_arpa_relations(lying, str(tmp_path / "lying"))

    def test_load_validates_counts(self, spark, tmp_path, model5):
        """A tampered sidecar (or a partially lost table) is caught by
        the per-order count check."""
        import json

        from cod_stats_spark.operators.lm_score import (
            load_arpa_relations,
            save_arpa_relations,
        )

        d = str(tmp_path / "m5")
        save_arpa_relations(model5, d)
        cdir = os.path.join(d, "counts")
        part = next(
            f for f in os.listdir(cdir) if f.startswith("part-")
        )
        rows = [
            json.loads(line)
            for line in open(os.path.join(cdir, part))
        ]
        rows[0]["n"] += 1
        with open(os.path.join(cdir, part), "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
        # drop the local-FS checksum Spark wrote next to the part
        # file — the tamper would otherwise fail the CRC read, not
        # the count validation this test targets
        crc = os.path.join(cdir, f".{part}.crc")
        if os.path.exists(crc):
            os.unlink(crc)
        with pytest.raises(ValueError, match="declares"):
            load_arpa_relations(spark, d)

    def test_load_probes_duplicate_keys(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            load_arpa_relations,
            save_arpa_relations,
        )

        dup = spark.createDataFrame(
            [("a", -0.5, None), ("a", -0.7, None)],
            "w1 string, log10p double, backoff double",
        )
        save_arpa_relations(
            ArpaModel({1: dup}, {1: 2}), str(tmp_path / "dup")
        )
        with pytest.raises(ValueError, match="more than once"):
            load_arpa_relations(spark, str(tmp_path / "dup"))

    def test_overcap_write_arpa_points_here(
        self, tmp_path, model5, monkeypatch
    ):
        import cod_stats_spark.operators.lm_score as L

        monkeypatch.setattr(L, "_ARPA_EXPORT_ROW_CAP", 3)
        with pytest.raises(ValueError, match="save_arpa_relations"):
            L.write_arpa(model5, str(tmp_path / "big.arpa"))

    def test_torn_resave_is_detectable(
        self, spark, tmp_path, model5, monkeypatch
    ):
        """An in-place re-save that dies mid-flight must NOT leave a
        loadable mixed-generation directory: the old sidecar is
        deleted before any gram table is touched, so the torn rewrite
        fails the commit-record check exactly like a torn first write
        (r16 review — a same-support refit keeps every per-order
        count identical, so the old sidecar would otherwise validate
        a model mixing generations)."""
        import pyspark.sql.readwriter as rw

        from cod_stats_spark.operators.lm_score import (
            load_arpa_relations,
            save_arpa_relations,
        )

        d = str(tmp_path / "m5")
        save_arpa_relations(model5, d)
        assert load_arpa_relations(spark, d).counts == model5.counts
        with monkeypatch.context() as m:

            def boom(self, path, **kw):
                raise RuntimeError("injected mid-flight death")

            m.setattr(rw.DataFrameWriter, "parquet", boom)
            with pytest.raises(RuntimeError, match="mid-flight"):
                save_arpa_relations(model5, d)
        with pytest.raises(ValueError, match="counts sidecar"):
            load_arpa_relations(spark, d)

    def test_resave_over_existing_loads_the_new_model(
        self, spark, tmp_path, model5
    ):
        """A successful re-save over an existing directory loads as
        the NEW model even when stale higher-order gram directories
        linger — the sidecar (rewritten last) is the authority on
        which orders exist."""
        from cod_stats_spark.operators.lm_score import (
            load_arpa_relations,
            save_arpa_relations,
        )

        d = str(tmp_path / "m")
        save_arpa_relations(model5, d)
        small = model5.truncate(2)
        save_arpa_relations(small, d)
        re = load_arpa_relations(spark, d)
        assert re.counts == small.counts
        assert sorted(re.grams) == [1, 2]

    def test_missing_gram_table_loud(self, spark, tmp_path, model5):
        """A sidecar-declared order whose table directory was lost
        gets the loader's loud ValueError, not a raw path-not-found
        AnalysisException (r16 review)."""
        import shutil

        from cod_stats_spark.operators.lm_score import (
            load_arpa_relations,
            save_arpa_relations,
        )

        d = tmp_path / "m5"
        save_arpa_relations(model5, str(d))
        shutil.rmtree(d / "grams_k=3")
        with pytest.raises(ValueError, match="missing or unreadable"):
            load_arpa_relations(spark, str(d))


class TestWriteArpaAtomicity:
    """r15 advice: a validation failure on a LATER order used to
    leave a truncated artifact on disk under the final name — now
    every order validates before any I/O, and the write itself goes
    through a sibling temp path + atomic rename."""

    def _two_order_model(self, spark, bad_second=False):
        from cod_stats_spark.operators.lm_score import ArpaModel

        g1 = spark.createDataFrame(
            [("a", -0.3, 0.0), ("b", -0.5, None)],
            "w1 string, log10p double, backoff double",
        )
        w2 = "bad word" if bad_second else "b"
        g2 = spark.createDataFrame(
            [("a", w2, -0.2, None)],
            "w1 string, w2 string, log10p double, backoff double",
        )
        return ArpaModel({1: g1, 2: g2}, {1: 2, 2: 1})

    def test_later_order_failure_leaves_nothing(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import write_arpa

        p = tmp_path / "out.arpa"
        with pytest.raises(ValueError, match="unrepresentable"):
            write_arpa(self._two_order_model(spark, bad_second=True), str(p))
        assert not p.exists()
        assert list(tmp_path.iterdir()) == []  # no temp leftovers

    def test_failed_rewrite_preserves_existing_artifact(
        self, spark, tmp_path
    ):
        from cod_stats_spark.operators.lm_score import write_arpa

        p = tmp_path / "out.arpa"
        write_arpa(self._two_order_model(spark), str(p))
        good = p.read_text()
        with pytest.raises(ValueError, match="unrepresentable"):
            write_arpa(self._two_order_model(spark, bad_second=True), str(p))
        assert p.read_text() == good
        assert [f.name for f in tmp_path.iterdir()] == ["out.arpa"]

    def test_successful_write_leaves_only_the_artifact(
        self, spark, tmp_path
    ):
        from cod_stats_spark.operators.lm_score import load_arpa, write_arpa

        p = tmp_path / "out.arpa.gz"
        write_arpa(self._two_order_model(spark), str(p))
        assert [f.name for f in tmp_path.iterdir()] == ["out.arpa.gz"]
        assert load_arpa(spark, str(p)).counts == {1: 2, 2: 1}

    def test_backoffless_top_order_exports(self, spark, tmp_path):
        """A model legal under the scoring validator's top-order
        exemption (pure-unigram, no backoff column at all) exports as
        all-omitted backoffs instead of crashing on an unresolved
        column (r16 review — save_arpa_relations already tolerated
        exactly this model; the two exporters must agree on what is
        exportable)."""
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            load_arpa,
            write_arpa,
        )

        g1 = spark.createDataFrame(
            [("a", -0.3), ("b", -0.5)], "w1 string, log10p double"
        )
        p = tmp_path / "uni.arpa"
        write_arpa(ArpaModel({1: g1}, {1: 2}), str(p))
        re = load_arpa(spark, str(p))
        assert re.counts == {1: 2}
        assert re.grams[1].filter("backoff is not null").count() == 0


class TestArpaValidatorBackoff:
    """r15 advice: the scorer unconditionally selects the backoff
    column from orders 1..K-1 — the validator now says so up front."""

    def test_missing_backoff_below_top_rejected(self, spark):
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            arpa_lm_score,
        )

        g1 = spark.createDataFrame(
            [("a", -0.3)], "w1 string, log10p double"
        )
        g2 = spark.createDataFrame(
            [("a", "a", -0.2, None)],
            "w1 string, w2 string, log10p double, backoff double",
        )
        docs = spark.createDataFrame(
            [(1, "a a")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match=r"missing columns.*backoff"):
            arpa_lm_score(
                docs,
                ArpaModel({1: g1, 2: g2}, {1: 1, 2: 1}),
                oov_log10p=-5.0,
            )

    def test_top_order_exempt(self, spark):
        """A pure unigram model without a backoff column scores — the
        top order's backoff is never consulted."""
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            arpa_lm_score,
        )

        g1 = spark.createDataFrame(
            [("a", math.log10(0.5))], "w1 string, log10p double"
        )
        docs = spark.createDataFrame(
            [(1, "a a")], "doc_id long, text string"
        )
        got = arpa_lm_score(
            docs, ArpaModel({1: g1}, {1: 1}), oov_log10p=-5.0
        ).first()
        assert got["arpa_tokens"] == 2
        assert got["arpa_nll"] == pytest.approx(
            -math.log(0.5), rel=1e-12
        )
