"""ARPA backoff-LM artifact interop (operators/lm_score.py load_arpa /
arpa_lm_score): round-trip a hand-written mini-ARPA into the relation
tables with values verbatim, hand-computed backoff scores through
every branch (listed trigram, bigram backoff with and without weight,
unigram floor, <unk>), and malformed-file rejection — the
tokenizer_io discipline applied to the LM family."""

from __future__ import annotations

import math

import pytest

_LN10 = math.log(10.0)

_MINI = """\\data\\
ngram 1=5
ngram 2=4
ngram 3=2

\\1-grams:
-0.5\tthe\t-0.30103
-0.7\tquick\t-0.2
-0.9\tfox\t-0.1
-1.2\tdog
-2.5\t<unk>

\\2-grams:
-0.30103\tthe quick\t-0.15
-0.5\tquick fox\t-0.05
-0.8\tthe dog
-1.0\tfox dog

\\3-grams:
-0.2\tthe quick fox
-0.9\tquick fox dog

\\end\\
"""


def _write(tmp_path, body, name="mini.arpa"):
    p = tmp_path / name
    p.write_text(body)
    return str(p)


@pytest.fixture(scope="module")
def mini_model(spark, tmp_path_factory):
    # module-scoped (r17): ~15 tests consume this model read-only, and
    # each load_arpa is several Spark jobs — one shared load suffices
    from cod_stats_spark.operators.lm_score import load_arpa

    return load_arpa(
        spark, _write(tmp_path_factory.mktemp("arpa_mini"), _MINI)
    )


class TestRoundTrip:
    def test_tables_carry_file_values_verbatim(self, mini_model):
        m = mini_model
        assert m.counts == {1: 5, 2: 4, 3: 2}
        assert m.order == 3
        uni = {
            r["w1"]: (r["log10p"], r["backoff"])
            for r in m.grams[1].collect()
        }
        assert uni["the"] == (-0.5, -0.30103)
        assert uni["dog"] == (-1.2, None)  # omitted backoff stays NULL
        assert uni["<unk>"] == (-2.5, None)
        bi = {
            (r["w1"], r["w2"]): (r["log10p"], r["backoff"])
            for r in m.grams[2].collect()
        }
        assert bi[("the", "quick")] == (-0.30103, -0.15)
        assert bi[("fox", "dog")] == (-1.0, None)
        tri = {
            (r["w1"], r["w2"], r["w3"]): r["log10p"]
            for r in m.grams[3].collect()
        }
        assert tri == {
            ("the", "quick", "fox"): -0.2,
            ("quick", "fox", "dog"): -0.9,
        }


class TestHandComputedScores:
    def _score(self, spark, model, text, **kw):
        from cod_stats_spark.operators.lm_score import arpa_lm_score

        probe = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        return arpa_lm_score(probe, model, **kw).first()

    def test_all_orders_listed(self, spark, mini_model):
        """'the quick fox dog': P1(the)=-0.5, bigram(the quick)
        =-0.30103, trigram(the quick fox)=-0.2, trigram(quick fox
        dog)=-0.9 — every position hits a listed entry."""
        got = self._score(spark, mini_model, "the quick fox dog")
        want = (0.5 + 0.30103 + 0.2 + 0.9) * _LN10 / 4
        assert got["arpa_tokens"] == 4
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_backoff_chain(self, spark, mini_model):
        """'dog the fox': P1(dog)=-1.2; P(the|dog) backs off with
        b(dog)=0 (omitted) → -0.5; P(fox|dog,the) backs off twice —
        b(dog,the)=0 (bigram absent), then b(the)=-0.30103 +
        P1(fox)=-0.9 → -1.20103."""
        got = self._score(spark, mini_model, "dog the fox")
        want = (1.2 + 0.5 + 1.20103) * _LN10 / 3
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_bigram_backoff_weight_applies(self, spark, mini_model):
        """'quick dog': P1(quick)=-0.7; bigram (quick,dog) absent →
        b(quick)=-0.2 + P1(dog)=-1.2 → -1.4."""
        got = self._score(spark, mini_model, "quick dog")
        want = (0.7 + 1.4) * _LN10 / 2
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_oov_takes_unk(self, spark, mini_model):
        """'zzz the': zzz scores the file's <unk> (-2.5); P(the|zzz)
        backs off through an UNSEEN context (b=0) to P1(the)."""
        got = self._score(spark, mini_model, "zzz the")
        want = (2.5 + 0.5) * _LN10 / 2
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_zero_token_doc(self, spark, mini_model):
        got = self._score(spark, mini_model, "   ")
        assert (got["arpa_tokens"], got["arpa_nll"]) == (0, 0.0)

    def test_broadcast_equals_shuffled(self, spark, mini_model):
        a = self._score(spark, mini_model, "dog the fox zzz quick")
        b = self._score(
            spark, mini_model, "dog the fox zzz quick",
            broadcast_model=False,
        )
        assert a["arpa_nll"] == pytest.approx(b["arpa_nll"], abs=1e-12)


class TestRejection:
    def test_missing_header(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import load_arpa

        with pytest.raises(ValueError, match="header"):
            load_arpa(spark, _write(tmp_path, "-0.5\tthe\n", "bad.arpa"))

    def test_count_mismatch(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("ngram 1=5", "ngram 1=6")
        with pytest.raises(ValueError, match="declares"):
            load_arpa(spark, _write(tmp_path, body, "short.arpa"))

    def test_unparseable_probability(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("-0.5\tthe", "x.y\tthe")
        with pytest.raises(ValueError, match="probability"):
            load_arpa(spark, _write(tmp_path, body, "garbled.arpa"))

    def test_no_unk_requires_explicit_floor(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            load_arpa,
        )

        body = _MINI.replace("ngram 1=5", "ngram 1=4").replace(
            "-2.5\t<unk>\n", ""
        )
        m = load_arpa(spark, _write(tmp_path, body, "nounk.arpa"))
        probe = spark.createDataFrame(
            [(1, "the dog")], "doc_id long, text string"
        )
        with pytest.raises(ValueError, match="oov_log10p"):
            arpa_lm_score(probe, m)
        got = arpa_lm_score(probe, m, oov_log10p=-3.0).first()
        # 'the'=-0.5; bigram (the,dog) listed → -0.8
        assert got["arpa_nll"] == pytest.approx(
            (0.5 + 0.8) * _LN10 / 2, abs=1e-12
        )

    def test_order_cap_and_truncate_seam(self, spark, mini_model):
        """Order > 5 refuses with the truncate remedy (r15 — the cap
        moved from 3 to 5, the published-artifact order); truncate(5)
        of a fat model is scoreable."""
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            arpa_lm_score,
        )

        m = mini_model
        fat = ArpaModel(
            {**m.grams, 4: m.grams[3], 5: m.grams[3], 6: m.grams[3]},
            {**m.counts, 4: 2, 5: 2, 6: 2},
        )
        with pytest.raises(ValueError, match=r"order-6.*truncate\(5\)"):
            arpa_lm_score(None, fat)

    def test_noncontiguous_orders_raise(self, spark, mini_model):
        """A declared top order with an empty middle table cannot
        recurse — refuse with the truncate seam, never a silent skip."""
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            arpa_lm_score,
        )

        m = mini_model
        holey = ArpaModel(
            {1: m.grams[1], 3: m.grams[3]}, {1: 5, 3: 2}
        )
        with pytest.raises(ValueError, match=r"truncate\(1\)"):
            arpa_lm_score(None, holey)

    def test_duplicate_ngram_lines_raise_without_folding(self, spark, tmp_path):
        """r15 review: a count-consistent file with literal duplicate
        lines must refuse at load even under lowercase=False — the
        scorer's model joins would fan out and inflate every score."""
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("ngram 2=4", "ngram 2=5").replace(
            "-0.5\tquick fox\t-0.05\n",
            "-0.5\tquick fox\t-0.05\n-0.6\tquick fox\n",
        )
        with pytest.raises(ValueError, match="more than once"):
            load_arpa(spark, _write(tmp_path, body, "dup.arpa"))

    def test_bad_backoff_field_raises(self, spark, tmp_path):
        """r14 advice: a present non-empty backoff field that fails
        the double cast must raise like the probability probe — a
        silent NULL would score as backoff 0.0."""
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace(
            "-0.5\tthe\t-0.30103", "-0.5\tthe\tx.y"
        )
        with pytest.raises(ValueError, match="backoff"):
            load_arpa(spark, _write(tmp_path, body, "badb.arpa"))

    def test_trailing_empty_backoff_field_is_omitted(self, spark, tmp_path):
        """A bare trailing tab (empty third field) still reads as an
        omitted backoff, not a parse error."""
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("-1.2\tdog", "-1.2\tdog\t")
        m = load_arpa(spark, _write(tmp_path, body, "traildb.arpa"))
        uni = {r["w1"]: r["backoff"] for r in m.grams[1].collect()}
        assert uni["dog"] is None


class TestFunnelGate:
    def test_curation_lm_gate_accepts_arpa_model(self, spark, tmp_path, mini_model):
        """The CCNet deployment posture: the funnel's LM gate scores
        against a PUBLISHED backoff model. In-vocabulary fluent docs
        pass; OOV-heavy docs score near the <unk> floor and die — in
        BOTH funnel postures (the gate is stateless, so append ==
        rebuild)."""
        import math

        from cod_stats_spark.plans.curation import (
            curate_corpus,
            curate_corpus_append,
        )

        rows = [
            (1, "the quick fox dog the quick fox the quick dog fox"),
            (2, "zzq qqx wvv zzq qqx wvv zzq qqx wvv zzq qqx wvv"),
            (3, "the dog the quick fox dog the quick the dog fox"),
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        # in-vocab docs score well under ~2 nats/token; the OOV doc
        # sits at the <unk> floor 2.5·ln10 ≈ 5.76
        cut = 2.5 * math.log(10.0) - 0.5
        kw = dict(
            min_quality=0.0, token_budget=64,
            lm_model=mini_model, max_lm_nll=cut,
        )
        _, stats = curate_corpus(docs, None, str(tmp_path / "o"), **kw)
        assert stats["after_lm_gate"] == 2
        state = str(tmp_path / "st")
        _, s1 = curate_corpus_append(
            spark, docs.filter("doc_id <= 2"), None, state, batch_id=1, **kw
        )
        _, s2 = curate_corpus_append(
            spark, docs.filter("doc_id > 2"), None, state, batch_id=2, **kw
        )
        assert s1["after_lm_gate"] == 1 and s2["after_lm_gate"] == 1


_FIVE = """\\data\\
ngram 1=6
ngram 2=4
ngram 3=3
ngram 4=2
ngram 5=1

\\1-grams:
-0.5\ta\t-0.1
-0.625\tb\t-0.2
-0.75\tc\t-0.25
-1.0\td
-1.25\te\t-0.5
-2.0\t<unk>\t-0.375

\\2-grams:
-0.25\ta b\t-0.125
-0.375\tb c\t-0.0625
-0.5\tc d\t-0.3
-0.875\t<unk> a\t-0.15

\\3-grams:
-0.2\ta b c\t-0.05
-0.3\tb c d\t-0.1
-0.6\t<unk> a b

\\4-grams:
-0.15\ta b c d\t-0.025
-0.45\tb c d e

\\5-grams:
-0.1\ta b c d e

\\end\\
"""

_MINI_UNK = """\\data\\
ngram 1=5
ngram 2=5
ngram 3=3

\\1-grams:
-0.5\tthe\t-0.30103
-0.7\tquick\t-0.2
-0.9\tfox\t-0.1
-1.2\tdog
-2.5\t<unk>\t-0.4

\\2-grams:
-0.30103\tthe quick\t-0.15
-0.5\tquick fox\t-0.05
-0.8\tthe dog
-0.6\t<unk> the\t-0.2
-0.9\tthe <unk>

\\3-grams:
-0.2\tthe quick fox
-0.35\t<unk> the quick
-0.55\tthe <unk> the

\\end\\
"""


class TestFiveGram:
    """r15: the order cap moved to 5 (published KenLM/CCNet artifacts
    are 5-gram). Hand-computed scores through the DEEP backoff chain —
    every hop's weight (present, omitted, and <unk>) applied."""

    @pytest.fixture(scope="class")
    def five(self, spark, tmp_path_factory):
        from cod_stats_spark.operators.lm_score import load_arpa

        return load_arpa(
            spark,
            _write(tmp_path_factory.mktemp("arpa_five"), _FIVE, "five.arpa"),
        )

    def _score(self, spark, model, text, **kw):
        from cod_stats_spark.operators.lm_score import arpa_lm_score

        probe = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        return arpa_lm_score(probe, model, **kw).first()

    def test_loads_five_orders(self, five):
        assert five.order == 5
        assert {
            (r["w1"], r["w2"], r["w3"], r["w4"], r["w5"], r["log10p"])
            for r in five.grams[5].collect()
        } == {("a", "b", "c", "d", "e", -0.1)}

    def test_every_order_hits_listed(self, spark, five):
        """'a b c d e': positions 1..5 hit the listed 1..5-gram."""
        got = self._score(spark, five, "a b c d e")
        want = (0.5 + 0.25 + 0.2 + 0.15 + 0.1) * _LN10 / 5
        assert got["arpa_tokens"] == 5
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_deep_backoff_all_weights_apply(self, spark, five):
        """'a b c d a' position 5: 5-gram absent → b(abcd)=-0.025 +
        [4-gram absent → b(bcd)=-0.1 + [3-gram absent → b(cd)=-0.3 +
        [2-gram absent → b(d)=0 omitted + P1(a)=-0.5]]] = -0.925."""
        got = self._score(spark, five, "a b c d a")
        want = (0.5 + 0.25 + 0.2 + 0.15 + 0.925) * _LN10 / 5
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_deep_backoff_zero_weights(self, spark, five):
        """'b c d e a' position 5: every context hop absent from the
        next table down (b=0) until b(e)=-0.5 at the unigram layer."""
        got = self._score(spark, five, "b c d e a")
        want = (0.625 + 0.375 + 0.3 + 0.45 + 1.0) * _LN10 / 5
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_broadcast_equals_shuffled_at_order5(self, spark, five):
        a = self._score(spark, five, "a b c d a e b c d e")
        b = self._score(
            spark, five, "a b c d a e b c d e", broadcast_model=False
        )
        assert a["arpa_nll"] == pytest.approx(b["arpa_nll"], abs=1e-12)


class TestTruncate:
    def test_truncate_drops_higher_orders_and_scores(self, spark, mini_model):
        from cod_stats_spark.operators.lm_score import arpa_lm_score

        t2 = mini_model.truncate(2)
        assert t2.order == 2 and set(t2.grams) == {1, 2}
        probe = spark.createDataFrame(
            [(1, "the quick fox dog")], "doc_id long, text string"
        )
        got = arpa_lm_score(probe, t2).first()
        # bigrams all listed: -0.5 -0.30103 -0.5 -1.0
        want = (0.5 + 0.30103 + 0.5 + 1.0) * _LN10 / 4
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)
        t1 = mini_model.truncate(1)
        got1 = arpa_lm_score(probe, t1).first()
        want1 = (0.5 + 0.7 + 0.9 + 1.2) * _LN10 / 4
        assert got1["arpa_nll"] == pytest.approx(want1, abs=1e-12)

    def test_truncate_validation(self, mini_model):
        with pytest.raises(ValueError, match=">= 1"):
            mini_model.truncate(0)
        # truncating above the order keeps everything
        assert set(mini_model.truncate(7).grams) == {1, 2, 3}


class TestUnkSubstitution:
    """r14 advice: OOV tokens map to the literal '<unk>' before the
    model joins (target AND context positions), so <unk>-containing
    n-grams and b(<unk>) that published models ship are consulted —
    KenLM's substitution, hand-computed."""

    @pytest.fixture(scope="class")
    def munk(self, spark, tmp_path_factory):
        from cod_stats_spark.operators.lm_score import load_arpa

        return load_arpa(
            spark,
            _write(tmp_path_factory.mktemp("arpa_unk"), _MINI_UNK, "unk.arpa"),
        )

    def _score(self, spark, model, text, **kw):
        from cod_stats_spark.operators.lm_score import arpa_lm_score

        probe = spark.createDataFrame(
            [(1, text)], "doc_id long, text string"
        )
        return arpa_lm_score(probe, model, **kw).first()

    def test_unk_context_consults_unk_ngrams(self, spark, munk):
        """'zzz the quick': P(<unk>)=-2.5, bigram (<unk>,the)=-0.6,
        trigram (<unk>,the,quick)=-0.35 — all listed entries."""
        got = self._score(spark, munk, "zzz the quick")
        want = (2.5 + 0.6 + 0.35) * _LN10 / 3
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_unk_target_consults_unk_ngrams(self, spark, munk):
        """'the zzz the': bigram (the,<unk>)=-0.9 at position 2,
        trigram (the,<unk>,the)=-0.55 at position 3."""
        got = self._score(spark, munk, "the zzz the")
        want = (0.5 + 0.9 + 0.55) * _LN10 / 3
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_unk_backoff_weight_applies(self, spark, munk):
        """'zzz qqq': both OOV; bigram (<unk>,<unk>) absent →
        b(<unk>)=-0.4 + P(<unk>)=-2.5 = -2.9."""
        got = self._score(spark, munk, "zzz qqq")
        want = (2.5 + 2.9) * _LN10 / 2
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)

    def test_invocab_context_oov_target_backs_off_normally(self, spark, munk):
        """'the zzz quick' position 3: trigram (the,<unk>,quick)
        absent → b(the,<unk>)=0 (omitted) + [bigram (<unk>,quick)
        absent → b(<unk>)=-0.4 + P1(quick)=-0.7] = -1.1."""
        got = self._score(spark, munk, "the zzz quick")
        want = (0.5 + 0.9 + 1.1) * _LN10 / 3
        assert got["arpa_nll"] == pytest.approx(want, abs=1e-12)


class TestOracleSql:
    """arpa_lm_oracle_sql (r15): the recursive backoff forward pass is
    plain joins + log10 arithmetic — replayed in DuckDB from the model
    rows verbatim and compared per document against the Spark scorer,
    through <unk> substitution, deep backoff, and zero-token docs."""

    _FIVE_ROWS = {
        1: [("a", -0.5, -0.1), ("b", -0.625, -0.2), ("c", -0.75, -0.25),
            ("d", -1.0, None), ("e", -1.25, -0.5), ("<unk>", -2.0, -0.375)],
        2: [("a", "b", -0.25, -0.125), ("b", "c", -0.375, -0.0625),
            ("c", "d", -0.5, -0.3), ("<unk>", "a", -0.875, -0.15)],
        3: [("a", "b", "c", -0.2, -0.05), ("b", "c", "d", -0.3, -0.1),
            ("<unk>", "a", "b", -0.6, None)],
        4: [("a", "b", "c", "d", -0.15, -0.025),
            ("b", "c", "d", "e", -0.45, None)],
        5: [("a", "b", "c", "d", "e", -0.1, None)],
    }

    def test_duckdb_ln10_matches_python(self):
        """The oracle's · ln(10) conversion assumes both engines hold
        the same double for ln 10 — pin it."""
        import duckdb

        (got,) = duckdb.connect().execute("SELECT ln(10)").fetchone()
        assert got == _LN10

    def test_oracle_matches_spark_order5(self, spark, tmp_path):
        import duckdb

        from cod_stats_spark.operators.lm_score import (
            arpa_lm_oracle_sql,
            arpa_lm_score,
            load_arpa,
        )

        model = load_arpa(spark, _write(tmp_path, _FIVE, "f5.arpa"))
        docs = spark.createDataFrame(
            [
                (1, "a b c d e"),
                (2, "b c d e a"),
                (3, "a b c d a"),
                (4, "zz a b qq c d e zz"),  # OOV target + context
                (5, "   "),                 # zero tokens
                (6, "a"),
                (7, "e d c b a e d c b a"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["arpa_tokens"], r["arpa_nll"])
            for r in arpa_lm_score(docs, model).collect()
        }
        con = duckdb.connect()
        con.register("adocs", docs.toPandas())
        want = {
            int(i): (int(t), float(n))
            for i, t, n in con.execute(
                arpa_lm_oracle_sql(self._FIVE_ROWS, src="adocs")
            ).fetchall()
        }
        assert set(got) == set(want)
        for k in got:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)

    def test_oracle_validation(self):
        from cod_stats_spark.operators.lm_score import arpa_lm_oracle_sql

        with pytest.raises(ValueError, match="contiguous"):
            arpa_lm_oracle_sql({1: self._FIVE_ROWS[1], 3: []})
        with pytest.raises(ValueError, match="oov_log10p"):
            arpa_lm_oracle_sql({1: [("a", -0.5, None)]})
        # a present-but-empty order would render 'VALUES ()' —
        # malformed SQL with a parser error instead of a diagnostic
        with pytest.raises(ValueError, match="no rows"):
            arpa_lm_oracle_sql({1: self._FIVE_ROWS[1], 2: []})


class TestWriteArpa:
    """r15: write_arpa — the inverse of load_arpa, so a model fit or
    repaired here feeds external KenLM/SRILM tooling. Round-trips are
    exact (repr doubles, NULL backoff = absent field)."""

    def _tables(self, m):
        out = {}
        for k, df in m.grams.items():
            keys = [f"w{i}" for i in range(1, k + 1)]
            out[k] = sorted(
                (tuple(r[c] for c in keys), r["log10p"], r["backoff"])
                for r in df.collect()
            )
        return out

    def test_round_trip_tables_and_scores(self, spark, tmp_path, mini_model):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            load_arpa,
            write_arpa,
        )

        p2 = str(tmp_path / "rt.arpa")
        write_arpa(mini_model, p2)
        m2 = load_arpa(spark, p2)
        assert m2.counts == mini_model.counts
        assert self._tables(m2) == self._tables(mini_model)
        probe = spark.createDataFrame(
            [(1, "dog the fox zzz quick")], "doc_id long, text string"
        )
        a = arpa_lm_score(probe, mini_model).first()["arpa_nll"]
        b = arpa_lm_score(probe, m2).first()["arpa_nll"]
        assert a == b  # exact — same doubles end to end

    def test_gzip_round_trip(self, spark, tmp_path, mini_model):
        """Published models ship as .arpa.gz; write_arpa compresses by
        extension and load_arpa reads it natively (spark.read.text
        decompresses by extension)."""
        from cod_stats_spark.operators.lm_score import load_arpa, write_arpa

        pz = str(tmp_path / "rt.arpa.gz")
        write_arpa(mini_model, pz)
        import gzip

        with gzip.open(pz, "rt") as f:
            assert f.readline() == "\\data\\\n"
        m2 = load_arpa(spark, pz)
        assert self._tables(m2) == self._tables(mini_model)

    def test_export_guards(self, spark, tmp_path, mini_model, monkeypatch):
        import cod_stats_spark.operators.lm_score as L

        # counts validated against the LIVE tables before any collect
        # (r15 review: understated counts would sail past the cap and
        # then materialize the real rows on the driver)
        lying = L.ArpaModel(mini_model.grams, {**mini_model.counts, 1: 2})
        with pytest.raises(ValueError, match="disagree"):
            L.write_arpa(lying, str(tmp_path / "lying.arpa"))
        monkeypatch.setattr(L, "_ARPA_EXPORT_ROW_CAP", 3)
        with pytest.raises(ValueError, match="driver-stream cap"):
            L.write_arpa(mini_model, str(tmp_path / "big.arpa"))
        monkeypatch.undo()
        for word in ("two words", ""):
            bad = L.ArpaModel(
                {1: spark.createDataFrame(
                    [(word, -0.5, None)],
                    "w1 string, log10p double, backoff double",
                )},
                {1: 1},
            )
            with pytest.raises(ValueError, match="unrepresentable"):
                L.write_arpa(bad, str(tmp_path / "bad.arpa"))


class TestKnToArpa:
    """r15: kn_to_arpa — fit the interpolated-KN trigram on the
    cluster, convert to the standard BACKOFF form, write_arpa the
    artifact. The conversion is exact (listed entries carry the
    interpolated probabilities; b(ctx) = log10 lambda(ctx)), so the
    exported model scores IDENTICALLY to kn_lm_score — the parity
    test below is the no-divergence pin for the re-derived formulas."""

    _CORPUS = [
        (1, "a b c a b d"),
        (2, "b c a b c e"),
        (3, "c a a d b c"),
    ]
    # probes exercising every branch: seen trigram; unseen trigram
    # with a seen context; unseen context; OOV target; OOV context;
    # 1- and 2-token docs; zero tokens
    _PROBES = [
        (10, "a b c"), (11, "a b a"), (12, "d d c"), (13, "a b z"),
        (14, "z a b"), (15, "c a"), (16, "q"), (17, "c c c a b d e"),
        (18, "   "),
    ]

    @pytest.fixture(scope="class")
    def fits(self, spark):
        from cod_stats_spark.operators.lm_score import (
            bigram_lm_fit,
            trigram_lm_fit,
            unigram_lm_fit,
        )

        corpus = spark.createDataFrame(
            self._CORPUS, "doc_id long, text string"
        )
        return (
            unigram_lm_fit(corpus),
            bigram_lm_fit(corpus),
            trigram_lm_fit(corpus),
        )

    def _probe_df(self, spark):
        return spark.createDataFrame(
            self._CORPUS + self._PROBES, "doc_id long, text string"
        )

    def test_exported_model_scores_equal_kn(self, spark, fits):
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            kn_lm_score,
            kn_to_arpa,
        )

        uni, bi, tri = fits
        probes = self._probe_df(spark)
        want = {
            r["doc_id"]: (r["lm3_tokens"], r["lm3_nll"])
            for r in kn_lm_score(probes, uni, bi, tri).collect()
        }
        model = kn_to_arpa(uni, bi, tri)
        assert model.order == 3
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

    def test_file_round_trip_preserves_scores(self, spark, tmp_path, fits):
        """The full interop chain: fit → convert → write_arpa(.gz) →
        load_arpa → score. repr doubles make the reload exact."""
        from cod_stats_spark.operators.lm_score import (
            arpa_lm_score,
            kn_to_arpa,
            load_arpa,
            write_arpa,
        )

        uni, bi, tri = fits
        model = kn_to_arpa(uni, bi, tri)
        pz = str(tmp_path / "kn.arpa.gz")
        write_arpa(model, pz)
        re = load_arpa(spark, pz)
        assert re.counts == model.counts
        probes = self._probe_df(spark)
        a = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, model).collect()
        }
        b = {
            r["doc_id"]: r["arpa_nll"]
            for r in arpa_lm_score(probes, re).collect()
        }
        assert a == b  # exact — same doubles end to end

    def test_unk_in_vocab_rejected(self, spark):
        from cod_stats_spark.operators.lm_score import (
            bigram_lm_fit,
            kn_to_arpa,
            trigram_lm_fit,
            unigram_lm_fit,
        )

        corpus = spark.createDataFrame(
            [(1, "the <unk> token appears literally in this text")],
            "doc_id long, text string",
        )
        with pytest.raises(ValueError, match="collide"):
            kn_to_arpa(
                unigram_lm_fit(corpus),
                bigram_lm_fit(corpus),
                trigram_lm_fit(corpus),
            )

    def test_validation(self, fits):
        from cod_stats_spark.operators.lm_score import kn_to_arpa

        uni, bi, tri = fits
        with pytest.raises(ValueError, match="discount"):
            kn_to_arpa(uni, bi, tri, discount=1.5)
        with pytest.raises(ValueError, match="alpha"):
            kn_to_arpa(uni, bi, tri, alpha=0.0)


class TestReviewEdges:
    def test_declared_empty_order_is_legal(self, spark, tmp_path):
        """'ngram 3=0' with no 3-gram lines (heavily pruned SRILM
        output) loads fine; order counts populated orders only."""
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("ngram 3=2", "ngram 3=0").replace(
            "-0.2\tthe quick fox\n-0.9\tquick fox dog\n", ""
        )
        m = load_arpa(spark, _write(tmp_path, body, "pruned.arpa"))
        assert m.counts == {1: 5, 2: 4}
        assert m.order == 2
        assert 3 not in m.grams

    def test_lowercase_fold_merging_keys_raises(self, spark, tmp_path):
        """A cased model whose fold would merge 'The' and 'the' into
        duplicate relation keys must refuse — the scorer's joins would
        fan out and silently inflate token counts."""
        from cod_stats_spark.operators.lm_score import load_arpa

        body = _MINI.replace("ngram 1=5", "ngram 1=6").replace(
            "-0.5\tthe\t-0.30103\n", "-0.5\tthe\t-0.30103\n-0.4\tThe\n"
        )
        p = _write(tmp_path, body, "cased.arpa")
        m = load_arpa(spark, p)  # unfolded: distinct keys, fine
        assert {r["w1"] for r in m.grams[1].collect()} >= {"the", "The"}
        import pytest as _pt

        with _pt.raises(ValueError, match="folded case-distinct"):
            load_arpa(spark, p, lowercase=True)

    def test_all_orders_empty_raises_at_load(self, spark, tmp_path):
        from cod_stats_spark.operators.lm_score import load_arpa

        body = "\\data\\\nngram 1=0\n\n\\1-grams:\n\n\\end\\\n"
        with pytest.raises(ValueError, match="no populated"):
            load_arpa(spark, _write(tmp_path, body, "empty.arpa"))
