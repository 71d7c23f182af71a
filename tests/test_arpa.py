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


@pytest.fixture()
def mini_model(spark, tmp_path):
    from cod_stats_spark.operators.lm_score import load_arpa

    return load_arpa(spark, _write(tmp_path, _MINI))


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

    def test_order_cap(self, spark, mini_model):
        from cod_stats_spark.operators.lm_score import (
            ArpaModel,
            arpa_lm_score,
        )

        m = mini_model
        fat = ArpaModel(
            {**m.grams, 4: m.grams[3]}, {**m.counts, 4: 2}
        )
        with pytest.raises(ValueError, match="order-4"):
            arpa_lm_score(None, fat)


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
