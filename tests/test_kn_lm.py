"""Interpolated Kneser-Ney trigram LM (operators/lm_score.py
trigram_lm_fit / kn_lm_score / kn_lm_oracle_sql): hand-computed
probabilities on a tiny corpus, fluent-vs-shuffled ordering,
broadcast==shuffled parity, OOV/unseen-context fallbacks, zero-token
docs, and the DuckDB replica. SQL value verification on the real
tables lives in the quality_tokens gate's lm3_* columns."""

from __future__ import annotations

import math

import pytest


def _models(spark, rows):
    from cod_stats_spark.operators.lm_score import (
        bigram_lm_fit,
        trigram_lm_fit,
        unigram_lm_fit,
    )

    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return (
        docs,
        unigram_lm_fit(docs),
        bigram_lm_fit(docs),
        trigram_lm_fit(docs),
    )


class TestHandComputed:
    def test_single_doc_probabilities(self, spark):
        """Corpus = one doc 'a b c a b d' (D=0.5, α=1).

        Counts: bigrams ab(2) bc(1) ca(1) bd(1) — 5 types;
        trigrams abc abd bca cab (1 each).
        Continuation N1+(·a)=1 (c a), N1+(·b)=1 (a b), N1+(·c)=1,
        N1+(·d)=1; N1+(··)=... bigram TYPES = 4 distinct (ab,bc,ca,bd)
        wait: pairs are ab, bc, ca, ab, bd -> types ab,bc,ca,bd = 4.
        cont per w: a<-c (1), b<-a (1), c<-b (1), d<-b (1); ncc=4; V=4.

        P1(w) = (n1w+1)/(4+4) = 2/8 = 0.25 for every w.

        pos1 'a': P1 = 0.25.
        pos2 'b' | v='a': N1+(·a b)= distinct u in trigrams (*,a,b) =
          {c} -> 1; N1+(·a·) = trigram types with middle a = {cab}->1;
          N1+(a·) = bigram types from a = {ab} -> 1.
          P2 = (1-0.5)/1 + 0.5*1/1*0.25 = 0.625.
        pos3 'c' | (a,b): c(abc)=1, c(ab)=2, N1+(ab·)={c,d}->2.
          P2(c|b): N1+(·bc)={a}->1, N1+(·b·)= middles b: {abc,abd}->2,
          N1+(b·)={bc,bd}->2. P2 = 0.5/2 + 0.5*2/2*0.25 = 0.375.
          P3 = (1-0.5)/2 + 0.5*2/2 * 0.375 = 0.25 + 0.1875 = 0.4375.
        """
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, [(1, "a b c a b d")])
        got = kn_lm_score(
            docs, uni, bi, tri, discount=0.5, alpha=1.0
        ).first()
        assert got["lm3_tokens"] == 6
        # recompute the expected mean from the six hand-derived probs
        p_pos4_a = None
        # pos4 'a' | (b,c): c(bca)=1, c(bc)=1, N1+(bc·)={a}->1
        #   P2(a|c): N1+(·ca)={b}? trigrams (*,c,a) = {bca} -> 1;
        #   N1+(·c·) = middles c: {bca} -> 1; N1+(c·)={ca}->1.
        #   P2 = 0.5/1 + 0.5*1/1*0.25 = 0.625
        #   P3 = 0.5/1 + 0.5*1/1*0.625 = 0.8125
        p_pos4_a = 0.8125
        # pos5 'b' | (c,a): c(cab)=1, c(ca)=1, N1+(ca·)={b}->1
        #   P2(b|a) = 0.625 (pos2 derivation)
        #   P3 = 0.5/1 + 0.5*1/1*0.625 = 0.8125
        # pos6 'd' | (a,b): c(abd)=1, c(ab)=2, N1+(ab·)=2
        #   P2(d|b): N1+(·bd)={a}->1, N1+(·b·)=2, N1+(b·)=2
        #   P2 = 0.5/2 + 0.5*2/2*0.25 = 0.375
        #   P3 = 0.5/2 + 0.5*2/2*0.375 = 0.4375
        probs = [0.25, 0.625, 0.4375, p_pos4_a, 0.8125, 0.4375]
        want = -sum(math.log(p) for p in probs) / 6
        assert got["lm3_nll"] == pytest.approx(want, abs=1e-12)

    def test_document_initial_bigram_lambda(self, spark):
        """λ(v) counts the CONTINUATION support N1+(v·) = |{w :
        N1+(·vw)>0}|, not the bigram-table fanout: corpus doc1 'x y',
        doc2 'a x z a x z' has bigram xy only document-initially
        (c(xy)=1 but N1+(·xy)=0, no trigram ends in xy), so the
        bigram fanout of x is 2 ({xy,xz}) while the continuation
        support is 1 ({z}) — the old fanout inflated λ(x) to 1.0 and
        P₂(·|x) summed to 1.5 (r13 advice; Chen & Goodman 1999).

        With D=0.5, α=1: bigram types xy,ax,xz,za → ncc=4, V=4,
        P1(w)=2/8=0.25 ∀w. For v=x: N1+(·xz)=1 ({a}), N1+(·x·)=1,
        N1+(x·)=1 ({z}). P2(z|x) = 0.5/1 + 0.5·1/1·0.25 = 0.625
        (fanout form gave 0.75), and Σ_w P2(w|x) = 0.5 + λ·ΣP1 = 1.0
        exactly (ΣP1 = (4+4)/8 = 1 here)."""
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(
            spark, [(1, "x y"), (2, "a x z a x z")]
        )
        probe = spark.createDataFrame(
            [(10, "x z")], "doc_id long, text string"
        )
        got = kn_lm_score(
            probe, uni, bi, tri, discount=0.5, alpha=1.0
        ).first()
        assert got["lm3_tokens"] == 2
        want = -(math.log(0.25) + math.log(0.625)) / 2
        assert got["lm3_nll"] == pytest.approx(want, abs=1e-12)


class TestBehavior:
    _FLUENT = [
        (i, "the quick brown fox jumps over the lazy dog while the "
            "curious cat watches the quiet field")
        for i in range(6)
    ]

    def test_fluent_orders_below_shuffled(self, spark):
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, self._FLUENT)
        probe = spark.createDataFrame(
            [
                (100, "the quick brown fox jumps over the lazy dog"),
                # same vocabulary, trigram-hostile order
                (101, "dog the over quick lazy the fox brown jumps"),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["lm3_nll"]
            for r in kn_lm_score(probe, uni, bi, tri).collect()
        }
        assert got[100] < got[101]

    def test_broadcast_equals_shuffled(self, spark):
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, self._FLUENT)
        a = {
            r["doc_id"]: (r["lm3_tokens"], round(r["lm3_nll"], 9))
            for r in kn_lm_score(docs, uni, bi, tri).collect()
        }
        b = {
            r["doc_id"]: (r["lm3_tokens"], round(r["lm3_nll"], 9))
            for r in kn_lm_score(
                docs, uni, bi, tri, broadcast_model=False
            ).collect()
        }
        assert a == b

    def test_oov_and_unseen_context_fallbacks(self, spark):
        """OOV tokens take the α floor; a token after an unseen
        context backs off through the layers — finite NLL always."""
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, self._FLUENT)
        probe = spark.createDataFrame(
            [(200, "zzzq flrm the quick zebra")],
            "doc_id long, text string",
        )
        got = kn_lm_score(probe, uni, bi, tri).first()
        assert got["lm3_tokens"] == 5
        assert math.isfinite(got["lm3_nll"]) and got["lm3_nll"] > 0

    def test_zero_token_and_short_docs(self, spark):
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, self._FLUENT)
        probe = spark.createDataFrame(
            [(1, None), (2, "   "), (3, "the"), (4, "the quick")],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["lm3_tokens"], r["lm3_nll"])
            for r in kn_lm_score(probe, uni, bi, tri).collect()
        }
        assert got[1] == (0, 0.0) and got[2] == (0, 0.0)
        assert got[3][0] == 1 and got[4][0] == 2

    def test_discount_validation(self, spark):
        from cod_stats_spark.operators.lm_score import kn_lm_score

        docs, uni, bi, tri = _models(spark, self._FLUENT)
        for bad in (0.0, 1.0, -0.5):
            with pytest.raises(ValueError, match="discount"):
                kn_lm_score(docs, uni, bi, tri, discount=bad)


class TestOracle:
    def test_duckdb_replays_fit_and_score(self, spark):
        import duckdb

        from cod_stats_spark.operators.lm_score import (
            kn_lm_oracle_sql,
            kn_lm_score,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown cat sleeps under the old tree"),
            (3, "a slow green turtle walks past the quick brown fox"),
            (4, "single"),
            (5, "two words"),
        ]
        docs, uni, bi, tri = _models(spark, rows)
        got = {
            r["doc_id"]: (r["lm3_tokens"], round(r["lm3_nll"], 6))
            for r in kn_lm_score(docs, uni, bi, tri).collect()
        }
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = {
            int(i): (int(t), round(float(n), 6))
            for i, t, n in con.execute(
                kn_lm_oracle_sql("documents")
            ).fetchall()
        }
        assert got == want


def test_alpha_validation(spark):
    """α ≤ 0 floors OOV probability at exactly 0 — ln(0) would then
    silently corrupt the mean; rejected at entry (r13 review)."""
    from cod_stats_spark.operators.lm_score import kn_lm_score

    docs, uni, bi, tri = _models(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="alpha"):
        kn_lm_score(docs, uni, bi, tri, alpha=0.0)


def test_broadcast_cap_raises_and_shuffled_path_unchanged(
    spark, monkeypatch
):
    """An oversized trigram model under the broadcast default raises
    loudly (the dsir_fit dim-cap convention); broadcast_model=False
    scores it fine with output identical to the small-cap-free run."""
    import cod_stats_spark.operators.lm_score as L

    docs, uni, bi, tri = _models(spark, [(1, "a b c a b d")])
    base = L.kn_lm_score(docs, uni, bi, tri).first()
    monkeypatch.setattr(L, "_KN_BROADCAST_ROW_CAP", 2)
    with pytest.raises(ValueError, match="broadcast cap"):
        L.kn_lm_score(docs, uni, bi, tri)
    got = L.kn_lm_score(docs, uni, bi, tri, broadcast_model=False).first()
    assert got["lm3_tokens"] == base["lm3_tokens"]
    assert got["lm3_nll"] == pytest.approx(base["lm3_nll"], abs=1e-12)
