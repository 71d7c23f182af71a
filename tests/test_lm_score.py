"""Unigram-LM scoring (operators/lm_score.py): likelihood ordering,
unseen-token floor, empty docs, broadcast/shuffle parity, and the
incremental model-merge contract."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "zyx qwv plk jhg"),          # out-of-distribution
        (3, ""),                          # zero tokens
        (4, "the the the the"),           # maximally in-distribution
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestUnigramLm:
    def test_scores_order_fluency_and_handle_empty(self, spark):
        from cod_stats_spark.operators.lm_score import (
            unigram_lm_fit,
            unigram_lm_score,
        )

        docs = _docs(spark)
        out = {
            r["doc_id"]: (r["lm_tokens"], r["lm_nll"])
            for r in unigram_lm_score(docs, unigram_lm_fit(docs)).collect()
        }
        assert len(out) == 5
        assert out[3] == (0, 0.0)                      # empty doc
        assert out[4][1] < out[0][1] < out[2][1]       # fluent < gibberish
        assert all(v[1] >= 0 for v in out.values())

    def test_matches_hand_computed_model(self, spark):
        from cod_stats_spark.operators.lm_score import (
            unigram_lm_fit,
            unigram_lm_score,
        )

        docs = spark.createDataFrame(
            [(0, "a a b"), (1, "b c")], "doc_id long, text string"
        )
        model = unigram_lm_fit(docs)
        counts = {r["token"]: r["cnt"] for r in model.collect()}
        assert counts == {"a": 2, "b": 2, "c": 1}
        n, v = 5.0, 3.0
        p = {t: (c + 1.0) / (n + v) for t, c in counts.items()}
        want0 = -(2 * math.log(p["a"]) + math.log(p["b"])) / 3
        got = {
            r["doc_id"]: r["lm_nll"]
            for r in unigram_lm_score(docs, model).collect()
        }
        assert got[0] == pytest.approx(want0, rel=1e-12)

    def test_unseen_token_gets_floor_probability(self, spark):
        from cod_stats_spark.operators.lm_score import (
            unigram_lm_fit,
            unigram_lm_score,
        )

        train = spark.createDataFrame([(0, "a a b")], "doc_id long, text string")
        test = spark.createDataFrame([(9, "zzz")], "doc_id long, text string")
        model = unigram_lm_fit(train)
        r = unigram_lm_score(test, model).first()
        n, v = 3.0, 2.0
        assert r["lm_nll"] == pytest.approx(-math.log(1.0 / (n + v)), rel=1e-12)

    def test_broadcast_and_shuffle_paths_agree(self, spark):
        from cod_stats_spark.operators.lm_score import (
            unigram_lm_fit,
            unigram_lm_score,
        )

        docs = _docs(spark)
        model = unigram_lm_fit(docs)
        a = sorted(map(tuple, unigram_lm_score(docs, model).collect()))
        b = sorted(
            map(
                tuple,
                unigram_lm_score(
                    docs, model, broadcast_model=False
                ).collect(),
            )
        )
        assert [(x[0], x[1], round(x[2], 9)) for x in a] == [
            (x[0], x[1], round(x[2], 9)) for x in b
        ]

    def test_model_merges_by_count_sum(self, spark):
        """Refit-per-batch + sum == one-shot fit: the model is itself
        a rollup_state 'sum' metric, so incremental maintenance of the
        LM rides the same contract."""
        from cod_stats_spark.operators.lm_score import unigram_lm_fit

        docs = _docs(spark)
        parts = [docs.filter(F.col("doc_id") % 2 == p) for p in (0, 1)]
        merged = (
            unigram_lm_fit(parts[0])
            .unionByName(unigram_lm_fit(parts[1]))
            .groupBy("token")
            .agg(F.sum("cnt").alias("cnt"))
        )
        one = sorted(map(tuple, unigram_lm_fit(docs).collect()))
        two = sorted(map(tuple, merged.collect()))
        assert one == two

    def test_empty_model_guard(self, spark):
        from cod_stats_spark.operators.lm_score import (
            unigram_lm_fit,
            unigram_lm_score,
        )

        empty = spark.createDataFrame([], "doc_id long, text string")
        with pytest.raises(ValueError, match="empty model"):
            unigram_lm_score(_docs(spark), unigram_lm_fit(empty))


class TestBigramLm:
    def _corpus(self, spark):
        return spark.createDataFrame(
            [
                (1, "the cat sat on the mat"),
                (2, "the cat ran to the mat"),
            ],
            "doc_id long, text string",
        )

    def _models(self, spark):
        from cod_stats_spark.operators.lm_score import (
            bigram_lm_fit,
            unigram_lm_fit,
        )

        docs = self._corpus(spark)
        return docs, unigram_lm_fit(docs), bigram_lm_fit(docs)

    def test_matches_hand_computed_interpolation(self, spark):
        """One position checked by hand: doc 'the cat' scored against
        the corpus — P(the) = add-alpha unigram; P(cat|the) =
        0.7·c(the,cat)/c(the) + 0.3·P_uni(cat)."""
        import math

        from cod_stats_spark.operators.lm_score import bigram_lm_score

        docs, uni, bi = self._models(spark)
        probe = spark.createDataFrame([(9, "the cat")], "doc_id long, text string")
        row = bigram_lm_score(probe, uni, bi).collect()[0]
        # corpus: 12 tokens, 7 distinct; c(the)=4, c(cat)=2, c(the,cat)=2
        denom = 12 + 7.0
        p_the = (4 + 1) / denom
        p_cat_given_the = 0.7 * 2 / 4 + 0.3 * ((2 + 1) / denom)
        want = -(math.log(p_the) + math.log(p_cat_given_the)) / 2
        assert row["lm2_tokens"] == 2
        assert abs(row["lm2_nll"] - want) < 1e-12

    def test_unseen_context_backs_off_to_unigram(self, spark):
        """A pair with an unseen context has no bigram mass: its term
        is exactly (1-λ)·P_uni(w) — strictly worse than any seen
        continuation."""
        import math

        from cod_stats_spark.operators.lm_score import bigram_lm_score

        docs, uni, bi = self._models(spark)
        probe = spark.createDataFrame(
            [(9, "zzz the")], "doc_id long, text string"
        )
        row = bigram_lm_score(probe, uni, bi).collect()[0]
        denom = 12 + 7.0
        floor = 1.0 / denom                 # unseen 'zzz'
        p_the_after_zzz = 0.3 * ((4 + 1) / denom)
        want = -(math.log(floor) + math.log(p_the_after_zzz)) / 2
        assert abs(row["lm2_nll"] - want) < 1e-12

    def test_fluent_bigrams_beat_shuffled_words(self, spark):
        from cod_stats_spark.operators.lm_score import bigram_lm_score

        docs, uni, bi = self._models(spark)
        probe = spark.createDataFrame(
            [(1, "the cat sat on the mat"), (2, "mat the on sat cat the")],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r["lm2_nll"] for r in bigram_lm_score(probe, uni, bi).collect()}
        # same unigram mass, so only bigram structure separates them
        assert got[1] < got[2]

    def test_empty_null_and_empty_bigram_model(self, spark):
        from cod_stats_spark.operators.lm_score import (
            bigram_lm_fit,
            bigram_lm_score,
            unigram_lm_fit,
        )

        single = spark.createDataFrame([(1, "word")], "doc_id long, text string")
        uni, bi = unigram_lm_fit(single), bigram_lm_fit(single)
        assert bi.count() == 0              # no adjacent pairs at all
        probe = spark.createDataFrame(
            [(1, ""), (2, None), (3, "word word")], "doc_id long, text string"
        )
        got = {r["doc_id"]: (r["lm2_tokens"], r["lm2_nll"]) for r in
               bigram_lm_score(probe, uni, bi).collect()}
        assert got[1] == (0, 0.0) and got[2] == (0, 0.0)
        assert got[3][0] == 2 and got[3][1] > 0.0


    def test_broadcast_and_shuffle_bigram_paths_agree(self, spark):
        from cod_stats_spark.operators.lm_score import bigram_lm_score

        docs, uni, bi = self._models(spark)
        probe = spark.createDataFrame(
            [(1, "the cat sat"), (2, "zzz the mat")],
            "doc_id long, text string",
        )
        a = sorted(
            (r["doc_id"], r["lm2_tokens"], round(r["lm2_nll"], 12))
            for r in bigram_lm_score(probe, uni, bi).collect()
        )
        b = sorted(
            (r["doc_id"], r["lm2_tokens"], round(r["lm2_nll"], 12))
            for r in bigram_lm_score(
                probe, uni, bi, broadcast_model=False
            ).collect()
        )
        assert a == b

    def test_bigram_context_missing_from_unigram_model_drops_not_crashes(
        self, spark
    ):
        """Independently merged/refreshed models can leave a bigram
        whose CONTEXT token w1 is absent from the unigram model. The
        shuffle path silently drops such rows (inner join on w1); the
        broadcast path must match — back off via the unigram term, not
        KeyError (round-9 advice)."""
        from cod_stats_spark.operators.lm_score import bigram_lm_score

        docs, uni, bi = self._models(spark)
        ghost = spark.createDataFrame(
            [("ghost", "cat", 3)], "w1 string, w2 string, cnt long"
        )
        bi2 = bi.unionByName(ghost)
        probe = spark.createDataFrame(
            [(1, "ghost cat sat"), (2, "the cat sat")],
            "doc_id long, text string",
        )
        a = sorted(
            (r["doc_id"], r["lm2_tokens"], round(r["lm2_nll"], 12))
            for r in bigram_lm_score(probe, uni, bi2).collect()
        )
        b = sorted(
            (r["doc_id"], r["lm2_tokens"], round(r["lm2_nll"], 12))
            for r in bigram_lm_score(
                probe, uni, bi2, broadcast_model=False
            ).collect()
        )
        assert a == b
        # and the poisoned pair changed nothing vs the clean model
        clean = sorted(
            (r["doc_id"], r["lm2_tokens"], round(r["lm2_nll"], 12))
            for r in bigram_lm_score(probe, uni, bi).collect()
        )
        assert a == clean


class TestPerplexityPartition:
    """CCNet head/middle/tail split (r12): value-based quantile-cut
    bucketing, per-group cuts, no global window in the plan."""

    def _scored(self, spark):
        rows = [
            # lang en: nll 1..6 -> buckets 1,1,2,2,3,3
            (1, "en", 1.0), (2, "en", 2.0), (3, "en", 3.0),
            (4, "en", 4.0), (5, "en", 5.0), (6, "en", 6.0),
            # lang fr: different scale — cuts are per group
            (7, "fr", 100.0), (8, "fr", 200.0), (9, "fr", 300.0),
        ]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, lm_nll double"
        )

    def test_buckets_monotone_and_per_group(self, spark):
        from cod_stats_spark.operators.lm_score import perplexity_partition

        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_partition(
                self._scored(spark), by="lang"
            ).collect()
        }
        assert got == {1: 1, 2: 1, 3: 2, 4: 2, 5: 3, 6: 3,
                       7: 1, 8: 2, 9: 3}

    def test_ties_share_a_bucket(self, spark):
        from cod_stats_spark.operators.lm_score import perplexity_partition

        df = spark.createDataFrame(
            [(i, 1.0 if i <= 4 else 9.0) for i in range(1, 7)],
            "doc_id long, lm_nll double",
        )
        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_partition(df).collect()
        }
        # equal values never split across buckets (ntile would)
        assert len({got[i] for i in (1, 2, 3, 4)}) == 1
        assert got[5] == got[6] and got[5] > got[1]

    def test_no_window_in_plan(self, spark):
        """The 100 TB contract: quantile cuts + broadcast join, never
        a global ntile window (single-task sort)."""
        from cod_stats_spark.operators.lm_score import perplexity_partition

        plan = (
            perplexity_partition(self._scored(spark), by="lang")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Window" not in plan
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    def test_bad_buckets_rejected(self, spark):
        import pytest

        from cod_stats_spark.operators.lm_score import perplexity_partition

        with pytest.raises(ValueError, match="buckets"):
            perplexity_partition(self._scored(spark), buckets=1)

    def test_duckdb_replay(self, spark):
        """The oracle builder agrees row for row on a synthetic scored
        relation (the quality_tokens gate replays the real one)."""
        import duckdb

        from cod_stats_spark.operators.lm_score import (
            perplexity_partition,
            perplexity_partition_oracle_sql,
        )

        sdf = self._scored(spark)
        got = sorted(
            (r["doc_id"], r["ppl_bucket"])
            for r in perplexity_partition(sdf, by="lang").collect()
        )
        con = duckdb.connect()
        con.register("scored", sdf.toPandas())
        sql = perplexity_partition_oracle_sql(
            "SELECT doc_id, lm_nll FROM scored", "scored", by="lang"
        )
        duck = sorted(
            tuple(r) for r in con.sql(sql).fetchall()
        )
        assert got == duck

    def test_approx_cuts_parity_bounded_to_boundary_docs(self, spark):
        """r13 (r12 verdict #2): the at-scale 'approx' dual path. At
        high accuracy the G-K sketch reproduces the exact buckets; at
        deliberately LOW accuracy, every disagreeing document's score
        must lie between the exact and approx cut points of the
        boundary it straddles — the documented disagreement bound."""
        from cod_stats_spark.operators.lm_score import perplexity_partition

        rows = [
            (i, "en", float(i % 97) + (i % 7) / 10.0) for i in range(400)
        ] + [(1000 + i, "fr", float(i % 13)) for i in range(100)]
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, lm_nll double"
        )
        exact = perplexity_partition(df, by="lang")
        tight = perplexity_partition(
            df, by="lang", cuts_method="approx", approx_accuracy=100_000
        )
        e = {r["doc_id"]: r["ppl_bucket"] for r in exact.collect()}
        t = {r["doc_id"]: r["ppl_bucket"] for r in tight.collect()}
        assert e == t  # high accuracy: bit-equal partition

        loose = perplexity_partition(
            df, by="lang", cuts_method="approx", approx_accuracy=10
        )
        l = {r["doc_id"]: r["ppl_bucket"] for r in loose.collect()}
        nll = dict(
            (r["doc_id"], (r["lang"], round(r["lm_nll"], 6)))
            for r in df.collect()
        )
        # recompute both cut sets per group to bound the disagreements
        import numpy as np

        by_lang = {}
        for did, (lang, v) in nll.items():
            by_lang.setdefault(lang, []).append(v)
        exact_cuts = {
            lang: np.percentile(vs, [100 / 3, 200 / 3], method="linear")
            for lang, vs in by_lang.items()
        }
        for did, lb in l.items():
            eb = e[did]
            if lb == eb:
                continue
            assert abs(lb - eb) == 1, (did, eb, lb)
            lang, v = nll[did]
            # straddled boundary: between buckets min(eb,lb) and +1
            cut = exact_cuts[lang][min(eb, lb) - 1]
            # the doc sits within the groups's rank-error band of the
            # exact cut: n/accuracy ranks — translate to a generous
            # value-space check (within the exact cut's neighborhood)
            vs = sorted(by_lang[lang])
            n = len(vs)
            import bisect

            rank_v = bisect.bisect_left(vs, v)
            rank_c = bisect.bisect_left(vs, cut)
            assert abs(rank_v - rank_c) <= n / 10 + 1, (
                did, v, cut, rank_v, rank_c,
            )

    def test_approx_method_validated(self, spark):
        from cod_stats_spark.operators.lm_score import perplexity_partition

        with pytest.raises(ValueError, match="cuts_method"):
            perplexity_partition(self._scored(spark), cuts_method="nope")

    def test_null_group_rows_survive(self, spark):
        """r12 review (3rd pass): a null group key must keep its rows
        (null-safe join) — an inner equi-join silently dropped them."""
        import duckdb

        from cod_stats_spark.operators.lm_score import (
            perplexity_partition,
            perplexity_partition_oracle_sql,
        )

        df = spark.createDataFrame(
            [(1, None, 1.0), (2, None, 2.0), (3, None, 3.0),
             (4, "en", 5.0)],
            "doc_id long, lang string, lm_nll double",
        )
        got = {
            r["doc_id"]: r["ppl_bucket"]
            for r in perplexity_partition(df, by="lang").collect()
        }
        assert set(got) == {1, 2, 3, 4}          # nothing dropped
        assert got[1] == 1 and got[3] == 3 and got[4] in (1, 2, 3)
        con = duckdb.connect()
        con.register("scored", df.toPandas())
        sql = perplexity_partition_oracle_sql(
            "SELECT doc_id, lm_nll FROM scored", "scored", by="lang"
        )
        duck = dict(con.sql(sql).fetchall())
        assert duck == got
