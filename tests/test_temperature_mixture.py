"""Temperature-based mixture rebalancing (operators/sampling.py
temperature_weights/temperature_mixture): the mC4/XLM-R p_d ∝ m_d^α
posture — α=1 is the identity, α<1 upsamples low-resource domains and
thins high-resource ones with total expected mass preserved, the
exact output is a pure function of the data, and the DuckDB oracle
replays weights + expansion end to end. SQL value verification on the
real tables lives in the stratified_sample gate's 'tmix' arm."""

from __future__ import annotations

import pytest


def _docs(spark):
    rows = (
        [(i, "en", 100) for i in range(40)]
        + [(100 + i, "fr", 100) for i in range(10)]
        + [(200 + i, "sw", 100) for i in range(2)]
        + [(300, None, 100)]
    )
    return spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")


class TestWeights:
    def test_alpha_one_is_identity(self):
        from cod_stats_spark.operators.sampling import temperature_weights

        w = temperature_weights({"en": 4000.0, "fr": 1000.0, "sw": 200.0}, 1.0)
        assert w == {"en": 1.0, "fr": 1.0, "sw": 1.0}

    def test_alpha_below_one_rebalances_and_preserves_mass(self):
        from cod_stats_spark.operators.sampling import temperature_weights

        sizes = {"en": 4000.0, "fr": 1000.0, "sw": 200.0}
        w = temperature_weights(sizes, 0.5)
        assert w["en"] < 1.0 < w["sw"]
        assert w["sw"] > w["fr"] > w["en"]
        total = sum(sizes.values())
        assert sum(w[d] * m for d, m in sizes.items()) == pytest.approx(
            total, rel=1e-6
        )

    def test_max_weight_caps_tiny_domains(self):
        from cod_stats_spark.operators.sampling import temperature_weights

        sizes = {"en": 100_000.0, "sw": 10.0}
        uncapped = temperature_weights(sizes, 0.2)
        assert uncapped["sw"] > 4.0
        capped = temperature_weights(sizes, 0.2, max_weight=3.0)
        assert capped["sw"] == 3.0

    def test_validation(self):
        from cod_stats_spark.operators.sampling import temperature_weights

        with pytest.raises(ValueError, match="alpha"):
            temperature_weights({"en": 1.0}, 0.0)
        with pytest.raises(ValueError, match="no positive-mass"):
            temperature_weights({"en": 0.0}, 0.5)


class TestMixture:
    def test_alpha_one_keeps_every_row_once(self, spark):
        from cod_stats_spark.operators.sampling import temperature_mixture

        out = temperature_mixture(
            _docs(spark), "doc_id", "lang", alpha=1.0, size_col="n_chars"
        )
        rows = out.collect()
        assert len(rows) == 53
        assert all(r["epoch"] == 0 for r in rows)

    def test_rebalances_counts_and_is_partitioning_independent(self, spark):
        from cod_stats_spark.operators.sampling import temperature_mixture

        docs = _docs(spark)
        a = sorted(
            (r["doc_id"], r["epoch"])
            for r in temperature_mixture(
                docs, "doc_id", "lang", alpha=0.3
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["epoch"])
            for r in temperature_mixture(
                docs.repartition(13), "doc_id", "lang", alpha=0.3
            ).collect()
        )
        assert a == b
        by_lang = {"en": 0, "fr": 0, "sw": 0}
        for doc_id, _ in a:
            if doc_id < 100:
                by_lang["en"] += 1
            elif doc_id < 200:
                by_lang["fr"] += 1
            elif doc_id < 300:
                by_lang["sw"] += 1
        # sw (2 docs) must replicate; en (40 docs) must thin
        assert by_lang["sw"] > 2
        assert by_lang["en"] < 40
        assert "epoch_key" in (
            temperature_mixture(docs, "doc_id", "lang", alpha=0.3).columns
        )

    def test_null_domain_rows_keep_single_epoch(self, spark):
        from cod_stats_spark.operators.sampling import temperature_mixture

        out = temperature_mixture(
            _docs(spark), "doc_id", "lang", alpha=0.3
        ).where("doc_id = 300").collect()
        assert [(r["doc_id"], r["epoch"]) for r in out] == [(300, 0)]

    def test_oracle_replays_exact_expansion(self, spark):
        import duckdb

        from cod_stats_spark.operators.sampling import (
            temperature_mixture,
            temperature_mixture_oracle_sql,
        )

        docs = _docs(spark)
        got = sorted(
            (r["doc_id"], r["lang"], r["epoch"])
            for r in temperature_mixture(
                docs, "doc_id", "lang", alpha=0.4,
                size_col="n_chars", salt="t", max_weight=4.0,
            ).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(
            (int(i), d, int(e))
            for i, d, e in con.execute(
                temperature_mixture_oracle_sql(
                    "documents", "doc_id", "lang", alpha=0.4,
                    size_expr="n_chars", salt="t", max_weight=4.0,
                )
            ).fetchall()
        )
        assert got == want


class TestUniMax:
    def test_waterfill_hand_computed(self):
        """sizes en=1000, fr=200, sw=50; budget=600, cap=2 epochs.
        Capacities: sw 100, fr 400, en 2000 (ascending: sw, fr, en).
        sw: share 200 -> capped at 100 (w=2.0); remaining 500.
        fr: share 250 -> fits under 400 (w=1.25); remaining 250.
        en: share 250 (w=0.25)."""
        from cod_stats_spark.operators.sampling import unimax_weights

        w = unimax_weights(
            {"en": 1000.0, "fr": 200.0, "sw": 50.0},
            budget=600, max_epochs=2.0,
        )
        assert w == {"sw": 2.0, "fr": 1.25, "en": 0.25}
        # total allocated mass equals the budget exactly
        assert sum(w[d] * m for d, m in
                   {"en": 1000.0, "fr": 200.0, "sw": 50.0}.items()) == 600

    def test_budget_past_capacity_caps_everything(self):
        from cod_stats_spark.operators.sampling import unimax_weights

        w = unimax_weights({"a": 10.0, "b": 20.0}, budget=1000,
                           max_epochs=3.0)
        assert w == {"a": 3.0, "b": 3.0}

    def test_small_budget_is_uniform(self):
        """Under a tight budget no cap binds: every domain gets the
        same absolute allocation (the paper's uniform ideal)."""
        from cod_stats_spark.operators.sampling import unimax_weights

        sizes = {"a": 100.0, "b": 400.0, "c": 1000.0}
        w = unimax_weights(sizes, budget=150, max_epochs=1.0)
        allocs = {d: w[d] * m for d, m in sizes.items()}
        assert all(a == pytest.approx(50.0) for a in allocs.values())

    def test_validation(self):
        from cod_stats_spark.operators.sampling import unimax_weights

        with pytest.raises(ValueError, match="budget"):
            unimax_weights({"a": 1.0}, budget=0)
        with pytest.raises(ValueError, match="max_epochs"):
            unimax_weights({"a": 1.0}, budget=1, max_epochs=0)
        with pytest.raises(ValueError, match="no positive-mass"):
            unimax_weights({"a": 0.0}, budget=1)

    def test_mixture_applies_weights_deterministically(self, spark):
        from cod_stats_spark.operators.sampling import unimax_mixture

        docs = _docs(spark)  # 40 en, 10 fr, 2 sw, 1 null-lang
        a = sorted(
            (r["doc_id"], r["epoch"])
            for r in unimax_mixture(
                docs, "doc_id", "lang", budget=30, max_epochs=2.0
            ).collect()
        )
        b = sorted(
            (r["doc_id"], r["epoch"])
            for r in unimax_mixture(
                docs.repartition(7), "doc_id", "lang",
                budget=30, max_epochs=2.0,
            ).collect()
        )
        assert a == b
        # sw (2 docs) hits its 2-epoch cap -> 4 copies; en thins hard
        by = {}
        for doc_id, _ in a:
            if doc_id == 300:
                by["null"] = by.get("null", 0) + 1
            elif doc_id >= 200:
                by["sw"] = by.get("sw", 0) + 1
            elif doc_id >= 100:
                by["fr"] = by.get("fr", 0) + 1
            else:
                by["en"] = by.get("en", 0) + 1
        assert by["sw"] == 4
        assert by["en"] < 40
        assert by["null"] == 1  # null domain keeps its single epoch

    def test_unimax_oracle_replays_exact_expansion(self, spark):
        import duckdb

        from cod_stats_spark.operators.sampling import (
            unimax_mixture,
            unimax_mixture_oracle_sql,
        )

        docs = _docs(spark)
        kw = dict(budget=30.0, max_epochs=2.0, salt="u")
        got = sorted(
            (r["doc_id"], r["lang"], r["epoch"])
            for r in unimax_mixture(docs, "doc_id", "lang", **kw).collect()
        )
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        want = sorted(
            (int(i), d, int(e))
            for i, d, e in con.execute(
                unimax_mixture_oracle_sql("documents", "doc_id", "lang", **kw)
            ).fetchall()
        )
        assert got == want
        # a budget where EVERY domain caps (the k = n edge)
        kw2 = dict(budget=10_000.0, max_epochs=1.5, salt="u2")
        got2 = sorted(
            (r["doc_id"], r["epoch"])
            for r in unimax_mixture(docs, "doc_id", "lang", **kw2).collect()
        )
        want2 = sorted(
            (int(i), int(e))
            for i, _, e in con.execute(
                unimax_mixture_oracle_sql("documents", "doc_id", "lang", **kw2)
            ).fetchall()
        )
        assert got2 == want2


class TestRelationPath:
    """epoch_expand's >64-domain broadcast-relation dispatch (r14):
    identical copy set to the literal when-chain, BroadcastHashJoin in
    the plan, and the DuckDB oracle unchanged across the switch."""

    def _wide(self, spark, n_domains=80, rows_per=3):
        rows = [
            (d * 1000 + i, f"d{d:03d}")
            for d in range(n_domains)
            for i in range(rows_per)
        ] + [(999_999, None)]
        return spark.createDataFrame(rows, "doc_id long, lang string")

    def _weights(self, n_domains=80):
        # spread: thinning, identity, integer epochs, fractional epochs
        return {
            f"d{d:03d}": [0.4, 1.0, 2.0, 1.7, 2.35][d % 5]
            for d in range(n_domains)
        }

    def test_relation_path_matches_literal_path(self, spark, monkeypatch):
        import cod_stats_spark.operators.sampling as S

        docs = self._wide(spark)
        w = self._weights()
        assert len(w) > S._EXPAND_LITERAL_LIMIT
        got_rel = {
            (r["doc_id"], r["epoch"], r["epoch_key"])
            for r in S.epoch_expand(docs, "doc_id", "lang", w, salt="rp").collect()
        }
        monkeypatch.setattr(S, "_EXPAND_LITERAL_LIMIT", 10_000)
        got_lit = {
            (r["doc_id"], r["epoch"], r["epoch_key"])
            for r in S.epoch_expand(docs, "doc_id", "lang", w, salt="rp").collect()
        }
        assert got_rel == got_lit
        # the spread exercises every branch: some thinned away, some
        # replicated past epoch 0, the null-domain row kept once
        epochs = {}
        for _id, ep, _k in got_rel:
            epochs.setdefault(_id, []).append(ep)
        assert (999_999, 0, "999999:0") in got_rel
        assert any(len(v) > 2 for v in epochs.values())
        assert len({i for i, _, _ in got_rel}) < docs.count() * 1  # some thinned
        for _id, eps in epochs.items():
            assert sorted(eps) == list(range(len(eps)))  # contiguous 0..k

    def test_relation_path_is_broadcast_join(self, spark):
        import cod_stats_spark.operators.sampling as S

        docs = self._wide(spark)
        out = S.epoch_expand(docs, "doc_id", "lang", self._weights(), salt="rp")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        # helper columns must not leak into the output contract
        assert set(out.columns) == {"doc_id", "lang", "epoch", "epoch_key"}

    def test_oracle_replays_relation_path(self, spark):
        import duckdb

        from cod_stats_spark.operators.sampling import (
            temperature_mixture,
            temperature_mixture_oracle_sql,
        )

        docs = self._wide(spark, n_domains=70, rows_per=4)
        got = {
            (r["doc_id"], r["epoch"])
            for r in temperature_mixture(
                docs, "doc_id", "lang", alpha=0.3, salt="rp70",
                max_weight=3.0,
            ).collect()
        }
        con = duckdb.connect()
        con.register("docs70", docs.toPandas())
        want = {
            (int(i), int(e))
            for i, _d, e in con.execute(
                temperature_mixture_oracle_sql(
                    "docs70", "doc_id", "lang", alpha=0.3, salt="rp70",
                    max_weight=3.0,
                )
            ).fetchall()
        }
        assert got == want


class TestMixtureSampleRelationPath:
    """mixture_sample's >64-domain broadcast-threshold dispatch (r14):
    identical keep set to the literal when-chain, helper columns
    dropped, out-of-mixture domains still eliminated."""

    def test_relation_matches_literal_and_drops_unlisted(
        self, spark, monkeypatch
    ):
        import cod_stats_spark.operators.sampling as S

        rows = [
            (d * 1000 + i, f"d{d:03d}")
            for d in range(80)
            for i in range(4)
        ] + [(777_777, "unlisted"), (888_888, None)]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        # 70 listed target domains (> the 64 dispatch limit), varied
        # weights; 10 corpus domains + 'unlisted' + null stay outside
        w = {f"d{d:03d}": 1.0 + (d % 3) for d in range(70)}
        got_rel = {
            r["doc_id"]
            for r in S.mixture_sample(
                docs, "doc_id", "lang", w, budget=150.0, salt="ms"
            ).collect()
        }
        out = S.mixture_sample(docs, "doc_id", "lang", w, budget=150.0, salt="ms")
        assert set(out.columns) == {"doc_id", "lang"}
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        monkeypatch.setattr(S, "_EXPAND_LITERAL_LIMIT", 10_000)
        got_lit = {
            r["doc_id"]
            for r in S.mixture_sample(
                docs, "doc_id", "lang", w, budget=150.0, salt="ms"
            ).collect()
        }
        assert got_rel == got_lit
        assert 777_777 not in got_rel and 888_888 not in got_rel
        assert 0 < len(got_rel) < docs.count()


class TestNonStringDomainDispatch:
    """Non-string domain maps behave identically on BOTH dispatch
    paths (r14 advice): an integer-keyed mixture_sample map used to
    work on the literal when-chain and then fail createDataFrame once
    it crossed _EXPAND_LITERAL_LIMIT — a size-dependent behavior
    cliff. The relation's key column is now TYPED from the map's own
    keys (epoch_expand keeps its historical str()-key contract), so
    the analyzer's comparison coercion applies identically to the
    literal and relation paths — incl. bool domains, where a
    column-side string cast would render 'true' while Python str()
    renders 'True' (r15 review)."""

    def _int_docs(self, spark, n_domains=80, rows_per=3):
        rows = [
            (d * 100 + i, d) for d in range(n_domains) for i in range(rows_per)
        ]
        return spark.createDataFrame(rows, "doc_id long, dom int")

    def test_epoch_expand_int_domains_relation_equals_literal(
        self, spark, monkeypatch
    ):
        import cod_stats_spark.operators.sampling as S

        docs = self._int_docs(spark)
        w = {d: [0.5, 1.0, 2.4][d % 3] for d in range(80)}
        assert len(w) > S._EXPAND_LITERAL_LIMIT
        got_rel = {
            (r["doc_id"], r["epoch"])
            for r in S.epoch_expand(docs, "doc_id", "dom", w, salt="i").collect()
        }
        monkeypatch.setattr(S, "_EXPAND_LITERAL_LIMIT", 10_000)
        got_lit = {
            (r["doc_id"], r["epoch"])
            for r in S.epoch_expand(docs, "doc_id", "dom", w, salt="i").collect()
        }
        assert got_rel == got_lit
        assert any(e > 0 for _, e in got_rel)  # some replication happened

    def test_mixture_sample_int_domains_relation_equals_literal(
        self, spark, monkeypatch
    ):
        import cod_stats_spark.operators.sampling as S

        docs = self._int_docs(spark, rows_per=4)
        w = {d: 1.0 + (d % 3) for d in range(70)}  # 10 domains unlisted
        got_rel = {
            r["doc_id"]
            for r in S.mixture_sample(
                docs, "doc_id", "dom", w, budget=150.0, salt="im"
            ).collect()
        }
        monkeypatch.setattr(S, "_EXPAND_LITERAL_LIMIT", 10_000)
        got_lit = {
            r["doc_id"]
            for r in S.mixture_sample(
                docs, "doc_id", "dom", w, budget=150.0, salt="im"
            ).collect()
        }
        assert got_rel == got_lit
        assert 0 < len(got_rel) < docs.count()  # unlisted domains dropped

    def test_mixture_sample_bool_domains_keep_working(self, spark):
        """Bool keys: Python str(True)='True' but Spark's cast renders
        'true' — the literal path must keep its raw-comparison
        semantics (r15 review; a column string cast silently dropped
        EVERY row here)."""
        import cod_stats_spark.operators.sampling as S

        rows = [(i, i % 3 != 0) for i in range(90)]
        docs = spark.createDataFrame(rows, "doc_id long, is_web boolean")
        got = {
            r["doc_id"]
            for r in S.mixture_sample(
                docs, "doc_id", "is_web", {True: 0.6, False: 0.4},
                budget=30.0, salt="b",
            ).collect()
        }
        assert 0 < len(got) < 90  # thinned, NOT emptied

    def test_mixture_sample_rejects_exotic_and_mixed_key_types(self, spark):
        """Entry-time, size-independent: a mixed- or exotic-type map
        fails loudly on the 2-domain literal path too, never only
        past the 64-domain relation cliff (r15 second review)."""
        import cod_stats_spark.operators.sampling as S

        docs = spark.createDataFrame(
            [(1, "a")], "doc_id long, dom string"
        )
        with pytest.raises(ValueError, match="domain keys"):
            S._domain_sql_type([object()])
        with pytest.raises(ValueError, match="one type"):
            S.mixture_sample(
                docs, "doc_id", "dom", {1: 0.5, "web": 0.5}, budget=1.0
            )


class TestSequentialSumParity:
    """The mixture oracles' exact-reproducibility claim rests on the
    SQL accumulating total/denom/prefix in the SAME order as Python's
    sorted-domain loop. A windowed running SUM is NOT sequential —
    DuckDB's segment-tree window aggregation combines pairwise past
    64 rows and diverges in the last ulp (found in r14 review, and
    measured: 6e-8 absolute at n=1000) — so the oracles use a
    RECURSIVE chain. These tests pin the mechanism and the parity at
    cardinalities far past the 64-row leaf."""

    def _masses(self, n):
        import random

        rng = random.Random(20260816)
        return {f"d{i:04d}": rng.uniform(1.0, 1e6) for i in range(n)}

    def test_recursive_chain_matches_python_bit_for_bit(self):
        import duckdb

        ms = self._masses(1000)
        alpha = 0.37
        tot = 0.0
        den = 0.0
        for d in sorted(ms):
            tot += ms[d]
            den += ms[d] ** alpha
        import pandas as pd

        con = duckdb.connect()
        # Arrow registration, NOT SQL literals: a VALUES list goes
        # through a DECIMAL intermediate that truncates the last ulp
        # of ~200/1000 doubles (measured) — the real oracles never
        # parse literals, their masses are computed in-engine
        con.register(
            "sizes",
            pd.DataFrame(
                {"d": sorted(ms), "m": [ms[d] for d in sorted(ms)]}
            ),
        )
        got = con.execute(f"""
SELECT * FROM (
  WITH RECURSIVE ordx AS (
    SELECT d, m, row_number() OVER (ORDER BY d) AS rn FROM sizes
  ),
  run(rn, rtot, rden) AS (
    SELECT rn, m, pow(m, {alpha!r}) FROM ordx WHERE rn = 1
    UNION ALL
    SELECT o.rn, r.rtot + o.m, r.rden + pow(o.m, {alpha!r})
    FROM run r JOIN ordx o ON o.rn = r.rn + 1
  )
  SELECT rtot, rden FROM run ORDER BY rn DESC LIMIT 1
)
""").fetchone()
        assert got[0] == tot and got[1] == den  # EXACT, not approx

    def test_tmix_oracle_parity_past_window_leaf(self, spark):
        import duckdb

        from cod_stats_spark.operators.sampling import (
            temperature_mixture,
            temperature_mixture_oracle_sql,
        )

        ms = self._masses(150)
        rows = [
            (i * 1000 + j, d)
            for i, d in enumerate(sorted(ms))
            for j in range(1 + i % 4)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        got = {
            (r["doc_id"], r["epoch"])
            for r in temperature_mixture(
                docs, "doc_id", "lang", alpha=0.37, salt="sq150"
            ).collect()
        }
        con = duckdb.connect()
        con.register("docs150", docs.toPandas())
        want = {
            (int(i), int(e))
            for i, _d, e in con.execute(
                temperature_mixture_oracle_sql(
                    "docs150", "doc_id", "lang", alpha=0.37, salt="sq150"
                )
            ).fetchall()
        }
        assert got == want

    def test_umax_oracle_parity_past_window_leaf(self, spark):
        import duckdb

        from cod_stats_spark.operators.sampling import (
            unimax_mixture,
            unimax_mixture_oracle_sql,
        )

        ms = self._masses(150)
        rows = [
            (i * 1000 + j, d)
            for i, d in enumerate(sorted(ms))
            for j in range(1 + i % 5)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, lang string")
        got = {
            (r["doc_id"], r["epoch"])
            for r in unimax_mixture(
                docs, "doc_id", "lang", budget=250.0, max_epochs=2.0,
                salt="sq150u",
            ).collect()
        }
        con = duckdb.connect()
        con.register("docs150u", docs.toPandas())
        want = {
            (int(i), int(e))
            for i, _d, e in con.execute(
                unimax_mixture_oracle_sql(
                    "docs150u", "doc_id", "lang", budget=250.0,
                    max_epochs=2.0, salt="sq150u",
                )
            ).fetchall()
        }
        assert got == want


class TestDomainFeedIntegration:
    """The advertised end-to-end feed (r13 verdict remark): per-
    REGISTERED-DOMAIN mixtures — url.domain_stats keys (hundreds to
    millions of domains) driving temperature_mixture, with BOTH
    high-cardinality relation paths engaged (the >64-rule PSL lookup
    upstream and epoch_expand's >64-domain broadcast weights
    downstream)."""

    def test_domain_stats_feeds_mixture_at_high_cardinality(self, spark):
        from pyspark.sql import functions as F

        from cod_stats_spark.functions.url import domain_stats
        from cod_stats_spark.operators.sampling import (
            temperature_mixture,
        )

        # 90 registered domains (> the 64 dispatch limit), skewed
        # masses: domain i carries i+1 docs
        rows = []
        did = 0
        for i in range(90):
            for j in range(i % 7 + 1):
                rows.append(
                    (did, f"https://sub.site{i:03d}.com/p/{j}",
                     f"document body {i} {j} with several plain words")
                )
                did += 1
        docs = spark.createDataFrame(
            rows, "doc_id long, url string, text string"
        )
        stats = domain_stats(docs, "url", "text")
        sizes = {
            r["domain"]: float(r["n_docs"])
            for r in stats.collect()
            if r["domain"] is not None
        }
        assert len(sizes) == 90
        assert sizes["site000.com"] == 1.0
        assert sizes["site006.com"] == 7.0
        # re-key every doc by its registered domain, then rebalance
        keyed = docs.withColumn(
            "_dom",
            F.regexp_extract("url", r"https://sub\.(site\d+\.com)/", 1),
        )
        mixed = temperature_mixture(
            keyed, "doc_id", "_dom", alpha=0.3, salt="domfeed",
            max_weight=3.0,
        )
        # the >64-domain weight map must take the broadcast relation
        # path, not a 90-branch when-chain
        plan = mixed._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        out = mixed.groupBy("_dom").count().collect()
        by_dom = {r["_dom"]: r["count"] for r in out}
        # low-resource domains upsample (1-doc domain, weight > 1 at
        # α=0.3); some high-resource (7-doc) domain thins below its
        # input count
        assert by_dom["site000.com"] >= 2
        seven_doc = [f"site{i:03d}.com" for i in range(90) if i % 7 == 6]
        assert seven_doc and any(
            by_dom.get(d, 0) < 7 for d in seven_doc
        )
