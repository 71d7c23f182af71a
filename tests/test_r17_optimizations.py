"""Parity pins for the round-17 optimizations: every change here is
a pure physical rewrite — these tests pin the VALUE equivalences the
rewrites rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def lm_docs(spark):
    rows = [
        (1, "alpha beta gamma alpha"),
        (2, "beta beta delta"),
        (3, "unseen tokens only here"),
        (4, ""),                      # zero-token doc scores (0, 0.0)
        (5, "alpha"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestUnigramLiteralMap:
    def test_map_path_matches_join_path(self, spark, lm_docs):
        """Small vocab -> literal-map projection; scores must be
        bit-identical to the broadcast-relation join path (forced by
        shrinking the cap) and to the persist path."""
        import cod_stats_spark.operators.lm_score as L

        model = L.unigram_lm_fit(lm_docs)
        via_map = L.unigram_lm_score(lm_docs, model).collect()
        # force the relation path: cap below the vocab size
        orig = L._ARPA_EXPR_ROW_CAP
        try:
            L._ARPA_EXPR_ROW_CAP = 0
            via_join = L.unigram_lm_score(lm_docs, model).collect()
        finally:
            L._ARPA_EXPR_ROW_CAP = orig
        via_persist = L.unigram_lm_score(
            lm_docs, model, broadcast_model=False
        ).collect()
        key = lambda rs: sorted(
            (r["doc_id"], r["lm_tokens"], r["lm_nll"]) for r in rs
        )
        assert key(via_map) == key(via_join) == key(via_persist)

    def test_map_path_plan_has_no_join(self, spark, lm_docs):
        """The cap-admitted plan must carry the model as literals:
        no join and no broadcast exchange anywhere in the scoring
        subtree that the join path needed (the docs-side id-restore
        left join remains — it is part of both paths)."""
        import cod_stats_spark.operators.lm_score as L

        model = L.unigram_lm_fit(lm_docs)
        plan_map = (
            L.unigram_lm_score(lm_docs, model)
            ._jdf.queryExecution().analyzed().toString()
        )
        orig = L._ARPA_EXPR_ROW_CAP
        try:
            L._ARPA_EXPR_ROW_CAP = 0
            plan_join = (
                L.unigram_lm_score(lm_docs, model)
                ._jdf.queryExecution().analyzed().toString()
            )
        finally:
            L._ARPA_EXPR_ROW_CAP = orig
        assert plan_map.count("Join") == plan_join.count("Join") - 1
        assert "map(" in plan_map or "keys:" in plan_map


class TestWinnowProbeGate:
    def test_non_ansi_session_emits_element_at(self, spark):
        """The pinned non-ANSI test session must get the fast probe."""
        from cod_stats_spark.operators.dedup import winnow_sql

        sql = winnow_sql("text")
        assert "element_at" in sql and "try_element_at" not in sql

    def test_explicit_ansi_emits_try_element_at(self):
        from cod_stats_spark.operators.dedup import winnow_sql

        sql = winnow_sql("text", ansi=True)
        assert "try_element_at" in sql

    def test_probe_forms_are_value_identical(self, spark):
        """element_at and try_element_at window minima agree on every
        row class (short docs, empty docs, exact-k docs) under the
        non-ANSI session."""
        from cod_stats_spark.operators.dedup import winnow_sql

        df = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "tiny"),            # shorter than k -> single gram
                (3, ""),                # empty -> empty fingerprint set
                (4, "exactly8"),        # length == k
                (5, "aaaaaaaaaaaaaaaa"),  # repeated grams
            ],
            "id long, text string",
        )
        fast = df.select(
            "id", F.expr(winnow_sql("text", ansi=False)).alias("fp")
        ).collect()
        safe = df.select(
            "id", F.expr(winnow_sql("text", ansi=True)).alias("fp")
        ).collect()
        assert sorted((r["id"], r["fp"]) for r in fast) == sorted(
            (r["id"], r["fp"]) for r in safe
        )
