"""Parity pins for the r16 optimization round: every rewritten
internal must produce BIT-IDENTICAL results to the shape it replaced
(the round's contract — same answers, fewer passes/joins/allocations).

- ngram_lm_fit_multi (one GROUPING SETS pass) vs per-order ngram_lm_fit
- arpa_lm_score literal-map path vs the join path (with and without
  <unk>, plus the explicit-flag error contract)
- dsir_fit_tagged (one fused pass) vs the two-pass dsir_fit
- _phash_group (vectorized) vs _phash_one (per-row, arbitrary precision)
- semantic_dedup pair_method='arrow' (vectorized per-cluster pair scan)
  vs pair_method='expr' (the pure-Column self-join), incl. the
  left-fold bit pattern, the rounding-boundary margin, and the
  low-threshold fallback
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

DOCS = [
    (1, "the cat sat on the mat and the cat sat again"),
    (2, "a dog ran over the hill while the cat sat"),
    (3, "the the the the the"),
    (4, "one"),
    (5, ""),
    (6, "completely unseen tokens here xyzzy plugh"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_ngram_lm_fit_multi_matches_per_order(spark, docs_df):
    from cod_stats_spark.operators.lm_score import (
        ngram_lm_fit,
        ngram_lm_fit_multi,
    )

    multi = ngram_lm_fit_multi(docs_df, 5)
    for k in range(1, 6):
        single = ngram_lm_fit(docs_df, k)
        assert (
            single.exceptAll(multi[k - 1]).count()
            + multi[k - 1].exceptAll(single).count()
            == 0
        ), f"order-{k} counts diverge from the per-order fit"


def test_kn_ngram_score_same_under_multi_fit(spark, docs_df):
    from cod_stats_spark.operators.lm_score import (
        kn_ngram_score,
        ngram_lm_fit,
        ngram_lm_fit_multi,
    )

    a = kn_ngram_score(docs_df, [ngram_lm_fit(docs_df, k) for k in (1, 2, 3)])
    b = kn_ngram_score(docs_df, ngram_lm_fit_multi(docs_df, 3))
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def _tiny_arpa(spark, with_unk: bool):
    from cod_stats_spark.operators.lm_score import ArpaModel

    rows = {
        1: [
            ("the", -0.5, -0.125),
            ("cat", -0.75, -0.25),
            ("sat", -1.0, None),
        ],
        2: [
            ("the", "cat", -0.25, -0.0625),
            ("cat", "sat", -0.375, None),
        ],
        3: [("the", "cat", "sat", -0.125, None)],
    }
    if with_unk:
        rows[1].append(("<unk>", -1.5, -0.5))
        rows[2].append(("<unk>", "the", -0.4375, -0.03125))
    grams = {}
    for k, rs in rows.items():
        cols = ", ".join(
            [f"w{i} string" for i in range(1, k + 1)]
            + ["log10p double", "backoff double"]
        )
        grams[k] = spark.createDataFrame(rs, cols)
    return ArpaModel(grams, {k: len(v) for k, v in rows.items()})


@pytest.mark.parametrize("with_unk", [True, False])
def test_arpa_expr_path_matches_join_path(spark, docs_df, with_unk):
    from cod_stats_spark.operators.lm_score import arpa_lm_score

    model = _tiny_arpa(spark, with_unk)
    kw = {} if with_unk else {"oov_log10p": -5.0}
    a = arpa_lm_score(docs_df, model, as_expression=False, **kw)
    b = arpa_lm_score(docs_df, model, as_expression=True, **kw)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_arpa_expr_path_reads_local_rows_without_jobs(spark, docs_df):
    # a model whose grams would MISMATCH its local_rows proves the
    # shortcut actually reads the driver-side rows (the local_rows
    # contract: caller guarantees they match; here we exploit the
    # mismatch purely as a did-it-read-them probe)
    from cod_stats_spark.operators.lm_score import ArpaModel, arpa_lm_score

    base = _tiny_arpa(spark, True)
    local = {
        1: [("the", -0.5, -0.125), ("<unk>", -1.5, -0.5)],
        2: [("the", "cat", -0.25, -0.0625)],
        3: [("the", "cat", "sat", -0.125)],
    }
    m = ArpaModel(base.grams, {1: 2, 2: 1, 3: 1}, local_rows=local)
    ref_grams = {}
    for k, rs in local.items():
        cols = ", ".join(
            [f"w{i} string" for i in range(1, k + 1)]
            + ["log10p double", "backoff double"]
        )
        padded = [r if len(r) == k + 2 else r + (None,) for r in rs]
        ref_grams[k] = spark.createDataFrame(padded, cols)
    ref = ArpaModel(ref_grams, {1: 2, 2: 1, 3: 1})
    a = arpa_lm_score(docs_df, m, as_expression=True)
    b = arpa_lm_score(docs_df, ref, as_expression=False)
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_arpa_as_expression_true_raises_past_cap(spark, docs_df, monkeypatch):
    import cod_stats_spark.operators.lm_score as L

    model = _tiny_arpa(spark, True)
    monkeypatch.setattr(L, "_ARPA_EXPR_ROW_CAP", 2)
    with pytest.raises(ValueError, match="as_expression=False"):
        L.arpa_lm_score(docs_df, model, as_expression=True)
    # auto mode falls back to the join path silently (same scores)
    out = L.arpa_lm_score(docs_df, model)
    ref = L.arpa_lm_score(docs_df, model, as_expression=False)
    assert out.exceptAll(ref).count() + ref.exceptAll(out).count() == 0


def test_dsir_fit_tagged_matches_two_pass(spark):
    from cod_stats_spark.operators.dsir import dsir_fit, dsir_fit_tagged

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "a dog ran over the hill"),
        (3, "de", "der hund lief den berg hinauf"),
        (4, None, "lang is null here"),
        (5, "en", "the cat sat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    cond = F.col("lang") == "en"
    m1 = dsir_fit(docs.where(cond), docs, dim=256, ngrams=2)
    m2 = dsir_fit_tagged(docs, cond, dim=256, ngrams=2)
    assert m1.log_ratio6 == m2.log_ratio6


# ---------------------------------------------------------------
# semantic_dedup pair_method='arrow' vs 'expr' (the r16 pair scan)
# ---------------------------------------------------------------

_SEM_SCHEMA = "vec_id long, embedding array<double>"


def _sem_parity(spark, rows, centroids, threshold):
    from cod_stats_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(rows, _SEM_SCHEMA)
    e = semantic_dedup(
        df, "embedding", "vec_id", centroids,
        threshold=threshold, pair_method="expr",
    )
    a = semantic_dedup(
        df, "embedding", "vec_id", centroids,
        threshold=threshold, pair_method="arrow",
    )
    assert e.exceptAll(a).count() + a.exceptAll(e).count() == 0
    return {r["vec_id"] for r in e.collect()}


def test_semantic_pair_arrow_rounding_boundary(spark):
    """The margin contract at the round-half-up cliff: an exact pair
    cosine of ~0.9499996 ROUNDS to the 0.95 threshold (must drop a
    side in BOTH paths), ~0.9499992 rounds below it (both survive) —
    each pair isolated in its own cluster so no third vector pollutes
    the boundary."""
    import math

    up, down = 0.9499996, 0.9499992
    rows = [
        (1, [1.0, 0.0]),
        (2, [up, math.sqrt(1.0 - up * up)]),
        (3, [0.0, 1.0]),
        (4, [math.sqrt(1.0 - down * down), down]),
    ]
    survivors = _sem_parity(
        spark, rows, [[1.0, 0.0], [0.0, 1.0]], 0.95
    )
    assert len(survivors & {1, 2}) == 1, "rounds-up pair must drop a side"
    assert {3, 4} <= survivors, "rounds-down pair must keep both"


def test_semantic_pair_arrow_degenerate_rows(spark):
    """Null ids, zero vectors, null elements, cross-length vectors,
    and an exact-tie twin pair — every row class the scanner prunes
    must resolve exactly as the self-join resolves it."""
    rows = [
        (1, [1.0, 0.0]),
        (None, [1.0, 1e-07]),      # near-dup of 1 but unpairable (the
                                   # a._id < b._id condition is null) —
                                   # must NOT drop 1; itself excluded
                                   # from output by the final id join
        (2, [0.0, 0.0]),           # zero norm → cosine guard → 0.0
        (3, [1.0, None]),          # null element → null dot → no pair
        (4, [1.0, 0.0, 0.0]),      # cross-length vs every 2-d row
        (6, [0.8, 0.6]),           # exact twins: tie on centroid
        (7, [0.8, 0.6]),           # cosine → worse = larger id
    ]
    survivors = _sem_parity(
        spark, rows, [[1.0, 0.0], [0.0, 1.0]], 0.95
    )
    assert 1 in survivors and None not in survivors
    assert 6 in survivors and 7 not in survivors


def test_semantic_pair_scan_dot_is_the_left_fold(spark):
    """The scanner's emitted _dot must be the LEFT-FOLD bit pattern
    (order-sensitive: [1e16, 1, -1e16, 1]·[1,1,1,1] folds to exactly
    1.0 — the +1 absorbed at 1e16, recovered after cancellation),
    identical to what the interpreted aggregate/zip_with expression
    produces."""
    import pandas as pd

    from cod_stats_spark.operators.semantic import _pair_scan_fn
    from cod_stats_spark.operators.similarity import dot

    va, vb = [1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0]
    spark_dot = (
        spark.range(1)
        .select(
            dot(
                F.array(*[F.lit(x) for x in va]),
                F.array(*[F.lit(x) for x in vb]),
            ).alias("d")
        )
        .collect()[0]["d"]
    )
    assert spark_dot == 1.0
    pdf = pd.DataFrame(
        {
            "_id": [10, 11],
            "_n": [1.0, 1.0],
            "centroid_cosine": [0.5, 0.25],
            "_v": [va, vb],
        }
    )
    out = _pair_scan_fn(0.5)(pdf)
    assert len(out) == 1 and out["_dot"].iloc[0] == spark_dot


def test_semantic_pair_arrow_threshold_floor_falls_back(spark):
    """Thresholds at/below _ARROW_PAIR_MIN_T cannot use the Python
    prefilter (guarded zero-cosine pairs become droppable) — the
    arrow request must silently take the expression self-join."""
    from cod_stats_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], _SEM_SCHEMA
    )
    cents = [[1.0, 0.0], [0.0, 1.0]]
    lo = semantic_dedup(
        df, "embedding", "vec_id", cents,
        threshold=1e-6, pair_method="arrow",
    )
    plan = lo._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan
    hi = semantic_dedup(
        df, "embedding", "vec_id", cents,
        threshold=0.95, pair_method="arrow",
    )
    plan = hi._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    with pytest.raises(ValueError, match="pair_method"):
        semantic_dedup(df, "embedding", "vec_id", cents, pair_method="gemm")


def test_phash_group_matches_per_row():
    import numpy as np

    from cod_stats_spark.operators.multimodal import (
        _phash_group,
        _phash_one,
    )

    rng = np.random.default_rng(42)
    for w, h in ((16, 16), (16, 7), (5, 16), (3, 3)):
        stack = rng.integers(0, 256, size=(8, h, w)).astype(np.int64)
        ga, gd = _phash_group(stack, 8)
        for i in range(stack.shape[0]):
            raw = (
                f"P5\n{w} {h}\n255\n".encode()
                + stack[i].astype(np.uint8).tobytes()
            )
            pw, ph, a, d = _phash_one(raw, 8)
            assert (pw, ph) == (w, h)
            assert a == int(ga[i]) and d == int(gd[i]), (w, h, i)
