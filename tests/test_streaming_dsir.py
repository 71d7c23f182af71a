"""Incremental DSIR (streaming/dsir.py): sequential batch updates
refit to BIT-IDENTICAL micro-units vs a from-scratch fit over the
union (integer counts + the shared λ6 formula), replays recompute
from their original snapshot without double-adding, and the _DSIR
marker freezes the feature space per state dir."""

from __future__ import annotations

import pytest


def _frames(spark):
    sci = ("the experiment measured the electron energy spectrum while "
           "the detector recorded the particle decay")
    spam = ("click here winner free prize casino jackpot buy now limited "
            "offer click click prize")
    target = spark.createDataFrame(
        [(100 + i, sci + f" run {i}") for i in range(4)],
        "doc_id long, text string",
    )
    b1 = spark.createDataFrame(
        [(1, sci + " alpha"), (2, spam + " beta")],
        "doc_id long, text string",
    )
    b2 = spark.createDataFrame(
        [(3, sci + " gamma"), (4, spam + " delta"), (5, sci + " epsilon")],
        "doc_id long, text string",
    )
    return target, b1, b2


_KW = dict(dim=256, ngrams=2)


def test_append_equals_rebuild_bit_identical(spark, tmp_path):
    from cod_stats_spark.operators.dsir import dsir_fit
    from cod_stats_spark.streaming.dsir import dsir_init_state, dsir_update

    target, b1, b2 = _frames(spark)
    state = str(tmp_path / "dsir")
    dsir_init_state(spark, target, state, **_KW)
    dsir_update(spark, b1, state, batch_id=1, **_KW)
    inc = dsir_update(spark, b2, state, batch_id=2, **_KW)
    full = dsir_fit(target, b1.unionByName(b2), **_KW)
    assert inc.log_ratio6 == full.log_ratio6


def test_replay_recomputes_without_double_add(spark, tmp_path):
    from cod_stats_spark.streaming.dsir import (
        dsir_init_state,
        dsir_model_from_state,
        dsir_update,
    )

    target, b1, b2 = _frames(spark)
    state = str(tmp_path / "dsir")
    dsir_init_state(spark, target, state, **_KW)
    m1 = dsir_update(spark, b1, state, batch_id=1, **_KW)
    m2 = dsir_update(spark, b2, state, batch_id=2, **_KW)
    # at-least-once replay of batch 1: same model as the original
    # call, and the live state still reflects BOTH batches
    r1 = dsir_update(spark, b1, state, batch_id=1, **_KW)
    assert r1.log_ratio6 == m1.log_ratio6
    assert dsir_model_from_state(spark, state, **_KW).log_ratio6 == (
        m2.log_ratio6
    )


def test_prune_bounds_raw_versions_and_replay_window(spark, tmp_path):
    """r15: prune_keep_last bounds the raw-count snapshot set; the
    in-window replay (the newest batch) still refits identically, a
    beyond-window replay fails LOUDLY on the missing snapshot, and
    the frozen target/ state is untouched."""
    import os

    from cod_stats_spark.streaming.dsir import dsir_init_state, dsir_update

    target, b1, b2 = _frames(spark)
    b3 = spark.createDataFrame(
        [(9, "the detector recorded another electron zeta")],
        "doc_id long, text string",
    )
    state = str(tmp_path / "dsir")
    dsir_init_state(spark, target, state, **_KW)
    dsir_update(spark, b1, state, batch_id=1, prune_keep_last=2, **_KW)
    dsir_update(spark, b2, state, batch_id=2, prune_keep_last=2, **_KW)
    m3 = dsir_update(spark, b3, state, batch_id=3, prune_keep_last=2, **_KW)
    vdirs = sorted(
        n for n in os.listdir(os.path.join(state, "raw"))
        if n.startswith("v=")
    )
    assert vdirs == ["v=1", "v=2"]  # newest two of v0..v2
    # in-window replay: batch 3 committed v=2 (kept) — identical refit
    r3 = dsir_update(spark, b3, state, batch_id=3, prune_keep_last=2, **_KW)
    assert r3.log_ratio6 == m3.log_ratio6
    # beyond-window replay: batch 1's snapshot (v=0) is pruned — loud
    with pytest.raises(Exception, match="v=0"):
        dsir_update(spark, b1, state, batch_id=1, **_KW)
    # the frozen target state still has its single version
    assert sorted(
        n for n in os.listdir(os.path.join(state, "target"))
        if n.startswith("v=")
    ) == ["v=0"]


def test_marker_freezes_parameters(spark, tmp_path):
    from cod_stats_spark.streaming.dsir import (
        dsir_init_state,
        dsir_update,
    )

    target, b1, _ = _frames(spark)
    state = str(tmp_path / "dsir")
    dsir_init_state(spark, target, state, **_KW)
    with pytest.raises(ValueError, match="frozen marker"):
        dsir_update(spark, b1, state, batch_id=1, dim=512, ngrams=2)
    with pytest.raises(ValueError, match="already initialized"):
        dsir_init_state(spark, target, state, **_KW)
    with pytest.raises(ValueError, match="uninitialized"):
        dsir_update(spark, b1, str(tmp_path / "other"), batch_id=1, **_KW)


def test_empty_target_refused_at_init(spark, tmp_path):
    from cod_stats_spark.streaming.dsir import dsir_init_state

    empty = spark.createDataFrame([], "doc_id long, text string")
    with pytest.raises(ValueError, match="no features"):
        dsir_init_state(spark, empty, str(tmp_path / "d"), **_KW)
