"""Operators must degrade to empty output (not crash) on empty input.

The driver regenerates testdata between rounds and a real pipeline
sees empty partitions/days constantly; an operator that assumes ≥1
row (a .first() scalar, an unguarded max) fails the whole job.
"""

from __future__ import annotations

import pytest


def _empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


def _empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


class TestEmptyInputs:
    def test_dedup_family_empty(self, spark):
        from cod_stats_spark.operators.dedup import (
            exact_dedup,
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
            simhash_near_pairs,
        )

        docs = _empty_docs(spark)
        assert exact_dedup(docs, "text", "doc_id").count() == 0
        cands = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=8, bands=4)
        assert cands.count() == 0
        assert simhash_near_pairs(docs, "text", "doc_id").count() == 0
        assert ngram_jaccard_pairs(docs, "text", "doc_id", cands).count() == 0

    def test_windows_and_sampling_empty(self, spark):
        from cod_stats_spark.operators.rolling import rolling_frames, rolling_time_frames
        from cod_stats_spark.operators.sampling import stratified_sample, weighted_sample
        from cod_stats_spark.operators.sessionize import sessionize

        ev = _empty_events(spark)
        assert sessionize(ev, "ts", ["user_id"], gap_seconds=60).count() == 0
        assert (
            rolling_frames(ev, ["user_id"], ["ts"], [("value", "sum")], preceding=3).count()
            == 0
        )
        assert (
            rolling_time_frames(ev, ["user_id"], "ts", [("value", "sum")], 3600).count()
            == 0
        )
        assert weighted_sample(ev, "event_id", "value", n=10).count() == 0
        assert (
            stratified_sample(ev, "event_id", "event_type", {"view": 0.5}).count() == 0
        )

    def test_retrieval_and_components_empty(self, spark):
        from cod_stats_spark.operators.components import connected_components
        from cod_stats_spark.operators.retrieval import bm25_rank_multi, bm25_rank_topk

        docs = _empty_docs(spark)
        assert bm25_rank_topk(docs, ["hash"], k=5).count() == 0
        assert bm25_rank_multi(docs, {"q": ["hash"]}, k=5).count() == 0
        edges = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(edges).count() == 0

    def test_profiling_and_skew_empty(self, spark):
        from cod_stats_spark.operators.profiling import profile_table
        from cod_stats_spark.operators.skew import diagnose_skew, salted_aggregate

        ev = _empty_events(spark)
        prof = {r["column"]: r for r in profile_table(ev).collect()}
        assert prof["value"]["n_rows"] == 0
        summary, top = diagnose_skew(ev, ["user_id"])
        assert summary.first()["n_keys"] == 0 and top.count() == 0
        assert (
            salted_aggregate(ev, ["event_type"], [("value", "sum")], "event_id").count()
            == 0
        )

    def test_similarity_empty(self, spark):
        from cod_stats_spark.operators.similarity import (
            brute_force_topk,
            knn_join,
            knn_join_gemm,
        )

        emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
        q = [1.0, 0.0]
        assert brute_force_topk(emb, "embedding", "vec_id", q, k=3).count() == 0
        assert knn_join(emb, emb, "embedding", "vec_id", k=3).count() == 0
        assert knn_join_gemm(emb, emb, "embedding", "vec_id", k=3).count() == 0

    def test_kmeans_empty_raises_cleanly(self, spark):
        from cod_stats_spark.operators.clustering import kmeans_fit

        emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
        with pytest.raises(ValueError, match="empty input"):
            kmeans_fit(emb, "embedding", "vec_id", k=2)


def test_weighted_sample_drops_nonpositive_weights(spark):
    from cod_stats_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(1, 0.0), (2, -3.0), (3, 1.0), (4, 2.0)], "k long, w double"
    )
    got = {r["k"] for r in weighted_sample(df, "k", "w", n=10).collect()}
    assert got == {3, 4}


def test_r7_ops_empty_inputs(spark):
    """assign_splits / mixture_sample / PQ encode+ADC degrade to empty
    or raise the documented error on empty frames."""
    import numpy as np
    import pytest

    from cod_stats_spark.operators.quantization import (
        pq_encode,
        pq_topk,
        train_pq,
    )
    from cod_stats_spark.operators.sampling import assign_splits, mixture_sample

    docs = _empty_docs(spark)
    assert assign_splits(docs, "doc_id").count() == 0
    assert (
        mixture_sample(docs, "doc_id", "text", {"en": 1.0}).count() == 0
    )
    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="no non-null"):
        train_pq(emb, "embedding", "vec_id", m=2, k=2)
    books = np.zeros((2, 2, 2))
    enc = pq_encode(emb, "embedding", books)
    assert enc.count() == 0
    assert pq_topk(enc, "pq_code", "vec_id", [0.0] * 4, books, k=3).count() == 0


def test_r8_ops_empty_inputs(spark, tmp_path):
    """Winnowing family and the incremental curation funnel degrade to
    empty outputs (not errors) on empty frames."""
    from cod_stats_spark.operators.dedup import (
        winnow_contamination_pairs,
        winnow_fingerprints,
        winnow_overlap_pairs,
    )
    from cod_stats_spark.plans.curation import curate_corpus_append

    docs = _empty_docs(spark)
    assert winnow_fingerprints(docs, "text", "doc_id").count() == 0
    assert winnow_overlap_pairs(docs, "text", "doc_id").count() == 0
    some = spark.createDataFrame(
        [(1, "a real document with words")], "doc_id long, text string"
    )
    assert winnow_contamination_pairs(some, docs, "text", "doc_id").count() == 0
    assert winnow_contamination_pairs(docs, some, "text", "doc_id").count() == 0
    # empty first batch leaves a consistent (empty) state; a following
    # real batch still curates normally against it
    state = str(tmp_path / "state")
    _, s0 = curate_corpus_append(
        spark, docs, None, state, batch_id=1, min_quality=0.0, token_budget=64
    )
    assert s0["after_dedup"] == 0 and s0["shards"] == 0
    _, s1 = curate_corpus_append(
        spark, some, None, state, batch_id=2, min_quality=0.0, token_budget=64
    )
    assert s1["after_dedup"] == 1 and s1["shards"] == 1


def test_r8b_sketch_rollup_lm_bpe_empty(spark):
    """The second r8 wave: sketch states, rollup state, LM scoring,
    and BPE all degrade cleanly when a batch is empty."""
    import pytest as _pytest

    from cod_stats_spark.operators.bpe import bpe_encode, learn_bpe, word_counts
    from cod_stats_spark.operators.lm_score import unigram_lm_fit, unigram_lm_score
    from cod_stats_spark.operators.rollup_state import rollup_merge, rollup_partial
    from cod_stats_spark.operators.sketches import (
        cms_partial,
        cms_query,
        hist_partial,
        hist_quantile,
        hll_estimate,
        hll_partial,
    )

    ev = _empty_events(spark)
    docs = _empty_docs(spark)
    # sketches: empty state, and estimates over empty state are empty
    assert hll_partial(ev, "user_id", ["event_type"], p=6).count() == 0
    assert (
        hll_estimate(
            hll_partial(ev, "user_id", ["event_type"], p=6), ["event_type"], p=6
        ).count()
        == 0
    )
    empty_cms = cms_partial(ev, "user_id", ["event_type"], depth=2, width=32)
    assert empty_cms.count() == 0
    probe = spark.createDataFrame([("click", 1)], "event_type string, user_id int")
    # probing an EMPTY state returns the zero estimate, not an error
    assert (
        cms_query(empty_cms, probe, ["event_type"], "user_id", depth=2, width=32)
        .first()["est_count"]
        == 0
    )
    assert hist_partial(ev, "value", ["event_type"], 0.0, 1.0, 4).count() == 0
    assert (
        hist_quantile(
            hist_partial(ev, "value", ["event_type"], 0.0, 1.0, 4),
            ["event_type"], 0.5, 0.0, 1.0, 4,
        ).count()
        == 0
    )
    # rollup state: empty partials merge away cleanly
    metrics = {"n": ("count", None), "s": ("sum", "value")}
    st = rollup_partial(ev, ["event_type"], metrics)
    assert st.count() == 0
    assert rollup_merge(["event_type"], metrics, st, st).count() == 0
    # LM: empty corpus yields an empty model; scoring with it raises the
    # documented guard, and scoring an empty corpus with a REAL model
    # yields zero rows
    assert unigram_lm_fit(docs).count() == 0
    with _pytest.raises(ValueError, match="empty model"):
        unigram_lm_score(docs, unigram_lm_fit(docs))
    some = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert unigram_lm_score(docs, unigram_lm_fit(some)).count() == 0
    # BPE: empty corpus -> no words, no merges; encode of empty is empty
    wc = word_counts(docs)
    assert wc == []
    assert learn_bpe(wc) == []
    assert bpe_encode(docs, []).count() == 0


def test_r10_ops_empty_inputs(spark, tmp_path):
    """r10 surface: classifier scoring, the model-gated funnel, and
    the OLAP arms must degrade to empty output on empty input; fit on
    an empty corpus raises its documented guard."""
    import pytest as _pytest

    from cod_stats_spark.operators.quality_classifier import (
        QualityClassifierModel,
        quality_classifier_fit,
        quality_classifier_score,
    )

    docs = _empty_docs(spark)
    model = QualityClassifierModel(dim=16)
    assert quality_classifier_score(docs, model).count() == 0
    assert quality_classifier_score(
        docs, model, as_expression=False
    ).count() == 0
    with _pytest.raises(ValueError, match="no documents"):
        quality_classifier_fit(
            spark.createDataFrame([], "doc_id long, label int, text string"),
            dim=16,
        )

    # incremental funnel with substring + model gates on: an empty
    # batch is a no-op at every stage (and must not corrupt state)
    from cod_stats_spark.plans.curation import curate_corpus_append

    _, stats = curate_corpus_append(
        spark,
        docs,
        None,
        str(tmp_path / "state"),
        batch_id=1,
        substring_n=8,
        qc_model=model,
    )
    assert stats["after_model_gate"] == 0
    assert stats["after_substring"] == 0
    assert stats["shards"] == 0

    # timeseries hyperfunctions over an empty event stream
    from cod_stats_spark.operators.timeseries_agg import (
        ohlc_downsample,
        time_weighted_avg,
    )

    ev = _empty_events(spark)
    assert ohlc_downsample(ev, "ts", ["user_id"], "value", 60).count() == 0
    assert time_weighted_avg(ev, "ts", ["user_id"], "value", 60).count() == 0

    from cod_stats_spark.operators.anomaly import flag_anomalies

    assert flag_anomalies(ev, "value", ["user_id"], "ts", 60).count() == 0


def test_r11_ops_empty_inputs(spark, tmp_path):
    """The r11 surface: tokenizer-to-windows final mile, upsampling,
    URL curation, and the state bootstraps all degrade to empty
    outputs (or refuse with a clear message) on empty frames."""
    import pytest as _pytest

    from cod_stats_spark.functions.url import domain_gate, domain_stats
    from cod_stats_spark.operators.packing import (
        encode_ids,
        training_sequences,
    )
    from cod_stats_spark.operators.sampling import epoch_expand
    from cod_stats_spark.operators.unigram_lm import (
        unigram_encode,
        unigram_fit,
    )
    from cod_stats_spark.streaming import (
        build_dedup_index,
        build_semantic_state,
        semantic_batch_against_corpus,
    )

    docs = _empty_docs(spark)

    # unigram tokenizer: fitting on an empty corpus is a clear error
    # (no counts to train on, the BPE precedent); encoding an empty
    # frame with a real vocab is an empty frame
    with _pytest.raises(ValueError):
        unigram_fit(docs, vocab_size=16)
    from cod_stats_spark.operators.unigram_lm import learn_unigram

    v = learn_unigram([("banana", 3)], vocab_size=8)
    assert unigram_encode(docs, v, "text").count() == 0

    # training windows + id mapping over empty/all-empty-token frames
    toks = spark.createDataFrame([], "doc_id long, toks array<int>")
    assert training_sequences(toks, "toks", seq_len=8).count() == 0
    assert training_sequences(
        toks, "toks", seq_len=8, drop_last=False, pad_value=0,
        with_spans=True,
    ).count() == 0
    pieces = spark.createDataFrame([], "doc_id long, pieces array<string>")
    assert encode_ids(pieces, "pieces", ["a", "b"]).count() == 0

    # upsampling an empty frame is an empty frame (with the columns)
    up = epoch_expand(docs, "doc_id", "lang", {"en": 2.5})
    assert up.count() == 0
    assert "epoch" in up.columns and "epoch_key" in up.columns

    # URL curation over empty docs
    url_docs = spark.createDataFrame([], "doc_id long, url string, text string")
    assert domain_gate(url_docs, "url", blocklist=["x.com"]).count() == 0
    assert domain_stats(url_docs).count() == 0

    # bootstraps from an EMPTY corpus: a consistent empty state that
    # a later real batch ingests against normally
    cdir = str(tmp_path / "corpus")
    docs.select("doc_id", "text").write.parquet(cdir)
    counts = build_dedup_index(
        spark, cdir, "text", "doc_id", str(tmp_path / "idx"),
        fp_buckets=4, band_buckets=4,
    )
    assert counts == {"fingerprints": 0, "bands": 0}
    from cod_stats_spark.streaming.dedup import dedup_batch_against_corpus

    kept = dedup_batch_against_corpus(
        spark,
        spark.createDataFrame(
            [(1, "a genuinely real document with words in it")],
            "doc_id long, text string",
        ),
        "text", "doc_id", cdir + "2", str(tmp_path / "idx"),
        threshold=0.6, batch_id=0, fp_buckets=4, band_buckets=4,
    )
    assert kept.count() == 1

    emb = spark.createDataFrame([], "doc_id long, embedding array<double>")
    n = build_semantic_state(
        spark, emb, str(tmp_path / "sem"), [[1.0, 0.0]]
    )
    assert n == 0
    out = semantic_batch_against_corpus(
        spark,
        spark.createDataFrame(
            [(7, [1.0, 0.0])], "doc_id long, embedding array<double>"
        ),
        str(tmp_path / "sem"), [[1.0, 0.0]], batch_id=0,
    )
    assert out.count() == 1


def test_r12_ops_empty_inputs(spark, tmp_path):
    """r12 surface: HTML extraction, the html funnel stage in both
    postures, the incremental shard compactor with no fragments, the
    segmented tape, a FIRST tape batch that is empty, the PSL loader
    on empty/comment-only input, and empty-merge interop."""
    from cod_stats_spark.functions.html import extract_text
    from cod_stats_spark.functions.url import (
        load_public_suffixes,
        registered_domain,
    )
    from cod_stats_spark.operators.packing import training_sequences
    from cod_stats_spark.operators.tokenizer_io import (
        bpe_to_tokenizer_json,
        tokenizer_json_to_bpe,
    )
    from cod_stats_spark.plans.curation import (
        compact_curated_shards,
        curate_corpus,
        curate_corpus_append,
    )
    from cod_stats_spark.streaming.packing import (
        finalize_training_tape,
        training_sequences_append,
    )

    e = spark.createDataFrame([], "doc_id long, text string")
    assert e.select(extract_text("text").alias("ct")).count() == 0

    _, stats = curate_corpus(
        e, None, str(tmp_path / "o"), html_input=True, token_budget=32
    )
    assert stats["input"] == 0 and stats["after_html"] == 0

    state = str(tmp_path / "s")
    _, s2 = curate_corpus_append(
        spark, e, None, state, batch_id=1, html_input=True,
        token_budget=32,
    )
    assert s2["after_html"] == 0
    assert compact_curated_shards(spark, state) is None

    e2 = spark.createDataFrame(
        [], "doc_id long, toks array<string>, batch int"
    )
    assert (
        training_sequences(e2, "toks", seq_len=4, segment_col="batch")
        .count() == 0
    )

    tstate = str(tmp_path / "t")
    assert (
        training_sequences_append(
            spark, e2.drop("batch"), "toks", tstate, batch_id=1, seq_len=4
        ).count() == 0
    )
    assert finalize_training_tape(spark, tstate) is None
    out = training_sequences_append(
        spark,
        spark.createDataFrame(
            [(1, ["a", "b", "c", "d", "e"])],
            "doc_id long, toks array<string>",
        ),
        "toks", tstate, batch_id=2, seq_len=4,
    )
    assert out.count() == 1

    assert load_public_suffixes("") == ([], [])
    assert load_public_suffixes("// only comments\n") == ([], [])
    d = spark.createDataFrame([(1, "a.b.co.il")], "i long, h string")
    assert (
        d.select(registered_domain("h", [], []).alias("d")).first()["d"]
        == "co.il"
    )

    assert tokenizer_json_to_bpe(
        bpe_to_tokenizer_json([], alphabet={"a", "b"})
    ) == []
