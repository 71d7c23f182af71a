"""Unigram-LM (SentencePiece-style) tokenizer
(operators/unigram_lm.py): hand-derived lattice math, Viterbi
reference parity, determinism, round-trip, save/load bit-identity,
and the distributed encode."""

from __future__ import annotations

import math

import pytest


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestLattice:
    def test_forward_backward_hand_math(self):
        """Vocab {a: 0.5, b: 0.25, ab: 0.25} over the word 'ab':
        Z = p(a)p(b) + p(ab) = 0.125 + 0.25 = 0.375; posterior of
        'ab' = 0.25/0.375 = 2/3, of 'a' (and 'b') = 1/3."""
        from cod_stats_spark.operators.unigram_lm import _forward_backward

        logp = {
            "a": math.log(0.5),
            "b": math.log(0.25),
            "ab": math.log(0.25),
        }
        z, post = _forward_backward("ab", logp, max_len=8)
        assert z == pytest.approx(math.log(0.375), abs=1e-12)
        got = dict(post)
        assert got["ab"] == pytest.approx(2 / 3, abs=1e-12)
        assert got["a"] == pytest.approx(1 / 3, abs=1e-12)
        assert got["b"] == pytest.approx(1 / 3, abs=1e-12)

    def test_viterbi_picks_best_segmentation(self):
        from cod_stats_spark.operators.unigram_lm import (
            UnigramVocab,
            viterbi_encode_word,
        )

        v = UnigramVocab(
            logp={
                "a": math.log(0.5),
                "b": math.log(0.25),
                "ab": math.log(0.25),
            }
        )
        # p(ab) = 0.25 > p(a)p(b) = 0.125 -> the single piece wins
        assert viterbi_encode_word("ab", v) == ["ab"]
        # unknown character falls back to a penalized single char
        assert viterbi_encode_word("axb", v) == ["a", "x", "b"]
        assert viterbi_encode_word("", v) == []

    def test_viterbi_tie_prefers_fewer_pieces(self):
        from cod_stats_spark.operators.unigram_lm import (
            UnigramVocab,
            viterbi_encode_word,
        )

        # p(ab) == p(a)p(b): same score — fewer pieces wins
        v = UnigramVocab(
            logp={
                "a": math.log(0.5),
                "b": math.log(0.5),
                "ab": math.log(0.25),
            }
        )
        assert viterbi_encode_word("ab", v) == ["ab"]


class TestLearn:
    def test_frequent_substring_becomes_a_piece(self):
        """A corpus dominated by one word must keep that word (and
        its mass) as a whole piece; every single char survives."""
        from cod_stats_spark.operators.unigram_lm import learn_unigram

        counts = [("hello", 50), ("help", 5), ("world", 5)]
        v = learn_unigram(counts, vocab_size=16, em_iters=2)
        assert "hello" in v.logp
        for ch in "helowrd p":
            if ch.strip():
                assert ch in v.logp, ch
        assert len(v.logp) <= 16 + 0  # chars counted inside the budget
        # the dominant word's piece carries more mass than char splits
        from cod_stats_spark.operators.unigram_lm import viterbi_encode_word

        assert viterbi_encode_word("hello", v) == ["hello"]

    def test_fit_is_deterministic(self):
        from cod_stats_spark.operators.unigram_lm import learn_unigram

        counts = [("banana", 10), ("bandana", 7), ("cabana", 5)]
        a = learn_unigram(counts, vocab_size=12)
        b = learn_unigram(counts, vocab_size=12)
        assert a.logp == b.logp

    def test_vocab_size_budget_holds(self):
        from cod_stats_spark.operators.unigram_lm import learn_unigram

        counts = [("abcdefgh", 3), ("abcdxyzw", 3), ("qrstuvab", 2)]
        v = learn_unigram(counts, vocab_size=20, seed_size=200)
        n_chars = len({c for w, _ in counts for c in w})
        assert len(v.logp) <= max(20, n_chars)

    def test_empty_counts_rejected(self):
        from cod_stats_spark.operators.unigram_lm import learn_unigram

        with pytest.raises(ValueError):
            learn_unigram([], vocab_size=8)

    def test_round_trip_on_seen_and_unseen_words(self):
        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            viterbi_encode_word,
        )

        counts = [("streaming", 9), ("dreaming", 6), ("steam", 4)]
        v = learn_unigram(counts, vocab_size=24)
        for w in ("streaming", "dreaming", "steam", "gamer", "qqzz"):
            assert "".join(viterbi_encode_word(w, v)) == w


class TestSparkSurface:
    def test_fit_encode_end_to_end(self, spark):
        from cod_stats_spark.operators.unigram_lm import (
            unigram_encode,
            unigram_fit,
            viterbi_encode_word,
        )

        docs = _docs(
            spark,
            [
                "the streaming engine keeps streaming data",
                "dreaming of streaming pipelines",
                "the engine deduplicates streaming corpora",
            ],
        )
        v = unigram_fit(docs, vocab_size=64, max_words=1000)
        out = {
            r["doc_id"]: (list(r["ulm_tokens"]), r["ulm_n_tokens"])
            for r in unigram_encode(docs, v).collect()
        }
        assert set(out) == {0, 1, 2}
        # distributed encode == reference Viterbi, word by word
        want0 = []
        for w in "the streaming engine keeps streaming data".split():
            want0.extend(viterbi_encode_word(w, v))
        assert out[0][0] == want0
        assert out[0][1] == len(want0)
        # round-trip through the dataframe surface
        assert "".join(out[1][0]) == "dreamingofstreamingpipelines"

    def test_save_load_bit_identity(self, spark, tmp_path):
        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            load_unigram_vocab,
            save_unigram_vocab,
        )

        v = learn_unigram(
            [("banana", 10), ("bandana", 7)], vocab_size=12
        )
        save_unigram_vocab(spark, v, str(tmp_path / "m"))
        w = load_unigram_vocab(spark, str(tmp_path / "m"))
        assert w.logp == v.logp
        assert w.max_piece_len == v.max_piece_len

    def test_torn_save_rejected(self, spark, tmp_path):
        import shutil

        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            load_unigram_vocab,
            save_unigram_vocab,
        )

        a = learn_unigram([("banana", 10)], vocab_size=8)
        b = learn_unigram([("banana", 10), ("bandana", 9)], vocab_size=16)
        save_unigram_vocab(spark, a, str(tmp_path / "a"))
        save_unigram_vocab(spark, b, str(tmp_path / "b"))
        shutil.rmtree(tmp_path / "b" / "meta")
        shutil.copytree(tmp_path / "a" / "meta", tmp_path / "b" / "meta")
        with pytest.raises(ValueError, match="torn"):
            load_unigram_vocab(spark, str(tmp_path / "b"))

    def test_same_count_tear_rejected(self, spark, tmp_path):
        """The common torn re-save: retrain with the SAME vocab_size
        (so the piece count matches) but different pieces or a raised
        max_piece_len. A count-only guard passes this silently and
        Viterbi then scans with stale meta; the value fingerprint
        catches it (r11 review)."""
        import shutil

        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            load_unigram_vocab,
            save_unigram_vocab,
        )

        a = learn_unigram([("banana", 10), ("cabana", 4)], vocab_size=12)
        b = learn_unigram([("bandana", 9), ("bananas", 5)], vocab_size=12)
        save_unigram_vocab(spark, a, str(tmp_path / "a"))
        save_unigram_vocab(spark, b, str(tmp_path / "b"))
        na = len(a.logp)
        nb = len(b.logp)
        if na != nb:  # force equal counts via direct construction
            from cod_stats_spark.operators.unigram_lm import UnigramVocab

            k = min(na, nb)
            a = UnigramVocab(
                logp=dict(sorted(a.logp.items())[:k]),
                max_piece_len=a.max_piece_len,
            )
            b = UnigramVocab(
                logp=dict(sorted(b.logp.items())[:k]),
                max_piece_len=b.max_piece_len,
            )
            save_unigram_vocab(spark, a, str(tmp_path / "a"))
            save_unigram_vocab(spark, b, str(tmp_path / "b"))
        shutil.rmtree(tmp_path / "b" / "meta")
        shutil.copytree(tmp_path / "a" / "meta", tmp_path / "b" / "meta")
        with pytest.raises(ValueError, match="torn"):
            load_unigram_vocab(spark, str(tmp_path / "b"))

    def test_legacy_count_only_meta_loads(self, spark, tmp_path):
        """A pre-fingerprint artifact (meta without 'vfp') still
        loads via the count check — intact old artifacts must not be
        stranded."""
        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            load_unigram_vocab,
            save_unigram_vocab,
        )

        v = learn_unigram([("banana", 10)], vocab_size=8)
        save_unigram_vocab(spark, v, str(tmp_path / "m"))
        # rewrite meta in the legacy shape (no vfp column)
        spark.createDataFrame(
            [(int(v.max_piece_len), len(v.logp))],
            "max_piece_len int, n_pieces int",
        ).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "m" / "meta")
        )
        w = load_unigram_vocab(spark, str(tmp_path / "m"))
        assert w.logp == v.logp

    def test_null_and_empty_text(self, spark):
        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            unigram_encode,
        )

        v = learn_unigram([("ok", 3)], vocab_size=8)
        docs = spark.createDataFrame(
            [(1, None), (2, ""), (3, "ok ok")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r["ulm_n_tokens"]
            for r in unigram_encode(docs, v).collect()
        }
        assert out == {1: 0, 2: 0, 3: 2}
