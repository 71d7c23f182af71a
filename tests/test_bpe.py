"""Trained BPE tokenization (operators/bpe.py): hand-derived merges,
reference-encoder parity, round-trip invariant, determinism across
partitionings, memoized distributed encode."""

from __future__ import annotations

import pyspark.sql.functions as F


class TestLearnBpe:
    def test_hand_derived_merges(self):
        """Classic worked example: corpus {low×5, lower×2, newest×6,
        widest×3} — the first merges must assemble 'est</w>' (9 occ)
        before anything rarer, exactly as in Sennrich et al. §3.2."""
        from cod_stats_spark.operators.bpe import learn_bpe

        counts = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
        merges = learn_bpe(counts, vocab_size=4)
        assert merges[0] == ("e", "s")          # 9 weighted occurrences
        assert merges[1] == ("es", "t")
        assert merges[2] == ("est", "</w>")
        # next best: 'l','o' in low/lower (7) beats 'n','e' (6)
        assert merges[3] == ("l", "o")

    def test_tie_breaks_lexicographic_and_stops_below_two(self):
        from cod_stats_spark.operators.bpe import learn_bpe

        # 'ab' and 'cd' both occur twice; the tie must go to ('a','b')
        merges = learn_bpe([("ab", 2), ("cd", 2)], vocab_size=1)
        assert merges == [("a", "b")]
        # singleton pairs never merge (cnt < 2 stop rule)
        assert learn_bpe([("xy", 1)], vocab_size=5) == []

    def test_encode_word_greedy_rank_order(self):
        from cod_stats_spark.operators.bpe import EOW, encode_word, learn_bpe

        counts = [("newest", 6), ("low", 5), ("widest", 3), ("lower", 2)]
        ranks = {p: i for i, p in enumerate(learn_bpe(counts, vocab_size=10))}
        toks = encode_word("newest", ranks)
        assert "".join(toks) == "newest" + EOW           # round trip
        assert toks[-1].endswith(EOW)
        # an unseen word falls back toward characters but still round-trips
        toks2 = encode_word("zzz", ranks)
        assert "".join(toks2) == "zzz" + EOW


class TestDistributedBpe:
    def _docs(self, spark):
        rows = [
            (i, " ".join(["newest", "low", "widest", "lower", f"rare{i % 7}"]))
            for i in range(200)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_encode_matches_reference_and_round_trips(self, spark):
        from cod_stats_spark.operators.bpe import (
            EOW,
            bpe_encode,
            encode_word,
            learn_bpe,
            word_counts,
        )

        docs = self._docs(spark)
        merges = learn_bpe(word_counts(docs), vocab_size=64)
        ranks = {p: i for i, p in enumerate(merges)}
        out = bpe_encode(docs, merges).collect()
        assert len(out) == 200
        for r in out:
            doc = [w for w in f"newest low widest lower rare{r['doc_id'] % 7}".split()]
            want = [t for w in doc for t in encode_word(w, ranks)]
            assert r["bpe_tokens"] == want
            assert r["bpe_n_tokens"] == len(want)
            assert "".join(r["bpe_tokens"]) == "".join(w + EOW for w in doc)

    def test_training_is_partitioning_invariant(self, spark):
        from cod_stats_spark.operators.bpe import learn_bpe, word_counts

        docs = self._docs(spark)
        a = learn_bpe(word_counts(docs), vocab_size=32)
        b = learn_bpe(word_counts(docs.repartition(13)), vocab_size=32)
        assert a == b and len(a) > 0

    def test_counts_cap_and_order(self, spark):
        from cod_stats_spark.operators.bpe import word_counts

        docs = self._docs(spark)
        top = word_counts(docs, max_words=3)
        assert len(top) == 3
        # 200 occurrences each for the four common words; cap keeps the
        # lexicographically first three of the tied head
        assert [w for w, _ in top] == ["low", "lower", "newest"]
        assert all(c == 200 for _, c in top)

    def test_vocabulary_round_trips_through_parquet(self, spark, tmp_path):
        from cod_stats_spark.operators.bpe import (
            bpe_encode,
            learn_bpe,
            load_merges,
            save_merges,
            word_counts,
        )

        docs = self._docs(spark)
        merges = learn_bpe(word_counts(docs), vocab_size=32)
        path = str(tmp_path / "vocab")
        save_merges(spark, merges, path)
        restored = load_merges(spark, path)
        assert restored == merges                      # order IS the model
        a = sorted(map(tuple, bpe_encode(docs, merges).collect()))
        b = sorted(map(tuple, bpe_encode(docs, restored).collect()))
        assert a == b

    def test_empty_and_null_text(self, spark):
        from cod_stats_spark.operators.bpe import bpe_encode, learn_bpe

        docs = spark.createDataFrame(
            [(0, ""), (1, None), (2, "ab ab")], "doc_id long, text string"
        )
        merges = learn_bpe([("ab", 2)], vocab_size=2)
        rows = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
        assert rows[0]["bpe_tokens"] == [] and rows[0]["bpe_n_tokens"] == 0
        assert rows[1]["bpe_tokens"] == [] and rows[1]["bpe_n_tokens"] == 0
        assert rows[2]["bpe_n_tokens"] == len(rows[2]["bpe_tokens"]) > 0


class TestCacheBounds:
    def test_high_cardinality_words_encode_correctly_past_cache_policy(self, spark):
        """r8 ADVICE: the per-task word cache must stay bounded — long
        near-unique words (ids/hashes/URLs) are not cached at all, and
        the dict resets at its cap. Behavioral check: a corpus of
        distinct >32-char words (cache never populated) and repeated
        short words (cache hit path) both encode identically to the
        uncached per-word function."""
        from cod_stats_spark.operators.bpe import (
            bpe_encode,
            encode_word,
            learn_bpe,
        )

        merges = learn_bpe([("ab", 5), ("abab", 3)], vocab_size=4)
        ranks = {p: i for i, p in enumerate(merges)}
        long_words = ["ab" * 20 + f"x{i:030d}" for i in range(50)]
        docs = spark.createDataFrame(
            [(0, " ".join(long_words)), (1, "ab ab abab ab")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in bpe_encode(docs, merges).collect()}
        want0 = [t for w in long_words for t in encode_word(w, ranks)]
        want1 = [t for w in "ab ab abab ab".split() for t in encode_word(w, ranks)]
        assert rows[0]["bpe_tokens"] == want0
        assert rows[1]["bpe_tokens"] == want1
