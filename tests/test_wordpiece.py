"""WordPiece tokenizer (operators/wordpiece.py): training follows the
published likelihood-gain score count(ab)/(count(a)·count(b)) (hand-
derived merges, and a case where it diverges from BPE's raw pair
frequency), encoding is BERT's greedy longest-match-first with the
whole-word [UNK] rule, the distributed encode matches the reference
kernel, artifacts round-trip with torn-save detection, and
tokenizer.json interop preserves a published file's ids verbatim."""

from __future__ import annotations

import pytest


class TestTraining:
    def test_hand_derived_merge_order(self):
        from cod_stats_spark.operators.wordpiece import learn_wordpiece

        vocab = learn_wordpiece(
            [("aab", 4), ("ab", 2)], vocab_size=64, specials=("[UNK]",)
        )
        # symbols: aab=[a,##a,##b]·4, ab=[a,##b]·2
        # round 1: (a,##a) 4/(6·4) ties (##a,##b) 4/(4·6); lexicographic
        #   → (##a,##b) → ##ab.  round 2: (a,##ab) 4/(6·4) ties (a,##b)
        #   2/(6·2); → (a,##ab) → aab.  round 3: (a,##b) → ab.
        assert vocab.pieces() == [
            "[UNK]", "##a", "##b", "a", "##ab", "aab", "ab"
        ]

    def test_score_diverges_from_bpe_frequency(self):
        """The most FREQUENT pair loses to a higher-likelihood-gain
        pair — the defining difference from BPE."""
        from cod_stats_spark.operators.wordpiece import learn_wordpiece

        # (a,##b) count 100, score 100/(100·100); (c,##d) count 30,
        # score 30/(30·30) — wordpiece must merge cd first
        vocab = learn_wordpiece(
            [("ab", 100), ("cd", 30)], vocab_size=7, specials=("[UNK]",)
        )
        merges = vocab.pieces()[5:]  # after [UNK] + 4 alphabet symbols
        assert merges and merges[0] == "cd"

    def test_training_is_deterministic_and_bounded(self):
        from cod_stats_spark.operators.wordpiece import learn_wordpiece

        counts = [("hello", 5), ("help", 3), ("yelp", 2), ("hello", 5)]
        a = learn_wordpiece(counts, vocab_size=16)
        b = learn_wordpiece(counts, vocab_size=16)
        assert a.vocab == b.vocab
        assert len(a.vocab) <= 16

    def test_unk_must_be_special(self):
        from cod_stats_spark.operators.wordpiece import learn_wordpiece

        with pytest.raises(ValueError, match="unk_token"):
            learn_wordpiece([("ab", 2)], specials=("[PAD]",))


class TestVocabValidation:
    def test_rejects_missing_unk_duplicate_ids_empty(self):
        from cod_stats_spark.operators.wordpiece import WordPieceVocab

        with pytest.raises(ValueError, match="unk_token"):
            WordPieceVocab(vocab={"a": 0})
        with pytest.raises(ValueError, match="duplicate ids"):
            WordPieceVocab(vocab={"[UNK]": 0, "a": 0})
        with pytest.raises(ValueError, match="empty"):
            WordPieceVocab(vocab={})


def _bert_like():
    from cod_stats_spark.operators.wordpiece import WordPieceVocab

    toks = ["[PAD]", "[UNK]", "un", "runn", "aff", "##aff", "##able",
            "##ing", "the", "a", "##n"]
    return WordPieceVocab(vocab={t: i for i, t in enumerate(toks)})


class TestEncoding:
    def test_bert_canonical_example(self):
        from cod_stats_spark.operators.wordpiece import (
            wordpiece_encode_word,
        )

        v = _bert_like()
        assert wordpiece_encode_word("unaffable", v) == [
            "un", "##aff", "##able"
        ]
        assert wordpiece_encode_word("running", v) == ["runn", "##ing"]
        assert wordpiece_encode_word("the", v) == ["the"]

    def test_longest_match_wins(self):
        from cod_stats_spark.operators.wordpiece import (
            wordpiece_encode_word,
        )

        # "aff" (len 3) must win over "a" (len 1) at word start
        assert wordpiece_encode_word("affable", _bert_like()) == [
            "aff", "##able"
        ]

    def test_whole_word_unk_rules(self):
        from cod_stats_spark.operators.wordpiece import (
            WordPieceVocab,
            wordpiece_encode_word,
        )

        v = _bert_like()
        # unmatched mid-word remainder → whole word UNK, not partial
        assert wordpiece_encode_word("unz", v) == ["[UNK]"]
        assert wordpiece_encode_word("", v) == []
        short = WordPieceVocab(
            vocab={"[UNK]": 0, "a": 1, "##a": 2}, max_input_chars=3
        )
        assert wordpiece_encode_word("aaa", short) == ["a", "##a", "##a"]
        assert wordpiece_encode_word("aaaa", short) == ["[UNK]"]

    def test_distributed_encode_matches_reference(self, spark):
        from cod_stats_spark.operators.bpe import word_counts
        from cod_stats_spark.operators.wordpiece import (
            learn_wordpiece,
            wordpiece_encode,
            wordpiece_encode_word,
        )

        docs = spark.createDataFrame(
            [
                (1, "the running water keeps running"),
                (2, "An unaffable runner runs THE run"),
                (3, None),
            ],
            "doc_id long, text string",
        )
        vocab = learn_wordpiece(word_counts(docs), vocab_size=64)
        got = {
            r["doc_id"]: (r["wp_tokens"], r["wp_n_tokens"])
            for r in wordpiece_encode(docs, vocab).collect()
        }
        for doc_id, text in [(1, "the running water keeps running"),
                             (2, "an unaffable runner runs the run")]:
            want = []
            for w in text.split():
                want.extend(wordpiece_encode_word(w, vocab))
            assert got[doc_id] == (want, len(want))
        assert got[3] == ([], 0)
        # every emitted token is a real vocab piece
        for toks, _ in got.values():
            assert all(t in vocab.vocab for t in toks)


class TestEncodeIdsGlue:
    def test_wp_tokens_flow_into_encode_ids(self, spark):
        """WordPiece pieces() is the position-ordered vocab list
        encode_ids expects (learn_wordpiece assigns contiguous ids),
        so the BERT tokens flow straight into the packer's id
        mapping — [UNK] included, since it is a real vocab piece."""
        from cod_stats_spark.operators.bpe import word_counts
        from cod_stats_spark.operators.packing import encode_ids
        from cod_stats_spark.operators.wordpiece import (
            learn_wordpiece,
            wordpiece_encode,
        )

        docs = spark.createDataFrame(
            [(1, "the running water"), (2, "zzzq the")],
            "doc_id long, text string",
        )
        vocab = learn_wordpiece(
            word_counts(docs.where("doc_id = 1")), vocab_size=64
        )
        encoded = wordpiece_encode(docs, vocab)
        with_ids = encode_ids(
            encoded, "wp_tokens", vocab.pieces(),
            unk_id=vocab.vocab[vocab.unk_token],
        )
        got = {
            r["doc_id"]: (r["wp_tokens"], r["input_ids"])
            for r in with_ids.collect()
        }
        for toks, ids in got.values():
            assert ids == [vocab.vocab[t] for t in toks]
        # doc 2's OOV word came through as the [UNK] id, not dropped
        assert vocab.vocab[vocab.unk_token] in got[2][1]


class TestArtifacts:
    def test_save_load_encodes_identically(self, spark, tmp_path):
        from cod_stats_spark.operators.wordpiece import (
            learn_wordpiece,
            load_wordpiece,
            save_wordpiece,
            wordpiece_encode_word,
        )

        vocab = learn_wordpiece(
            [("hello", 5), ("help", 3), ("shell", 2)], vocab_size=24,
        )
        save_wordpiece(spark, vocab, str(tmp_path / "wp"))
        back = load_wordpiece(spark, str(tmp_path / "wp"))
        assert back.vocab == vocab.vocab
        for w in ("hello", "shellfish", "helper"):
            assert wordpiece_encode_word(w, back) == wordpiece_encode_word(
                w, vocab
            )

    def test_torn_artifact_refuses_to_load(self, spark, tmp_path):
        from cod_stats_spark.operators.wordpiece import (
            learn_wordpiece,
            load_wordpiece,
            save_wordpiece,
        )

        vocab = learn_wordpiece([("ab", 4)], vocab_size=8)
        path = str(tmp_path / "wp")
        save_wordpiece(spark, vocab, path)
        spark.createDataFrame(
            [("zz", 0)], "piece string, id int"
        ).coalesce(1).write.mode("overwrite").parquet(f"{path}/pieces")
        with pytest.raises(ValueError, match="torn"):
            load_wordpiece(spark, path)


class TestInterop:
    def test_export_import_roundtrip(self, tmp_path):
        from cod_stats_spark.operators.tokenizer_io import (
            read_tokenizer_json,
            tokenizer_json_to_wordpiece,
            wordpiece_to_tokenizer_json,
            write_tokenizer_json,
        )
        from cod_stats_spark.operators.wordpiece import (
            learn_wordpiece,
            wordpiece_encode_word,
        )

        vocab = learn_wordpiece(
            [("hug", 10), ("pug", 5), ("hugs", 5)], vocab_size=20
        )
        doc = wordpiece_to_tokenizer_json(vocab)
        p = str(tmp_path / "tokenizer.json")
        write_tokenizer_json(p, doc)
        back = tokenizer_json_to_wordpiece(read_tokenizer_json(p))
        assert back.vocab == vocab.vocab
        assert (back.unk_token, back.continuing_prefix,
                back.max_input_chars) == (
            vocab.unk_token, vocab.continuing_prefix, vocab.max_input_chars
        )
        for w in ("hug", "pugs", "zebra"):
            assert wordpiece_encode_word(w, back) == wordpiece_encode_word(
                w, vocab
            )

    def test_bert_shaped_fixture_ids_preserved(self):
        from cod_stats_spark.operators.tokenizer_io import (
            tokenizer_json_to_wordpiece,
        )

        # noncontiguous ids, as real published files can carry
        doc = {
            "model": {
                "type": "WordPiece",
                "unk_token": "[UNK]",
                "continuing_subword_prefix": "##",
                "max_input_chars_per_word": 50,
                "vocab": {"[UNK]": 100, "play": 7, "##ing": 42},
            }
        }
        v = tokenizer_json_to_wordpiece(doc, lowercase=False)
        assert v.vocab == {"[UNK]": 100, "play": 7, "##ing": 42}
        assert v.max_input_chars == 50
        assert v.lowercase is False
        # gapped ids must refuse the position-ordered list rather
        # than silently re-map (encode_ids treats position as id)
        with pytest.raises(ValueError, match="contiguous"):
            v.pieces()

    def test_malformed_documents_rejected(self):
        from cod_stats_spark.operators.tokenizer_io import (
            tokenizer_json_to_wordpiece,
        )

        with pytest.raises(ValueError, match="expected 'WordPiece'"):
            tokenizer_json_to_wordpiece({"model": {"type": "BPE"}})
        with pytest.raises(ValueError, match="empty vocab"):
            tokenizer_json_to_wordpiece(
                {"model": {"type": "WordPiece", "vocab": {}}}
            )
        with pytest.raises(ValueError, match="unk_token"):
            tokenizer_json_to_wordpiece(
                {"model": {"type": "WordPiece",
                           "unk_token": "[UNK]",
                           "vocab": {"a": 0}}}
            )
        with pytest.raises(ValueError, match="duplicate ids"):
            tokenizer_json_to_wordpiece(
                {"model": {"type": "WordPiece",
                           "unk_token": "[UNK]",
                           "vocab": {"[UNK]": 0, "a": 0}}}
            )

    def test_extra_special_tokens_ride_added_tokens(self):
        from cod_stats_spark.operators.tokenizer_io import (
            special_tokens_from_json,
            wordpiece_to_tokenizer_json,
        )
        from cod_stats_spark.operators.wordpiece import learn_wordpiece

        vocab = learn_wordpiece([("ab", 4)], vocab_size=8)
        doc = wordpiece_to_tokenizer_json(
            vocab, special_tokens=["<|endofdoc|>"]
        )
        extras = special_tokens_from_json(doc)
        assert extras == {"<|endofdoc|>": max(vocab.vocab.values()) + 1}
        with pytest.raises(ValueError, match="collide"):
            wordpiece_to_tokenizer_json(vocab, special_tokens=["[UNK]"])


class TestLowercaseRoundTrip:
    def test_cased_model_stays_cased(self, tmp_path):
        """The lowercase flag rides the normalizer field: a cased
        export round-trips cased, an uncased one uncased, and a
        BertNormalizer in a foreign file is honored (r13 review: the
        import used to default every file to lowercasing)."""
        from cod_stats_spark.operators.tokenizer_io import (
            read_tokenizer_json,
            tokenizer_json_to_wordpiece,
            wordpiece_to_tokenizer_json,
            write_tokenizer_json,
        )
        from cod_stats_spark.operators.wordpiece import WordPieceVocab

        for lc in (True, False):
            v = WordPieceVocab(
                vocab={"[UNK]": 0, "Hello": 1, "##o": 2}, lowercase=lc
            )
            p = str(tmp_path / f"t{lc}.json")
            write_tokenizer_json(p, wordpiece_to_tokenizer_json(v))
            back = tokenizer_json_to_wordpiece(read_tokenizer_json(p))
            assert back.lowercase is lc
        bert_doc = {
            "normalizer": {"type": "BertNormalizer", "lowercase": True},
            "model": {"type": "WordPiece", "unk_token": "[UNK]",
                      "vocab": {"[UNK]": 0, "a": 1}},
        }
        assert tokenizer_json_to_wordpiece(bert_doc).lowercase is True
        bert_doc["normalizer"]["lowercase"] = False
        assert tokenizer_json_to_wordpiece(bert_doc).lowercase is False
