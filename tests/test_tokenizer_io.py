"""tokenizer.json interop (operators/tokenizer_io.py): round-trips
must reproduce identical encodes through reloaded artifacts, bytes
must be deterministic, and malformed documents must fail loudly."""

from __future__ import annotations

import pytest


def _train_bpe():
    from cod_stats_spark.operators.bpe import learn_bpe

    counts = [
        ("low", 5), ("lower", 2), ("lowest", 6), ("newer", 6),
        ("wider", 3), ("new", 2), ("slow", 4), ("slower", 3),
    ]
    return learn_bpe(counts, vocab_size=24)


def _train_unigram():
    from cod_stats_spark.operators.unigram_lm import learn_unigram

    counts = [
        ("low", 5), ("lower", 2), ("lowest", 6), ("newer", 6),
        ("wider", 3), ("new", 2), ("slow", 4), ("slower", 3),
    ]
    return learn_unigram(counts, vocab_size=24)


class TestBpeRoundTrip:
    def test_identical_encodes_through_reloaded_artifact(self, tmp_path):
        from cod_stats_spark.operators.bpe import encode_word
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
            read_tokenizer_json,
            tokenizer_json_to_bpe,
            write_tokenizer_json,
        )

        merges = _train_bpe()
        p = str(tmp_path / "tokenizer.json")
        write_tokenizer_json(p, bpe_to_tokenizer_json(merges))
        back = tokenizer_json_to_bpe(read_tokenizer_json(p))
        assert back == merges
        ranks_a = {m: i for i, m in enumerate(merges)}
        ranks_b = {m: i for i, m in enumerate(back)}
        for w in ("lowest", "newest", "slower", "unseen", "q"):
            assert encode_word(w, ranks_a) == encode_word(w, ranks_b)

    def test_vocab_covers_every_producible_symbol(self, tmp_path):
        from cod_stats_spark.operators.bpe import EOW, encode_word
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
        )

        merges = _train_bpe()
        doc = bpe_to_tokenizer_json(merges, unk_token="<unk>")
        vocab = doc["model"]["vocab"]
        assert EOW in vocab and "<unk>" in vocab
        assert sorted(vocab.values()) == list(range(len(vocab)))
        ranks = {m: i for i, m in enumerate(merges)}
        for w in ("lowest", "newer", "slow"):
            for sym in encode_word(w, ranks):
                assert sym in vocab, f"{sym!r} not in serialized vocab"

    def test_pair_spelling_accepted(self):
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
            tokenizer_json_to_bpe,
        )

        merges = _train_bpe()
        doc = bpe_to_tokenizer_json(merges)
        doc["model"]["merges"] = [m.split(" ") for m in doc["model"]["merges"]]
        assert tokenizer_json_to_bpe(doc) == merges

    def test_wrong_model_type_rejected(self):
        from cod_stats_spark.operators.tokenizer_io import (
            tokenizer_json_to_bpe,
        )

        with pytest.raises(ValueError, match="model.type"):
            tokenizer_json_to_bpe({"model": {"type": "Unigram"}})


class TestUnigramRoundTrip:
    def test_bit_identical_model_and_encodes(self, tmp_path):
        from cod_stats_spark.operators.tokenizer_io import (
            read_tokenizer_json,
            tokenizer_json_to_unigram,
            unigram_to_tokenizer_json,
            write_tokenizer_json,
        )
        from cod_stats_spark.operators.unigram_lm import (
            _vocab_fingerprint,
            viterbi_encode_word,
        )

        vocab = _train_unigram()
        p = str(tmp_path / "tokenizer.json")
        write_tokenizer_json(p, unigram_to_tokenizer_json(vocab))
        back = tokenizer_json_to_unigram(read_tokenizer_json(p))
        # bit-identity via the artifact fingerprint (IEEE doubles
        # round-trip exactly through json float repr)
        assert _vocab_fingerprint(sorted(back.logp.items())) == (
            _vocab_fingerprint(sorted(vocab.logp.items()))
        )
        assert back.max_piece_len >= max(len(x) for x in back.logp)
        for w in ("lowest", "newest", "slower", "unseen"):
            assert viterbi_encode_word(w, back) == (
                viterbi_encode_word(w, vocab)
            )

    def test_deterministic_bytes(self, tmp_path):
        from cod_stats_spark.operators.tokenizer_io import (
            unigram_to_tokenizer_json,
            write_tokenizer_json,
        )

        vocab = _train_unigram()
        a, b = str(tmp_path / "a.json"), str(tmp_path / "b.json")
        write_tokenizer_json(a, unigram_to_tokenizer_json(vocab))
        write_tokenizer_json(b, unigram_to_tokenizer_json(vocab))
        assert open(a, "rb").read() == open(b, "rb").read()

    def test_malformed_documents_rejected(self):
        from cod_stats_spark.operators.tokenizer_io import (
            tokenizer_json_to_unigram,
        )

        with pytest.raises(ValueError, match="empty"):
            tokenizer_json_to_unigram(
                {"model": {"type": "Unigram", "vocab": []}}
            )
        with pytest.raises(ValueError, match="duplicate"):
            tokenizer_json_to_unigram(
                {"model": {"type": "Unigram",
                           "vocab": [["a", -1.0], ["a", -2.0]]}}
            )


class TestSpecialTokenPackerGlue:
    def test_eos_ids_survive_encode_ids_and_the_tape(
        self, spark, tmp_path
    ):
        """r12 verdict #6: wire the exported special tokens into the
        packer end-to-end — vocab extension via special_tokens_from_json,
        '<eos>' appended between documents, ids surviving both the
        one-shot pack and the incremental tape-append path."""
        from pyspark.sql import functions as F

        from cod_stats_spark.operators.bpe import (
            bpe_encode,
            learn_bpe,
            word_counts,
        )
        from cod_stats_spark.operators.packing import (
            encode_ids,
            training_sequences,
        )
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
            read_tokenizer_json,
            special_tokens_from_json,
            tokenizer_json_to_bpe,
            write_tokenizer_json,
        )
        from cod_stats_spark.streaming.packing import (
            finalize_training_tape,
            training_sequences_append,
        )

        docs = spark.createDataFrame(
            [(i, "low lower lowest low low") for i in range(4)]
            + [(10 + i, "new newer newest new") for i in range(4)],
            "doc_id long, text string",
        )
        counts = word_counts(docs)
        merges = learn_bpe(counts, vocab_size=12)
        alphabet = {c for w, _ in counts for c in w}
        art = str(tmp_path / "tokenizer.json")
        write_tokenizer_json(
            art,
            bpe_to_tokenizer_json(
                merges, alphabet=alphabet,
                special_tokens=["<eos>", "<pad>"],
            ),
        )
        loaded = read_tokenizer_json(art)
        merges2 = tokenizer_json_to_bpe(loaded)
        specials = special_tokens_from_json(loaded)
        model_vocab = loaded["model"]["vocab"]
        n = len(model_vocab)
        # ids continue past the model vocab, in list order
        assert specials == {"<eos>": n, "<pad>": n + 1}
        vocab_list = [None] * (n + len(specials))
        for s, i in model_vocab.items():
            vocab_list[int(i)] = s
        for s, i in specials.items():
            vocab_list[i] = s
        assert all(v is not None for v in vocab_list)

        enc = bpe_encode(docs, merges2)
        with_eos = enc.withColumn(
            "toks",
            F.concat("bpe_tokens", F.array(F.lit("<eos>"))),
        )
        ids = encode_ids(with_eos, "toks", vocab_list, out_col="ids")
        eos_id = specials["<eos>"]
        id_rows = {r["doc_id"]: list(r["ids"]) for r in ids.collect()}
        assert all(v[-1] == eos_id for v in id_rows.values())
        assert all(eos_id not in v[:-1] for v in id_rows.values())

        # one-shot pack: every token (incl. each doc's <eos>) lands in
        # exactly one window
        L = 16
        seqs = training_sequences(
            ids, "ids", seq_len=L, drop_last=False, pad_value=None
        )
        flat = [
            t for r in sorted(
                seqs.collect(), key=lambda r: r["seq_id"]
            ) for t in r["input_ids"]
        ]
        assert flat.count(eos_id) == 8
        assert sorted(flat) == sorted(
            t for v in id_rows.values() for t in v
        )

        # incremental tape: two appends + the non-consuming flush
        state = str(tmp_path / "tape")
        emitted = []
        for b, pred in ((1, "doc_id < 10"), (2, "doc_id >= 10")):
            out = training_sequences_append(
                spark, ids.where(pred), "ids", state,
                batch_id=b, seq_len=L,
            )
            emitted += [
                t for r in out.collect() for t in r["input_ids"]
            ]
        tail = finalize_training_tape(spark, state)
        if tail is not None:
            emitted += [t for t in tail.first()["input_ids"]]
        assert emitted.count(eos_id) == 8
        assert sorted(emitted) == sorted(flat)


class TestReviewRegressions:
    def test_duplicate_merge_products_rejected(self):
        """r12 advice: ('a','bc') and ('ab','c') both yield 'abc' —
        real BPE training can emit this. Position-derived ids would
        then gap the vocab, and a special/unk token appended at
        next_id=len(vocab) would silently share an id with the last
        model piece. Reject loudly instead."""
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
        )

        merges = [("a", "b"), ("ab", "c"), ("a", "bc")]
        with pytest.raises(ValueError, match="duplicate merge products"):
            bpe_to_tokenizer_json(merges)
        # same hazard when a product collides with the EOW base symbol
        with pytest.raises(ValueError, match="collides with a base"):
            bpe_to_tokenizer_json([("</", "w>")])


    def test_alphabet_param_covers_unmerged_chars(self, tmp_path):
        """r12 review: a character that never participates in a merge
        (rare word) is still emitted by encode_word — the export must
        be able to cover it via the training alphabet."""
        from cod_stats_spark.operators.bpe import encode_word, learn_bpe
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
        )

        counts = [("low", 50), ("lower", 20), ("lowest", 60), ("quiz", 1)]
        merges = learn_bpe(counts, vocab_size=8)
        alphabet = {c for w, _ in counts for c in w}
        doc = bpe_to_tokenizer_json(merges, alphabet=alphabet)
        vocab = doc["model"]["vocab"]
        ranks = {m: i for i, m in enumerate(merges)}
        for w, _ in counts:
            for sym in encode_word(w, ranks):
                assert sym in vocab, f"{sym!r} missing from vocab"
        assert sorted(vocab.values()) == list(range(len(vocab)))

    def test_shell_not_shared_between_exports(self):
        """r12 review: mutating one exported document's added_tokens
        must not leak into later exports (the module constant was
        shared by reference)."""
        from cod_stats_spark.operators.tokenizer_io import (
            unigram_to_tokenizer_json,
        )

        v = _train_unigram()
        a = unigram_to_tokenizer_json(v)
        a["added_tokens"].append({"id": 999, "content": "<special>"})
        b = unigram_to_tokenizer_json(v)
        assert b["added_tokens"] == []

    def test_special_tokens_section(self, tmp_path):
        """Special tokens ride added_tokens with ids past the model
        vocab; encode_ids consumes them as appended vocab pieces end
        to end."""
        from cod_stats_spark.operators.tokenizer_io import (
            read_tokenizer_json,
            special_tokens_from_json,
            unigram_to_tokenizer_json,
            write_tokenizer_json,
        )

        v = _train_unigram()
        doc = unigram_to_tokenizer_json(
            v, special_tokens=["<pad>", "<bos>", "<eos>"]
        )
        p = str(tmp_path / "t.json")
        write_tokenizer_json(p, doc)
        back = read_tokenizer_json(p)
        got = special_tokens_from_json(back)
        n = len(v.logp)
        assert got == {"<pad>": n, "<bos>": n + 1, "<eos>": n + 2}
        assert all(t["special"] for t in back["added_tokens"])
        # model vocab untouched
        assert len(back["model"]["vocab"]) == n

    def test_special_token_collisions_rejected(self):
        """r12 review (4th pass): a special token duplicated or equal
        to a model piece would give one content two ids — raise."""
        from cod_stats_spark.operators.tokenizer_io import (
            bpe_to_tokenizer_json,
            unigram_to_tokenizer_json,
        )

        merges = _train_bpe()
        with pytest.raises(ValueError, match="duplicate special"):
            bpe_to_tokenizer_json(
                merges, special_tokens=["<pad>", "<pad>"]
            )
        with pytest.raises(ValueError, match="collide"):
            bpe_to_tokenizer_json(
                merges, unk_token="<unk>", special_tokens=["<unk>"]
            )
        v = _train_unigram()
        piece = sorted(v.logp)[0]
        with pytest.raises(ValueError, match="collide"):
            unigram_to_tokenizer_json(v, special_tokens=[piece])
