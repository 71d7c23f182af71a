"""Byte-level BPE (operators/byte_bpe.py) + its tokenizer.json interop
(r12 verdict #3): GPT-2/tiktoken posture — byte alphabet, no UNK, no
EOW, ByteLevel pretokenizer, artifact vocab ids preserved verbatim."""

import pytest


class TestByteMapping:
    def test_bytes_to_unicode_is_the_published_bijection(self):
        from cod_stats_spark.operators.byte_bpe import (
            bytes_to_unicode,
            unicode_to_bytes,
        )

        t = bytes_to_unicode()
        assert len(t) == 256
        assert len(set(t.values())) == 256
        # printable ranges map to themselves
        assert t[ord("!")] == "!"
        assert t[ord("~")] == "~"
        assert t[0xFF] == "ÿ"
        # the classic: space -> 'Ġ' (U+0120), newline -> 'Ċ' (U+010A)
        assert t[0x20] == "Ġ"
        assert t[0x0A] == "Ċ"
        u = unicode_to_bytes()
        assert all(u[c] == b for b, c in t.items())

    def test_pretokenize_gpt2_shapes(self):
        from cod_stats_spark.operators.byte_bpe import byte_pretokenize

        def raw(text):
            # undo the byte mapping for readable assertions
            from cod_stats_spark.operators.byte_bpe import decode_symbols

            return [decode_symbols(s) for s in byte_pretokenize(text)]

        assert raw("Hello world!") == ["Hello", " world", "!"]
        assert raw("don't stop") == ["don", "'t", " stop"]
        assert raw("I'll pay $12.50") == [
            "I", "'ll", " pay", " $", "12", ".", "50",
        ]
        # leading-space convention: the space rides with the word
        assert raw("a  b") == ["a", " ", " b"]
        # underscore is punctuation here (matches \p{L} semantics)
        assert raw("snake_case") == ["snake", "_", "case"]
        # unicode letters stay in the word branch
        assert raw("café olé") == ["café", " olé"]
        assert raw("") == []
        assert raw(None) == []

    def test_roundtrip_lossless(self):
        from cod_stats_spark.operators.byte_bpe import (
            byte_pretokenize,
            decode_symbols,
        )

        for text in [
            "Hello, world!",
            "tabs\tand\nnewlines  end ",
            "emoji 🎉 and ümlaut",
            "混合 text with 中文",
        ]:
            assert decode_symbols("".join(byte_pretokenize(text))) == text


@pytest.fixture(scope="module")
def tiny_tok(spark):
    from cod_stats_spark.operators.byte_bpe import train_byte_bpe

    docs = spark.createDataFrame(
        [
            (i, "the quick brown fox jumps over the lazy dog " * 3)
            for i in range(8)
        ]
        + [(100 + i, "pack my box with five dozen jugs") for i in range(4)],
        "doc_id long, text string",
    )
    return train_byte_bpe(docs, vocab_size=48)


class TestTrainAndEncode:
    def test_vocab_layout_and_total_encodability(self, tiny_tok):
        tok = tiny_tok
        assert len(tok.vocab) == 256 + len(tok.merges)
        # byte symbols own ids 0-255 in byte order
        from cod_stats_spark.operators.byte_bpe import bytes_to_unicode

        b2u = bytes_to_unicode()
        for b in range(0, 256, 17):
            assert tok.vocab[b2u[b]] == b
        # no UNK: arbitrary unseen text encodes and decodes losslessly
        weird = "Ω≈ç√∫ bytes \x01\x02 ok"
        assert tok.decode(tok.encode(weird)) == weird

    def test_training_is_deterministic(self, spark):
        from cod_stats_spark.operators.byte_bpe import train_byte_bpe

        docs = spark.createDataFrame(
            [(i, "ababab cdcdcd ababab") for i in range(6)],
            "doc_id long, text string",
        )
        a = train_byte_bpe(docs, vocab_size=8)
        b = train_byte_bpe(docs.repartition(7), vocab_size=8)
        assert a.merges == b.merges
        assert a.vocab == b.vocab

    def test_distributed_encode_matches_reference(self, spark, tiny_tok):
        from cod_stats_spark.operators.byte_bpe import byte_bpe_encode

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox"),
                (2, "jugs of lazy dogs jump"),
                (3, None),
                (4, ""),
            ],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: (r["bpe_tokens"], r["ids"])
            for r in byte_bpe_encode(
                docs, tiny_tok, out_ids="ids"
            ).collect()
        }
        for did, text in [(1, "the quick brown fox"),
                          (2, "jugs of lazy dogs jump"),
                          (3, ""), (4, "")]:
            assert got[did][0] == tiny_tok.encode_symbols(text)
            assert got[did][1] == tiny_tok.encode(text)

    def test_encode_ids_integration(self, spark, tiny_tok):
        """The packer seam: byte_bpe_encode symbol strings ->
        packing.encode_ids with the tokenizer's positional vocab list
        == the tokenizer's own ids."""
        from cod_stats_spark.operators.byte_bpe import byte_bpe_encode
        from cod_stats_spark.operators.packing import encode_ids

        docs = spark.createDataFrame(
            [(1, "the quick brown fox jumps")],
            "doc_id long, text string",
        )
        enc = byte_bpe_encode(docs, tiny_tok, out_ids="direct_ids")
        mapped = encode_ids(
            enc, "bpe_tokens", tiny_tok.id_list(), out_col="mapped_ids"
        )
        r = mapped.first()
        assert list(r["mapped_ids"]) == list(r["direct_ids"])


class TestArtifactInterop:
    def test_export_import_roundtrip(self, tiny_tok, tmp_path):
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            read_tokenizer_json,
            tokenizer_json_to_byte_bpe,
            write_tokenizer_json,
        )

        doc = byte_bpe_to_tokenizer_json(tiny_tok)
        assert doc["pre_tokenizer"]["type"] == "ByteLevel"
        assert doc["decoder"]["type"] == "ByteLevel"
        assert doc["model"]["unk_token"] is None
        path = str(tmp_path / "tokenizer.json")
        write_tokenizer_json(path, doc)
        back = tokenizer_json_to_byte_bpe(read_tokenizer_json(path))
        assert back.merges == tiny_tok.merges
        assert back.vocab == tiny_tok.vocab
        text = "the quick brown fox over a lazy dog!"
        assert back.encode(text) == tiny_tok.encode(text)
        # deterministic bytes: re-export is a byte no-op
        p2 = str(tmp_path / "t2.json")
        write_tokenizer_json(p2, byte_bpe_to_tokenizer_json(back))
        assert open(path, "rb").read() == open(p2, "rb").read()

    def test_gpt2_shaped_fixture_ids_preserved(self, tiny_tok):
        """A published file's vocab ids are arbitrary (frequency-
        ordered in real GPT-2) — the import must use them verbatim,
        never re-derive from position."""
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            tokenizer_json_to_byte_bpe,
        )

        doc = byte_bpe_to_tokenizer_json(tiny_tok)
        # permute two ids (stays contiguous, no longer positional)
        v = doc["model"]["vocab"]
        syms = sorted(v, key=v.get)
        a, b = syms[3], syms[-1]
        v[a], v[b] = v[b], v[a]
        tok = tokenizer_json_to_byte_bpe(doc)
        assert tok.vocab[a] == len(v) - 1 and tok.vocab[b] == 3
        ids = tok.encode("the fox")
        assert all(
            tok.vocab[s] == i
            for s, i in zip(tok.encode_symbols("the fox"), ids)
        )

    def test_sequence_wrapped_bytelevel_accepted(self, tiny_tok):
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            tokenizer_json_to_byte_bpe,
        )

        doc = byte_bpe_to_tokenizer_json(tiny_tok)
        doc["pre_tokenizer"] = {
            "type": "Sequence",
            "pretokenizers": [
                {"type": "Split", "pattern": "x"},
                {"type": "ByteLevel", "add_prefix_space": False},
            ],
        }
        assert tokenizer_json_to_byte_bpe(doc).merges == tiny_tok.merges

    def test_malformed_documents_rejected(self, tiny_tok):
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            tokenizer_json_to_byte_bpe,
        )

        good = byte_bpe_to_tokenizer_json(tiny_tok)
        # whitespace-family file (no ByteLevel) refused
        bad = {**good, "pre_tokenizer": {"type": "WhitespaceSplit"}}
        with pytest.raises(ValueError, match="ByteLevel"):
            tokenizer_json_to_byte_bpe(bad)
        # byte alphabet gap refused (no UNK -> unencodable input)
        import copy

        bad2 = copy.deepcopy(good)
        gone = next(iter(bad2["model"]["vocab"]))
        del bad2["model"]["vocab"][gone]
        with pytest.raises(ValueError, match="byte"):
            tokenizer_json_to_byte_bpe(bad2)
        # merge product missing from vocab refused
        bad3 = copy.deepcopy(good)
        bad3["model"]["merges"].append("ZZ QQ")
        with pytest.raises(ValueError, match="missing from vocab"):
            tokenizer_json_to_byte_bpe(bad3)
        # wrong model type refused
        with pytest.raises(ValueError, match="expected 'BPE'"):
            tokenizer_json_to_byte_bpe(
                {**good, "model": {"type": "Unigram"}}
            )

    def test_special_tokens_ride_added_tokens(self, tiny_tok):
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            special_tokens_from_json,
            tokenizer_json_to_byte_bpe,
        )

        doc = byte_bpe_to_tokenizer_json(
            tiny_tok, special_tokens=["<|endoftext|>"]
        )
        n = len(tiny_tok.vocab)
        assert special_tokens_from_json(doc) == {"<|endoftext|>": n}
        tok = tokenizer_json_to_byte_bpe(doc)
        assert tok.special_tokens == {"<|endoftext|>": n}

    def test_noncontiguous_ids_refuse_id_list_only(self, tiny_tok):
        """Gapped ids are a valid published artifact (id_list is the
        only consumer that needs contiguity)."""
        from cod_stats_spark.operators.tokenizer_io import (
            byte_bpe_to_tokenizer_json,
            tokenizer_json_to_byte_bpe,
        )

        doc = byte_bpe_to_tokenizer_json(tiny_tok)
        v = doc["model"]["vocab"]
        top = max(v, key=v.get)
        v[top] = v[top] + 100  # gap
        tok = tokenizer_json_to_byte_bpe(doc)
        assert tok.encode("fox")  # encoding still total
        with pytest.raises(ValueError, match="contiguous"):
            tok.id_list()


def test_special_tokens_survive_export_import_roundtrip(tiny_tok, tmp_path):
    """Import→export must carry special tokens WITH their stored ids
    (the verbatim rule — r13 review: they were silently dropped)."""
    from cod_stats_spark.operators.tokenizer_io import (
        byte_bpe_to_tokenizer_json,
        read_tokenizer_json,
        tokenizer_json_to_byte_bpe,
        write_tokenizer_json,
    )

    doc = byte_bpe_to_tokenizer_json(
        tiny_tok, special_tokens=["<|pad|>", "<|eos|>"]
    )
    p = str(tmp_path / "t.json")
    write_tokenizer_json(p, doc)
    back = tokenizer_json_to_byte_bpe(read_tokenizer_json(p))
    assert back.special_tokens  # populated on import
    doc2 = byte_bpe_to_tokenizer_json(back)
    assert doc2["added_tokens"] == doc["added_tokens"]
    back2 = tokenizer_json_to_byte_bpe(doc2)
    assert back2.special_tokens == back.special_tokens
