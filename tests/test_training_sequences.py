"""training_sequences + encode_ids (operators/packing.py, r11): the
final training artifact — concatenate-then-split token windows over
the deterministic md5 tape — checked against a literal Python replay
of the same semantics, plus the piece→id mapping in both paths."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F


def _md5(salt: str, doc_id: int) -> str:
    return hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()


def _reference(rows, seq_len, salt="pack", drop_last=True, pad_value=None):
    """The loader semantics, literally: sort docs by md5 key, build
    the tape, split at seq_len."""
    tape = []
    order = sorted(
        (r for r in rows if r[1]), key=lambda r: (_md5(salt, r[0]), r[0])
    )
    for _did, toks in order:
        tape.extend(toks)
    out = {}
    for w in range(0, (len(tape) + seq_len - 1) // seq_len):
        ids = tape[w * seq_len:(w + 1) * seq_len]
        if len(ids) < seq_len:
            if drop_last:
                continue
            if pad_value is not None:
                ids = ids + [pad_value] * (seq_len - len(ids))
        out[w] = ids
    return out


ROWS = [
    (1, [10, 11, 12, 13, 14]),
    (2, [20, 21]),
    (3, []),                 # empty: contributes nothing
    (4, [40, 41, 42, 43, 44, 45, 46, 47, 48]),  # straddles windows
    (5, [50]),
    (6, None),               # null: contributes nothing
    (7, [70, 71, 72]),
]


def _df(spark, rows=ROWS):
    return spark.createDataFrame(rows, "doc_id long, toks array<int>")


class TestTrainingSequences:
    @pytest.mark.parametrize("seq_len", [4, 7, 64])
    def test_matches_reference_loader(self, spark, seq_len):
        from cod_stats_spark.operators.packing import training_sequences

        got = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark), "toks", seq_len=seq_len
            ).collect()
        }
        assert got == _reference(ROWS, seq_len)

    def test_keep_last_and_padding(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        got = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark), "toks", seq_len=6, drop_last=False
            ).collect()
        }
        assert got == _reference(ROWS, 6, drop_last=False)
        padded = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark), "toks", seq_len=6,
                drop_last=False, pad_value=-1,
            ).collect()
        }
        assert padded == _reference(ROWS, 6, drop_last=False, pad_value=-1)
        assert all(len(v) == 6 for v in padded.values())

    def test_window_invariants_and_doc_counts(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        out = training_sequences(_df(spark), "toks", seq_len=4).collect()
        assert all(r["n_tokens"] == 4 for r in out)
        # doc count per window: replay from the reference tape spans
        ref = _reference(ROWS, 4, drop_last=False)
        tape_docs = []
        for did, toks in sorted(
            (r for r in ROWS if r[1]), key=lambda r: (_md5("pack", r[0]), r[0])
        ):
            tape_docs.extend([did] * len(toks))
        for r in out:
            w = r["seq_id"]
            expect = len(set(tape_docs[w * 4:(w + 1) * 4]))
            assert r["n_docs"] == expect, (w, r["n_docs"], expect)
        assert {r["seq_id"] for r in out} <= set(ref)

    def test_deterministic_under_partitioning(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        a = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark), "toks", seq_len=5
            ).collect()
        }
        b = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark).repartition(7), "toks", seq_len=5
            ).collect()
        }
        assert a == b

    def test_string_pieces_supported(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        df = spark.createDataFrame(
            [(1, ["a", "b", "c"]), (2, ["d", "e", "f"])],
            "doc_id long, toks array<string>",
        )
        out = training_sequences(df, "toks", seq_len=3).collect()
        assert len(out) == 2
        assert sorted(
            tuple(r["input_ids"]) for r in out
        ) == [("a", "b", "c"), ("d", "e", "f")]

    def test_guards(self, spark):
        from cod_stats_spark.operators.packing import (
            pack_sequences,
            training_sequences,
        )

        with pytest.raises(ValueError, match="seq_len"):
            training_sequences(_df(spark), "toks", seq_len=0)
        with pytest.raises(ValueError, match="drop_last"):
            training_sequences(_df(spark), "toks", pad_value=0)
        # num_buckets in 2..255 is NOT order-preserving for the
        # 2-hex-char bucket key: the tape would silently go
        # bucket-major instead of global md5 order (r11 review)
        for bad in (2, 128, 255):
            with pytest.raises(ValueError, match="order-preserving"):
                training_sequences(_df(spark), "toks", num_buckets=bad)
            with pytest.raises(ValueError, match="order-preserving"):
                pack_sequences(
                    spark.createDataFrame(
                        [(1, 3)], "doc_id long, n long"
                    ),
                    "n", num_buckets=bad,
                )
        # 1 and >=256 stay legal (1 = single bucket, >=256 = identity)
        got = {
            r["seq_id"]: list(r["input_ids"])
            for r in training_sequences(
                _df(spark), "toks", seq_len=4, num_buckets=1
            ).collect()
        }
        assert got == _reference(ROWS, 4)


class TestDocSpans:
    def test_spans_cover_windows_and_match_reference(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        out = training_sequences(
            _df(spark), "toks", seq_len=4, with_spans=True
        ).collect()
        assert out
        # reference tape of (doc_id, token) pairs
        tape = []
        for did, toks in sorted(
            (r for r in ROWS if r[1]), key=lambda r: (_md5("pack", r[0]), r[0])
        ):
            tape.extend((did, t) for t in toks)
        for r in out:
            w = r["seq_id"]
            window = tape[w * 4:(w + 1) * 4]
            # spans tile the window exactly, in order, one per doc run
            runs = []
            for did, _t in window:
                if runs and runs[-1][0] == did:
                    runs[-1][1] += 1
                else:
                    runs.append([did, 1])
            got = [(s["off"], s["len"]) for s in r["doc_spans"]]
            expect, off = [], 0
            for _did, ln in runs:
                expect.append((off, ln))
                off += ln
            assert got == expect, (w, got, expect)
            assert sum(s["len"] for s in r["doc_spans"]) == 4
            assert len(r["doc_spans"]) == r["n_docs"]

    def test_spans_with_padding_leave_tail_uncovered(self, spark):
        from cod_stats_spark.operators.packing import training_sequences

        out = training_sequences(
            _df(spark), "toks", seq_len=6,
            drop_last=False, pad_value=-1, with_spans=True,
        ).collect()
        last = max(out, key=lambda r: r["seq_id"])
        covered = sum(s["len"] for s in last["doc_spans"])
        assert covered == last["n_tokens"]       # pre-pad token count
        assert len(last["input_ids"]) == 6       # padded to seq_len


class TestEpochExpand:
    DOCS = [(i, ["web", "wiki", "code"][i % 3]) for i in range(60)]

    def _df(self, spark):
        return spark.createDataFrame(self.DOCS, "doc_id long, domain string")

    def test_integer_and_fractional_epochs(self, spark):
        from cod_stats_spark.operators.sampling import epoch_expand

        out = epoch_expand(
            self._df(spark), "doc_id", "domain",
            {"wiki": 3.0, "code": 1.5, "web": 1.0},
        )
        rows = out.collect()
        by_dom: dict[str, list] = {}
        for r in rows:
            by_dom.setdefault(r["domain"], []).append(r)
        n_wiki = len([d for d in self.DOCS if d[1] == "wiki"])
        n_code = len([d for d in self.DOCS if d[1] == "code"])
        n_web = len([d for d in self.DOCS if d[1] == "web"])
        assert len(by_dom["wiki"]) == 3 * n_wiki
        assert {r["epoch"] for r in by_dom["wiki"]} == {0, 1, 2}
        assert len(by_dom["web"]) == n_web
        assert {r["epoch"] for r in by_dom["web"]} == {0}
        # fractional: every code doc once, plus a strict subset again
        extra = [r for r in by_dom["code"] if r["epoch"] == 1]
        assert n_code <= len(by_dom["code"]) < 2 * n_code
        assert 0 < len(extra) < n_code
        # the extra-copy set is deterministic
        again = {
            (r["doc_id"], r["epoch"])
            for r in epoch_expand(
                self._df(spark).repartition(5), "doc_id", "domain",
                {"wiki": 3.0, "code": 1.5, "web": 1.0},
            ).collect()
        }
        assert again == {(r["doc_id"], r["epoch"]) for r in rows}

    def test_epoch_key_feeds_packing(self, spark):
        """Replicas share doc_id, which breaks single-key tape
        placement (colliding order keys); epoch_key is the unique
        per-copy key and must compose with training_sequences — all
        replicated tokens appear, none silently lost (r11 review)."""
        from cod_stats_spark.operators.packing import training_sequences
        from cod_stats_spark.operators.sampling import epoch_expand

        docs = spark.createDataFrame(
            [(i, "wiki", list(range(i * 10, i * 10 + 5)))
             for i in range(8)],
            "doc_id long, domain string, toks array<int>",
        )
        up = epoch_expand(docs, "doc_id", "domain", {"wiki": 2.0})
        assert up.select("epoch_key").distinct().count() == 16
        wins = training_sequences(
            up, "toks", id_col="epoch_key", seq_len=5,
            drop_last=False,
        ).collect()
        got = sorted(t for r in wins for t in r["input_ids"])
        expect = sorted(
            t for i in range(8) for t in range(i * 10, i * 10 + 5)
        ) * 2
        assert got == sorted(expect)

    def test_unlisted_kept_once_zero_drops_and_thinning(self, spark):
        from cod_stats_spark.operators.sampling import epoch_expand

        out = epoch_expand(
            self._df(spark), "doc_id", "domain", {"wiki": 0.0, "code": 0.5}
        ).collect()
        doms = {r["domain"] for r in out}
        assert "wiki" not in doms                 # explicit 0 drops
        web = [r for r in out if r["domain"] == "web"]
        assert len(web) == len([d for d in self.DOCS if d[1] == "web"])
        code = [r for r in out if r["domain"] == "code"]
        n_code = len([d for d in self.DOCS if d[1] == "code"])
        assert 0 < len(code) < n_code             # w<1 == thinning
        assert all(r["epoch"] == 0 for r in code)
        with pytest.raises(ValueError, match=">= 0"):
            epoch_expand(self._df(spark), "doc_id", "domain", {"web": -1})


class TestEncodeIds:
    VOCAB = ["<unk>", "an", "ban", "a", "b", "n"]

    def _pieces(self, spark):
        return spark.createDataFrame(
            [(1, ["ban", "an", "a"]), (2, ["b", "zzz", "n"]), (3, []),
             (4, None)],
            "doc_id long, pieces array<string>",
        )

    def test_literal_path_maps_and_handles_oov(self, spark):
        from cod_stats_spark.operators.packing import encode_ids

        got = {
            r["doc_id"]: list(r["input_ids"])
            for r in encode_ids(
                self._pieces(spark), "pieces", self.VOCAB, unk_id=0
            ).collect()
        }
        # null pieces array -> EMPTY ids on BOTH paths (the contract
        # must not flip when the vocab crosses the literal ceiling)
        assert got == {1: [2, 1, 3], 2: [4, 0, 5], 3: [], 4: []}
        dropped = {
            r["doc_id"]: list(r["input_ids"])
            for r in encode_ids(
                self._pieces(spark), "pieces", self.VOCAB
            ).collect()
        }
        assert dropped == {1: [2, 1, 3], 2: [4, 5], 3: [], 4: []}

    def test_duplicate_vocab_rejected_up_front(self, spark):
        """Both paths must fail the SAME way on a duplicate piece —
        the literal map would raise at runtime while the relation
        join would silently emit extra tokens (ADVICE r11)."""
        import pytest

        from cod_stats_spark.operators.packing import encode_ids

        with pytest.raises(ValueError, match="duplicate"):
            encode_ids(
                self._pieces(spark), "pieces", ["a", "b", "a"]
            )

    def test_relation_path_parity(self, spark, monkeypatch):
        """Vocab above the codegen ceiling takes the broadcast-join
        path — same answers, order preserved."""
        from cod_stats_spark.operators import packing

        want = {
            r["doc_id"]: list(r["input_ids"])
            for r in packing.encode_ids(
                self._pieces(spark), "pieces", self.VOCAB, unk_id=0
            ).collect()
        }
        monkeypatch.setattr(packing, "_VOCAB_LITERAL_LIMIT", 2)
        got = {
            r["doc_id"]: list(r["input_ids"])
            for r in packing.encode_ids(
                self._pieces(spark), "pieces", self.VOCAB, unk_id=0
            ).collect()
        }
        assert got == want
        monkeypatch.setattr(packing, "_VOCAB_LITERAL_LIMIT", 2)
        drop = {
            r["doc_id"]: list(r["input_ids"])
            for r in packing.encode_ids(
                self._pieces(spark), "pieces", self.VOCAB
            ).collect()
        }
        assert drop == {1: [2, 1, 3], 2: [4, 5], 3: [], 4: []}

    def test_empty_vocab_rejected(self, spark):
        from cod_stats_spark.operators.packing import encode_ids

        with pytest.raises(ValueError, match="non-empty"):
            encode_ids(self._pieces(spark), "pieces", [])


class TestTokenizerToSequencesEndToEnd:
    def test_unigram_pieces_to_training_windows(self, spark):
        """The full final mile: trained tokenizer -> piece ids ->
        fixed-length windows; flattened windows equal the tape prefix."""
        from cod_stats_spark.operators.packing import (
            encode_ids,
            training_sequences,
        )
        from cod_stats_spark.operators.unigram_lm import (
            learn_unigram,
            unigram_encode,
        )

        docs = spark.createDataFrame(
            [(i, "banana bandana ban " * (i + 1)) for i in range(6)],
            "doc_id long, text string",
        )
        vocab = learn_unigram(
            [("banana", 30), ("bandana", 20), ("ban", 10)], vocab_size=16
        )
        pieces = unigram_encode(docs, vocab, "text")
        vocab_list = sorted(vocab.logp)
        with_ids = encode_ids(pieces, "ulm_tokens", vocab_list)
        seqs = training_sequences(with_ids, "input_ids", seq_len=8)
        rows = seqs.collect()
        assert rows, "expected at least one full window"
        assert all(r["n_tokens"] == 8 for r in rows)
        # every id is a valid vocab index
        mx = len(vocab_list)
        assert all(0 <= t < mx for r in rows for t in r["input_ids"])
