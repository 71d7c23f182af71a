"""Incremental training-sequence packing (streaming/packing.py):
append == segmented rebuild, shipped windows frozen, cross-batch
window completion with doc identity, replay idempotence, and the
frozen-tape-parameter marker."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    """rows: (doc_id, n_tokens) — tokens are readable strings
    't<doc>_<i>' so window content mistakes are visible."""
    data = [
        (d, [f"t{d}_{i}" for i in range(n)]) for d, n in rows
    ]
    return spark.createDataFrame(data, "doc_id long, toks array<string>")


BATCHES = [
    [(1, 7), (2, 5), (3, 9)],          # 21 tokens
    [(4, 3), (5, 11)],                 # 14 tokens
    [(6, 2), (7, 8), (8, 1), (9, 6)],  # 17 tokens
]
L = 8  # 52 tokens total -> 6 full windows + 4-token remainder


class TestAppendEqualsRebuild:
    def test_sequential_appends_match_segmented_oneshot(
        self, spark, tmp_path
    ):
        from cod_stats_spark.operators.packing import training_sequences
        from cod_stats_spark.streaming.packing import (
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        got = {}
        for b, rows in enumerate(BATCHES, start=1):
            out = training_sequences_append(
                spark, _docs(spark, rows), "toks", state,
                batch_id=b, seq_len=L, with_spans=True,
            )
            for r in out.collect():
                assert r["seq_id"] not in got, "window re-emitted"
                got[r["seq_id"]] = (
                    tuple(r["input_ids"]),
                    r["n_docs"],
                    tuple((s["off"], s["len"]) for s in r["doc_spans"]),
                )

        union = None
        for b, rows in enumerate(BATCHES, start=1):
            part = _docs(spark, rows).withColumn("batch", F.lit(b))
            union = part if union is None else union.unionByName(part)
        want = {
            r["seq_id"]: (
                tuple(r["input_ids"]),
                r["n_docs"],
                tuple((s["off"], s["len"]) for s in r["doc_spans"]),
            )
            for r in training_sequences(
                union, "toks", seq_len=L, with_spans=True,
                segment_col="batch",
            ).collect()
        }
        assert got == want
        assert sorted(got) == list(range(len(got)))  # contiguous seq_ids

    def test_cross_batch_window_keeps_doc_identity(self, spark, tmp_path):
        """A window completed by batch 2 carries batch 1's remainder
        docs as REAL spans (n_docs counts them, offsets cover the
        window)."""
        from cod_stats_spark.streaming.packing import (
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        # batch 1: 5 tokens -> no full window, remainder = [d1(3), d2(2)]
        out1 = training_sequences_append(
            spark, _docs(spark, [(1, 3), (2, 2)]), "toks", state,
            batch_id=1, seq_len=L, with_spans=True,
        )
        assert out1.count() == 0
        # batch 2: 4 tokens -> completes window 0 (5 + 3), remainder 1
        out2 = training_sequences_append(
            spark, _docs(spark, [(3, 4)]), "toks", state,
            batch_id=2, seq_len=L, with_spans=True,
        )
        rows = out2.collect()
        assert len(rows) == 1 and rows[0]["seq_id"] == 0
        assert rows[0]["n_docs"] == 3
        spans = [(s["off"], s["len"]) for s in rows[0]["doc_spans"]]
        # remainder docs keep their slots; batch doc fills the tail
        assert spans[0][0] == 0 and sum(ln for _o, ln in spans) == L
        # the first 5 tokens are batch 1's docs (md5 order WITHIN the
        # batch — doc-contiguous, but not doc-id order), the tail is
        # the batch-2 doc's prefix
        prefix = [t.split("_")[0] for t in rows[0]["input_ids"][:5]]
        assert sorted(prefix) == ["t1"] * 3 + ["t2"] * 2
        assert len(set(prefix[:spans[0][1]])) == 1  # doc-contiguous
        assert [t.split("_")[0] for t in rows[0]["input_ids"][5:]] == (
            ["t3"] * 3
        )

    def test_finalize_flushes_partial_without_consuming(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming.packing import (
            finalize_training_tape,
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        training_sequences_append(
            spark, _docs(spark, [(1, 11)]), "toks", state,
            batch_id=1, seq_len=L,
        )
        tail = finalize_training_tape(spark, state, pad_value="<pad>")
        row = tail.first()
        assert row["seq_id"] == 1 and row["n_tokens"] == 3
        assert list(row["input_ids"]) == [
            "t1_8", "t1_9", "t1_10", "<pad>", "<pad>", "<pad>", "<pad>",
            "<pad>",
        ]
        # read-only: appending after finalize continues the tape
        out = training_sequences_append(
            spark, _docs(spark, [(2, 5)]), "toks", state,
            batch_id=2, seq_len=L,
        )
        assert [r["seq_id"] for r in out.collect()] == [1]


class TestReplayAndMarkers:
    def test_replayed_batch_recomputes_without_advancing(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming._state import current_version
        from cod_stats_spark.streaming.packing import (
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        training_sequences_append(
            spark, _docs(spark, [(1, 7), (2, 5)]), "toks", state,
            batch_id=1, seq_len=L,
        )
        first = {
            r["seq_id"]: tuple(r["input_ids"])
            for r in training_sequences_append(
                spark, _docs(spark, [(3, 9)]), "toks", state,
                batch_id=2, seq_len=L,
            ).collect()
        }
        v = current_version(state)
        replay = {
            r["seq_id"]: tuple(r["input_ids"])
            for r in training_sequences_append(
                spark, _docs(spark, [(3, 9)]), "toks", state,
                batch_id=2, seq_len=L,
            ).collect()
        }
        assert replay == first
        assert current_version(state) == v  # state did not advance

    def test_tape_params_frozen_by_marker(self, spark, tmp_path):
        from cod_stats_spark.streaming.packing import (
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        training_sequences_append(
            spark, _docs(spark, [(1, 7)]), "toks", state,
            batch_id=1, seq_len=L,
        )
        with pytest.raises(ValueError, match="frozen"):
            training_sequences_append(
                spark, _docs(spark, [(2, 7)]), "toks", state,
                batch_id=2, seq_len=L + 1,
            )
        with pytest.raises(ValueError, match="frozen"):
            training_sequences_append(
                spark, _docs(spark, [(2, 7)]), "toks", state,
                batch_id=2, seq_len=L, salt="other",
            )

    def test_empty_batch_commits_and_preserves_cursor(
        self, spark, tmp_path
    ):
        from cod_stats_spark.streaming.packing import (
            training_sequences_append,
        )

        state = str(tmp_path / "tape")
        training_sequences_append(
            spark, _docs(spark, [(1, 5)]), "toks", state,
            batch_id=1, seq_len=L,
        )
        empty = training_sequences_append(
            spark, _docs(spark, []), "toks", state, batch_id=2, seq_len=L,
        )
        assert empty.count() == 0
        out = training_sequences_append(
            spark, _docs(spark, [(2, 3)]), "toks", state,
            batch_id=3, seq_len=L,
        )
        rows = out.collect()
        assert len(rows) == 1 and rows[0]["n_docs"] == 2


def test_null_segment_rejected(spark):
    """r12 review: a null segment value must raise, not TypeError in
    the driver sort or silently drop docs at the offset join."""
    import pytest

    from cod_stats_spark.operators.packing import training_sequences

    df = spark.createDataFrame(
        [(1, ["a", "b"], 1), (2, ["c", "d"], None)],
        "doc_id long, toks array<string>, batch int",
    )
    with pytest.raises(ValueError, match="nulls"):
        training_sequences(df, "toks", seq_len=2, segment_col="batch")


def test_stream_pack_prunes_cursor_versions(spark, tmp_path):
    """r15: prune_keep_last on the stream wrapper bounds the cursor
    state's version dirs to the newest two (the in-flight epoch's
    replay reads version N−1, so 2 is the floor the wrapper clamps
    to) while the packed output stays byte-identical to the unpruned
    run."""
    import os

    from cod_stats_spark.streaming.packing import stream_pack_to_tape

    src = tmp_path / "in"
    for b, rows in enumerate(BATCHES, start=1):
        _docs(spark, rows).coalesce(1).write.parquet(f"{src}/b{b}")
        t = 1_700_000_000 + b
        for root, _dirs, names in os.walk(f"{src}/b{b}"):
            for n in names:
                os.utime(os.path.join(root, n), (t, t))

    def run(tag, prune):
        stream = spark.readStream.schema(
            "doc_id long, toks array<string>"
        ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
        out = str(tmp_path / f"out_{tag}")
        tape = str(tmp_path / f"tape_{tag}")
        q = stream_pack_to_tape(
            stream, "toks", tape, out, seq_len=L,
            checkpoint_path=str(tmp_path / f"ckpt_{tag}"),
            prune_keep_last=prune,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = {
            r["seq_id"]: tuple(r["input_ids"])
            for r in spark.read.parquet(out)
            .select("seq_id", "input_ids").collect()
        }
        vdirs = [n for n in os.listdir(tape) if n.startswith("v=")]
        return got, sorted(vdirs)

    got_p, v_p = run("pruned", 1)  # clamps to 2
    got_u, v_u = run("unpruned", None)
    assert got_p == got_u
    assert len(v_u) == len(BATCHES)   # one snapshot per epoch, forever
    assert len(v_p) == 2              # bounded


def test_stream_pack_to_tape(spark, tmp_path):
    """The streaming wrapper: per-epoch batch=<id> window dirs whose
    union equals the segmented one-shot tape's completed windows;
    seq_ids stay globally absolute across epochs."""
    import os

    from cod_stats_spark.operators.packing import training_sequences
    from cod_stats_spark.streaming.packing import stream_pack_to_tape

    src = tmp_path / "in"
    for b, rows in enumerate(BATCHES, start=1):
        _docs(spark, rows).coalesce(1).write.parquet(f"{src}/b{b}")
        # the file source orders by modification time with no
        # tie-break — force strictly increasing mtimes so epoch e
        # deterministically consumes file b{e+1} (r12 review)
        t = 1_700_000_000 + b
        for root, _dirs, names in os.walk(f"{src}/b{b}"):
            for n in names:
                os.utime(os.path.join(root, n), (t, t))
    stream = spark.readStream.schema(
        "doc_id long, toks array<string>"
    ).option("maxFilesPerTrigger", 1).parquet(f"{src}/*")
    out = str(tmp_path / "out")
    q = stream_pack_to_tape(
        stream, "toks", str(tmp_path / "tape"), out,
        seq_len=L, checkpoint_path=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert any(
        n.startswith("batch=") for n in os.listdir(out)
    )
    got = {
        r["seq_id"]: tuple(r["input_ids"])
        for r in spark.read.parquet(out)
        .select("seq_id", "input_ids")
        .collect()
    }
    # reference: the segmented one-shot over the files in epoch order
    # (maxFilesPerTrigger=1 + glob order: epoch e consumed file b{e+1})
    epochs = sorted(
        int(n.split("=")[1]) for n in os.listdir(out)
        if n.startswith("batch=")
    )
    union = None
    for e in epochs:
        part = spark.read.parquet(f"{src}/b{e + 1}").withColumn(
            "batch", F.lit(e)
        )
        union = part if union is None else union.unionByName(part)
    want = {
        r["seq_id"]: tuple(r["input_ids"])
        for r in training_sequences(
            union, "toks", seq_len=L, segment_col="batch"
        ).collect()
    }
    assert got == want and len(got) == 6
