"""Incremental training-sequence packing: append document batches to
a persistent token TAPE whose completed windows never move.

The one-shot :func:`operators.packing.training_sequences` lays every
doc on the md5 tape and re-splits from offset zero — appending a
batch would shift every window after the insertion points (the md5
order interleaves new keys among old ones), i.e. a full re-pack per
corpus change. The append posture here freezes shipped windows
instead: the tape is SEGMENT-major — batch 1's docs (md5-ordered
within the batch), then batch 2's, … — and the state dir carries a
tape CURSOR: total tokens laid so far plus the trailing partial
window (its tokens AND its per-doc spans, both < seq_len — bounded
driver state). An appended batch packs into windows continuing from
the cursor: the partial window completes first (its doc boundaries
preserved), then the batch's own windows follow at absolute seq_ids.

Equivalence contract (tested): sequential appends over batches
1..k produce EXACTLY the full windows of one
``training_sequences(union, segment_col='batch')`` run — no
ids-increase condition needed, because the segment-major order IS the
arrival order (unlike the census keep-first contract, nothing about
the md5 interleave is assumed).

State protocol: versioned snapshots via streaming/_state (manifest-
last ``_COMMIT.v{N}`` markers, rename-free); each commit is tagged
with its batch id in the marker NAME, so an at-least-once replay is
detected, recomputes its output from the snapshot it originally read
(tagged version − 1), and skips the state advance — replayed output
== original output, state never double-advances (the census replay
discipline, streaming/substring.py). Tape parameters (seq_len, salt,
num_buckets) are frozen per state dir by a ``_TAPE`` marker validated
on every call — a mismatch would silently misalign every subsequent
window (the ``_SKETCH`` marker discipline, streaming/dedup.py).
``with_spans`` is deliberately NOT in the marker: the cursor always
stores the remainder's spans, so spans on/off is a per-call OUTPUT
option, not a tape-lifetime parameter.

Scale shape per batch: the shared tape machinery
(operators/packing.tape_piece_rows) over the BATCH only — slice rows
≈ batch_docs + batch_tokens/seq_len, one seq_id shuffle with
≤ seq_len payloads; the remainder injection is ≤ seq_len tokens of
literal rows; state I/O is one 1-row snapshot. Nothing rereads the
shipped corpus.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cod_stats_spark.operators.packing import (
    assemble_windows,
    tape_piece_rows,
)
from cod_stats_spark.streaming._state import (
    _fs_for,
    find_version_by_note,
    read_state,
    write_state,
)

__all__ = [
    "training_sequences_append",
    "finalize_training_tape",
    "stream_pack_to_tape",
]


def _tape_marker(L: int, salt: str, num_buckets: int) -> str:
    s = zlib.crc32(salt.encode("utf-8")) & 0xFFFFFFFF
    return f"_TAPE.L{int(L)}.s{s:08x}.nb{int(num_buckets)}"


def _check_tape_marker(
    spark: SparkSession, state_dir: str, L: int, salt: str, num_buckets: int
) -> None:
    fs = _fs_for(spark, state_dir)
    want = _tape_marker(L, salt, num_buckets)
    have = [n for n in fs.list_names(state_dir) if n.startswith("_TAPE.")]
    if not have:
        fs.mkdirs(state_dir)
        fs.create_text(f"{state_dir}/{want}", "")
        return
    if want not in have:
        raise ValueError(
            "training_sequences_append: tape parameters differ from the "
            f"state dir's frozen marker ({have[0]!r} vs {want!r}) — "
            "seq_len/salt/num_buckets are fixed for a tape's lifetime "
            "(changing them mid-tape would misalign every later window)"
        )


def _cursor_schema(elem_type: str) -> str:
    return (
        "tokens_total bigint, "
        f"rem array<{elem_type}>, "
        "rem_spans array<struct<off:int,len:int>>"
    )


def training_sequences_append(
    spark: SparkSession,
    batch: DataFrame,
    tokens_col: str,
    state_dir: str,
    batch_id: int | None = None,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    salt: str = "pack",
    num_buckets: int = 256,
    with_spans: bool = False,
) -> DataFrame:
    """Pack one batch onto the persistent tape; return the COMPLETED
    windows this batch closes (absolute ``seq_id`` — earlier shipped
    windows are never touched or re-emitted) and advance the cursor.

    Output schema matches :func:`operators.packing.training_sequences`
    with ``drop_last=True``: (seq_id, input_ids, n_docs, n_tokens
    [, doc_spans]) — ``n_docs``/``doc_spans`` count REAL document
    slices across the batch boundary (the completing window's
    remainder docs keep their identity, exactly as the one-shot
    segmented run emits them). The trailing partial window stays in
    the cursor; :func:`finalize_training_tape` flushes it at end of
    corpus.

    ``batch_id``: pass the stable epoch id from an at-least-once loop
    — replays recompute the same output from the pre-commit snapshot
    and skip the state advance (module docstring).
    """
    L = int(seq_len)
    if L < 1:
        raise ValueError("training_sequences_append: seq_len must be >= 1")
    _check_tape_marker(spark, state_dir, L, salt, num_buckets)
    elem = dict(batch.dtypes)[tokens_col]
    if not (elem.startswith("array<") and elem.endswith(">")):
        raise ValueError(
            f"training_sequences_append: {tokens_col} must be an array "
            f"column, got {elem}"
        )
    elem = elem[len("array<"):-1]

    note = None if batch_id is None else f"b{int(batch_id)}"
    applied_v = (
        find_version_by_note(state_dir, note, fs=_fs_for(spark, state_dir))
        if note is not None
        else None
    )
    if applied_v is not None:
        # replay: this batch's commit wrote version applied_v, so it
        # READ applied_v − 1 (single-writer, sequential versions)
        cursor = (
            spark.read.parquet(f"{state_dir}/v={applied_v - 1}")
            if applied_v >= 1
            else None
        )
    else:
        cursor = read_state(spark, state_dir)
    if cursor is None:
        tokens_total, rem, rem_spans = 0, [], []
    else:
        row = cursor.first()
        tokens_total = int(row["tokens_total"])
        rem = list(row["rem"])
        rem_spans = [(int(s["off"]), int(s["len"])) for s in row["rem_spans"]]

    base = tokens_total
    prev_full = (tokens_total - len(rem)) // L

    pieces = tape_piece_rows(
        batch, tokens_col, id_col, L, salt, num_buckets,
        with_spans=True, base_offset=base,
    )
    if rem:
        # re-inject the open window's doc slices at negative _ord so
        # they sort before every batch piece (_ord = start ≥ base ≥ 0)
        # and keep their doc identity for n_docs / doc_spans
        inj_rows = [
            (
                int(prev_full),
                i - len(rem_spans),
                rem[off:off + ln],
                (off, ln),
            )
            for i, (off, ln) in enumerate(rem_spans)
        ]
        inj = spark.createDataFrame(
            inj_rows,
            f"seq_id bigint, _ord bigint, _piece array<{elem}>, "
            "_span struct<off:int,len:int>",
        )
        pieces = inj.unionByName(pieces)
    seqs = assemble_windows(pieces, with_spans=True)
    if not with_spans:
        out = seqs.where(F.col("n_tokens") == L).drop("doc_spans")
    else:
        out = seqs.where(F.col("n_tokens") == L)
    # the state advance must not depend on lazily re-running the
    # batch plan after the snapshot moves — pin the emitted windows
    # and the new cursor before writing state (census discipline)
    out = out.localCheckpoint(eager=True)

    if applied_v is None:
        batch_tokens = (
            batch.select(
                F.sum(
                    F.when(
                        F.col(tokens_col).isNotNull(),
                        F.size(F.col(tokens_col)),
                    ).otherwise(0)
                ).cast("bigint")
            ).first()[0]
            or 0
        )
        new_total = tokens_total + int(batch_tokens)
        partial = seqs.where(F.col("n_tokens") < L).select(
            "input_ids", "doc_spans"
        ).collect()
        if len(partial) > 1:  # pragma: no cover - contiguity invariant
            raise AssertionError(
                "training_sequences_append: more than one partial window"
            )
        if partial:
            new_rem = list(partial[0]["input_ids"])
            new_spans = [
                (int(s["off"]), int(s["len"]))
                for s in partial[0]["doc_spans"]
            ]
        else:
            new_rem, new_spans = [], []
        state_row = spark.createDataFrame(
            [(new_total, new_rem, new_spans)], _cursor_schema(elem)
        )
        write_state(state_row, state_dir, note=note)
    return out


def finalize_training_tape(
    spark: SparkSession,
    state_dir: str,
    pad_value=None,
    with_spans: bool = False,
) -> DataFrame | None:
    """Flush the tape's trailing partial window (end-of-corpus):
    returns it as a one-row DataFrame — right-padded to ``seq_len``
    with ``pad_value`` when given, as-is otherwise — or None when the
    tape is empty or ends exactly on a window boundary. Read-only:
    the cursor is NOT consumed (a later append continues the tape;
    re-finalizing yields the same row)."""
    cursor = read_state(spark, state_dir)
    if cursor is None:
        return None
    row = cursor.first()
    rem = list(row["rem"])
    if not rem:
        return None
    fs = _fs_for(spark, state_dir)
    tape = [n for n in fs.list_names(state_dir) if n.startswith("_TAPE.")]
    L = int(tape[0].split(".")[1][1:]) if tape else len(rem)
    seq_id = (int(row["tokens_total"]) - len(rem)) // L
    ids = rem + (
        [pad_value] * (L - len(rem)) if pad_value is not None else []
    )
    spans = [
        (int(s["off"]), int(s["len"])) for s in row["rem_spans"]
    ]
    cols = [
        (seq_id, ids, len(spans), len(rem))
        + ((spans,) if with_spans else ())
    ]
    elem = cursor.schema["rem"].dataType.elementType.simpleString()
    schema = (
        f"seq_id bigint, input_ids array<{elem}>, n_docs bigint, "
        "n_tokens int"
    )
    if with_spans:
        schema += ", doc_spans array<struct<off:int,len:int>>"
    return spark.createDataFrame(cols, schema)


def stream_pack_to_tape(
    docs_stream: DataFrame,
    tokens_col: str,
    state_dir: str,
    out_path: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    salt: str = "pack",
    num_buckets: int = 256,
    with_spans: bool = False,
    checkpoint_path: str | None = None,
    prune_keep_last: int | None = None,
):
    """Structured-Streaming wrapper: each micro-batch packs onto the
    persistent tape with the epoch id as the batch id, and the
    windows it completes land at ``out_path/batch=<epoch>`` —
    deterministic per-epoch location, OVERWRITTEN on replay, so an
    at-least-once re-execution rewrites its own rows instead of
    double-appending (the r11 streaming-sink convention; the append
    op itself recomputes a replayed epoch from the pre-commit cursor,
    so the rewritten content is identical). Readers take the tree
    root; ``seq_id`` stays globally absolute across epochs, so the
    union of all ``batch=`` dirs IS the tape prefix. Drain the
    trailing partial window at end of corpus with
    :func:`finalize_training_tape`. Returns the StreamingQuery.

    ``prune_keep_last`` (r15): bound the cursor state's version
    retention to the newest N snapshots per batch
    (streaming/_state.prune_state_versions — the funnel censuses'
    maintenance knob applied to this writer). Each cursor version is
    one tiny row, but a long-lived stream otherwise accretes one
    snapshot dir per epoch forever. ``2`` is the minimum that keeps
    the in-flight epoch replayable (a replay of batch N reads
    version N−1); deeper replays then fail loudly on the missing
    snapshot instead of recomputing against the wrong cursor.

    Epoch-id scope: as with every stateful wrapper here, pair ONE
    checkpoint with ONE state dir for their lifetime — restarting
    without the checkpoint resets epoch ids and makes new batches
    look like replays."""
    import os

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        # sibling-wrapper convention: an empty epoch does nothing — a
        # long-lived sparse stream must not accrete a state-snapshot
        # version, a commit marker, and an empty batch= dir per tick
        if batch_df.isEmpty():
            return
        out = training_sequences_append(
            batch_df.sparkSession,
            batch_df,
            tokens_col,
            state_dir,
            batch_id=int(epoch_id),
            id_col=id_col,
            seq_len=seq_len,
            salt=salt,
            num_buckets=num_buckets,
            with_spans=with_spans,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(out_path, f"batch={int(epoch_id)}")
        )
        if prune_keep_last is not None:
            from cod_stats_spark.streaming._state import (
                _fs_for,
                prune_state_versions,
            )

            prune_state_versions(
                state_dir,
                keep_last=max(2, int(prune_keep_last)),
                fs=_fs_for(batch_df.sparkSession, state_dir),
            )

    writer = docs_stream.writeStream.foreachBatch(batch_fn).outputMode(
        "append"
    )
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
