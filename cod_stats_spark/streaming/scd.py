"""Streaming SCD2 maintenance — a change stream folds into a
persisted dimension table, one `scd2_apply` per micro-batch.

The dimension is REWRITTEN per batch (interval closes touch existing
rows — append-only state, the trick the incremental-dedup index uses,
cannot express that), so state lives in a versioned directory tree:

    state_dir/
      _CURRENT          <- text file holding the live version number
      v=3/…parquet      <- immutable snapshot per applied batch

Each batch reads the version named by ``_CURRENT``, applies, writes
the NEW version dir (never touching the one it read — no
read-overwrite conflict with Spark's lazy plans), then repoints
``_CURRENT`` with an atomic rename. A crash between write and
repoint leaves a dangling dir the next run overwrites; a crash after
repoint is durable. foreachBatch replays (at-least-once) are
absorbed by ``scd2_apply(dedupe=True)``: a re-delivered change row
collides with its own reverted dim row on (key, ts) and dedups away.

This is the production shape for the reference's overwrite-on-ingest
lookup tables generalized to keep history (SURVEY §1.4 / §2.9): the
stream is the ingest feed, the versioned dim is the silver table
downstream point-in-time lookups (`scd2_lookup`) read.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from cod_stats_spark.operators.scd import scd2_apply, scd2_build
from cod_stats_spark.streaming._state import read_state, write_state


def read_scd2_dim(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The live dimension snapshot, or None before the first batch."""
    return read_state(spark, state_dir)


def apply_scd2_batch(
    spark: SparkSession,
    batch: DataFrame,
    state_dir: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse: bool = False,
    prune_keep_last: int | None = None,
) -> None:
    """Fold one change batch into the persisted dimension (versioned
    state protocol: streaming/_state.py). collapse defaults False —
    the exact apply==rebuild regime for arbitrary batch interleaving
    (operators/scd.scd2_apply docstring).

    ``prune_keep_last`` (r15): bound version retention to the newest
    N snapshots after each apply (streaming/_state.
    prune_state_versions). Each version is a FULL dimension copy, so
    an unpruned long-lived stream retains O(dim size × batches).
    SCD2 replay safety does not depend on old snapshots at all — a
    re-delivered batch re-applies idempotently against the CURRENT
    dimension (``dedupe=True`` absorbs the collision) — so even
    ``keep_last=1`` is replay-safe here; ``2`` keeps one rollback
    step by convention."""
    if batch.isEmpty():
        return
    dim = read_state(spark, state_dir)
    if dim is None:
        new_dim = scd2_build(batch, key_cols, ts_col, attr_cols, collapse=collapse)
    else:
        new_dim = scd2_apply(
            dim, batch, key_cols, ts_col, attr_cols,
            collapse=collapse, dedupe=True,
        )
    write_state(new_dim, state_dir)
    if prune_keep_last is not None:
        from cod_stats_spark.streaming._state import (
            _fs_for,
            prune_state_versions,
        )

        prune_state_versions(
            state_dir, keep_last=max(1, int(prune_keep_last)),
            fs=_fs_for(spark, state_dir),
        )


def stream_scd2_apply(
    changes_stream: DataFrame,
    state_dir: str,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    collapse: bool = False,
    checkpoint_path: str | None = None,
    prune_keep_last: int | None = None,
):
    """Run the maintenance loop as a Structured Streaming sink:
    foreachBatch -> apply_scd2_batch (``prune_keep_last`` passes
    through — see there). Returns the StreamingQuery."""
    key_cols, attr_cols = list(key_cols), list(attr_cols)

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        apply_scd2_batch(
            batch_df.sparkSession, batch_df, state_dir,
            key_cols, ts_col, attr_cols, collapse=collapse,
            prune_keep_last=prune_keep_last,
        )

    writer = (
        changes_stream.writeStream.foreachBatch(batch_fn)
        .outputMode("append")
    )
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
