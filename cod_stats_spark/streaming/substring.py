"""Incremental exact-substring dedup — batch-append against a
persisted gram census.

The streaming posture of :mod:`operators.substring`: documents
already shipped are immutable, so the only coherent append semantics
is KEEP-FIRST-IN-TIME — a passage's first-ever shipped occurrence
stands, and every later occurrence (in the same batch or any later
one) is scrubbed before shipping. State is the gram census
(gh, cnt): O(distinct grams) rows, merged by count sum per batch
under the versioned-rewrite protocol (streaming/_state.py).

Per batch:

1. the batch's positional gram sites (one row per token);
2. census merge: old (gh, cnt) ⊎ batch counts — also carrying the
   OLD count per gram, because exemption needs it;
3. a batch site is duplicated when the MERGED count reaches
   ``min_count``; it is exempt (kept) only when it is the batch's
   first site of that gram AND the gram was never seen before
   (old count 0) — i.e. it is the first occurrence in shipped
   history;
4. island merge + span removal on the batch docs only;
5. census state written (new version, atomic repoint).

Equality contract (tested): when batches arrive with increasing doc
ids, the sequential outputs equal the one-shot
``substring_dedup(union, keep_first=True)`` — the packed-key global
argmin then coincides with first-in-time.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cod_stats_spark.operators.substring import (
    _PACK,
    duplicate_spans,
    gram_sites,
    remove_spans,
)
from cod_stats_spark.streaming._state import read_state, write_state

_CENSUS_SCHEMA = "gh long, cnt long"


def substring_batch_against_corpus(
    spark: SparkSession,
    batch: DataFrame,
    census_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
    base_hash: str = "xxhash64",
    batch_id: int | None = None,
) -> DataFrame:
    """One incremental step: returns the batch's rows as
    (id, clean_text, n_spans, n_dup_tokens) with every
    already-shipped-or-earlier passage removed, and advances the
    census state. Ids must be globally unique and < 2^31 (the packed
    site key contract).

    ``batch_id``: pass the stable micro-batch/epoch id when calling
    from an at-least-once loop (foreachBatch). Each census commit is
    tagged with its batch id IN THE COMMIT MARKER NAME (one atomic
    directory entry carries both — streaming/_state.py), so a replayed
    batch id is detected, re-scrubs against the SNAPSHOT it originally
    read (the tagged version minus one), and skips the merge: the
    count-additive census never double-counts (a replay would
    otherwise see the batch's own counts as 'already shipped' and
    scrub its first occurrences), and the replayed output equals the
    original. Without a batch_id every call merges — correct only for
    calls that genuinely happen once.
    Epoch-id scope: batch ids are only stable within ONE streaming
    checkpoint lineage. Restarting a stream WITHOUT its checkpoint
    (epoch ids reset to 0) against an existing state dir would make
    new batches look like replays of old ones — pair each state dir
    with exactly one checkpoint for its lifetime, or start a fresh
    state dir with a fresh checkpoint.
    """
    from cod_stats_spark.streaming._state import _fs_for, find_version_by_note

    note = None if batch_id is None else f"b{int(batch_id)}"
    # the marker lookup must go through the SAME filesystem the commit
    # wrote to (local os only for plain paths — a schemed census_dir
    # would otherwise never detect its replays)
    applied_v = (
        find_version_by_note(census_dir, note, fs=_fs_for(spark, census_dir))
        if note is not None
        else None
    )
    sites = gram_sites(batch, text_col, id_col, n, base_hash)
    batch_census = sites.groupBy("gh").agg(
        F.count(F.lit(1)).alias("_new"),
        F.min(F.col(id_col) * F.lit(_PACK) + F.col("pos")).alias("_first"),
    )
    if applied_v is not None:
        # replay: the batch's commit wrote version applied_v, so it
        # READ applied_v − 1 (single-writer, versions are sequential)
        old = (
            spark.read.parquet(f"{census_dir}/v={applied_v - 1}")
            if applied_v >= 1
            else None
        )
    else:
        old = read_state(spark, census_dir)
    if old is None:
        old = spark.createDataFrame([], _CENSUS_SCHEMA)
    merged = (
        batch_census.join(
            old.select("gh", F.col("cnt").alias("_old")), "gh", "left"
        )
        .withColumn("_old", F.coalesce(F.col("_old"), F.lit(0)))
        .withColumn("_cnt", F.col("_old") + F.col("_new"))
    )
    # localCheckpoint: the mark join below must read the census built
    # against the OLD state even though write_state advances it in
    # the same function — and the downstream action happens on the
    # RETURNED frame, after that advance
    merged = merged.localCheckpoint(eager=True)
    dup = merged.where(F.col("_cnt") >= min_count)
    marked = (
        sites.join(dup, "gh")
        .where(
            ~(
                (F.col("_old") == 0)
                & (
                    F.col(id_col) * F.lit(_PACK) + F.col("pos")
                    == F.col("_first")
                )
            )
        )
        .select(id_col, "pos")
    )
    spans = duplicate_spans(marked, id_col, n)
    cleaned = remove_spans(batch, spans, text_col, id_col)
    if applied_v is None:
        # new census = grams untouched by this batch ∪ the merged
        # counts (merged alone would DROP every old gram absent from
        # the batch); the old snapshot stays on disk, so the lazy
        # anti-join is safe to evaluate inside write_state's action
        untouched = old.join(batch_census.select("gh"), "gh", "left_anti")
        write_state(
            untouched.unionByName(
                merged.select("gh", F.col("_cnt").alias("cnt"))
            ),
            census_dir,
            note=note,
        )
    return cleaned


def stream_substring_dedup(
    docs_stream: DataFrame,
    census_dir: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 50,
    min_count: int = 2,
    base_hash: str = "xxhash64",
    checkpoint_path: str | None = None,
):
    """foreachBatch wrapper: each micro-batch scrubs against shipped
    history and writes its cleaned rows to ``out_path/batch=<epoch>``
    (deterministic per-epoch location, overwritten on replay — an
    at-least-once re-execution rewrites its own rows instead of
    double-appending to a shared path; the curation fragment pattern).
    Readers take the tree root — ``batch`` comes back as the
    partition column. A tree created by the pre-r11 flat-append
    layout keeps that shape (and its double-append-on-replay caveat)
    — mixed layouts don't read. Returns the StreamingQuery."""
    from cod_stats_spark.streaming._state import legacy_flat_output

    # decided on the first non-empty batch, then cached
    _legacy: list[bool] = []

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cleaned = substring_batch_against_corpus(
            batch_df.sparkSession, batch_df, census_dir,
            text_col, id_col, n, min_count, base_hash,
            batch_id=int(epoch_id),
        )
        if not _legacy:
            _legacy.append(
                legacy_flat_output(batch_df.sparkSession, out_path)
            )
        if _legacy[0]:
            # the flat layout always carried batch as a DATA column
            # (the partitioned layout gets it from the dir name)
            cleaned.withColumn(
                "batch", F.lit(int(epoch_id))
            ).write.mode("append").parquet(out_path)
        else:
            cleaned.write.mode("overwrite").parquet(
                os.path.join(out_path, f"batch={int(epoch_id)}")
            )

    writer = docs_stream.writeStream.foreachBatch(batch_fn).outputMode(
        "append"
    )
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
