"""In-place compaction for append-only streaming state trees.

Every append-only state this package maintains — the lexical dedup
index (``fingerprints/pb=K``, ``bands/pb=K``), the semantic-dedup
state (``cluster=K``), per-batch output fragments — accrues one small
parquet file per micro-batch per partition, forever. Probe cost then
grows with FILE COUNT even when partition pruning keeps the read
row-bounded (listing + per-file open dominates; the r11
probe-flatness audit shows the scan task count climbing batch over
batch). This module is the maintenance half of the bargain: rewrite a
tree's partitions down to one file each, in place, without breaking
the replay contract.

Crash-safety WITHOUT renames (the _state.py doctrine — no atomic
rename on object stores): compaction

1. snapshots the tree's current data-file list,
2. reads the tree, drops exact-duplicate rows, and APPENDS the
   compacted rows as new files (one per partition, via a repartition
   on the partition column),
3. deletes exactly the snapshotted old files.

A crash between (2) and (3) leaves rows duplicated across old and new
files — harmless by the replay doctrine these trees already obey
(duplicate index/state rows make the same probe decisions; the next
compaction's dropDuplicates collapses them). A crash mid-(3) likewise.
The ``b`` replay tags are ordinary data columns and survive verbatim;
``_APPLIED`` / ``_LAYOUT`` markers are untouched (only data files are
snapshotted and deleted).

Single-writer contract (same as the appends themselves): run
compaction from the serialized maintenance loop that owns the state
dir — foreachBatch between batches, or a paused stream. A probe
scanning the tree concurrently with step (3) could hit a deleted
file; the owner loop never does.

Exact-duplicate-row collapse is SAFE for these trees by construction:
two distinct documents never share a full row (ids differ), so the
only full-row duplicates are replay/compaction residue. It would NOT
be safe for trees whose row multiplicity is meaningful — don't point
this at an event log.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cod_stats_spark.streaming._state import _fs_for


def _data_files(fs, path: str) -> list[str]:
    """Parquet data files under ``path`` — markers (_APPLIED, _LAYOUT,
    _SUCCESS, _COMMIT) and hidden staging files are never touched."""
    out = []
    for p in fs.list_files(path):
        name = p.rsplit("/", 1)[-1]
        if name.startswith(("_", ".")):
            continue
        out.append(p)
    return out


def compact_state_tree(
    spark: SparkSession,
    path: str,
    partition_col: str | None = None,
    target_files: int = 1,
) -> dict:
    """Compact one append-only parquet tree in place. Returns counts
    ``{"files_before": n, "files_after": m}``; a missing, empty, or
    already-compact tree is a no-op.

    ``partition_col``: the tree's Hive partition column (``pb`` for
    the dedup index, ``cluster`` for semantic state, ``batch`` for
    per-epoch fragment trees) — compacted rows land back in their own
    partition directory, ``target_files`` files per partition (1
    default). None = an unpartitioned tree, compacted to
    ``target_files`` files total.
    """
    fs = _fs_for(spark, path)
    if not fs.exists(path):
        return {"files_before": 0, "files_after": 0, "rows": 0}
    old = _data_files(fs, path)
    # no-op check is PER LEAF DIR, not total: an already-compact
    # 64-bucket tree has 64 files — comparing the total to
    # target_files would re-read, re-write, and re-delete the whole
    # index every maintenance cycle for zero net change
    per_dir: dict[str, int] = {}
    for p in old:
        d = p.rsplit("/", 1)[0]
        per_dir[d] = per_dir.get(d, 0) + 1
    tgt = max(int(target_files), 1)
    if not old or max(per_dir.values()) <= tgt:
        return {"files_before": len(old), "files_after": len(old)}
    # scope the rewrite to the OVER-TARGET directories only: a
    # scheduled in-loop compaction (compact_every) would otherwise
    # re-read and re-write the WHOLE tree every cycle because one
    # freshly appended dir has 2 files — per-cycle cost must be
    # proportional to the touched partitions, not the total state.
    # Duplicate rows can only ever coexist WITHIN one directory (a
    # row's partition value is a function of the row), so per-dir
    # dropDuplicates collapses exactly what whole-tree would.
    n_before = len(old)
    over = sorted(d for d, c in per_dir.items() if c > tgt)
    partial = (
        partition_col is not None
        and len(over) < len(per_dir)
        and all(d.rsplit("/", 1)[-1].count("=") == 1 for d in over)
    )
    if partial:
        # `old` (the files to delete after the rewrite) narrows to the
        # touched dirs; the before/after counts stay whole-tree
        read_from, old = over, [
            p for p in old if p.rsplit("/", 1)[0] in set(over)
        ]
    else:
        read_from = [path]
    # mergeSchema: a legacy mixed-schema tree (pre-replay-tag files
    # without the 'b' column under newer tagged files) must not let
    # one b-less footer win schema inference — the rewrite would
    # silently drop every replay tag. Merged, legacy rows read
    # b=null (foreign history, exactly how the probes treat them).
    df = (
        spark.read.option("mergeSchema", "true")
        .option("basePath", path)  # keep the partition column when
        .parquet(*read_from)       # reading leaf dirs directly
        .dropDuplicates()
    )
    if partition_col is not None:
        if partition_col not in df.columns:
            raise ValueError(
                f"compact_state_tree: {path} has no partition column "
                f"{partition_col!r} (columns: {df.columns})"
            )
        if tgt == 1:
            # all rows of one partition value in one task -> exactly
            # one file per pb=/cluster=/batch= directory
            shuffled = df.repartition(F.col(partition_col))
        else:
            # deterministic content salt (no rand — replay-safe):
            # up to target_files tasks, hence files, per directory.
            # Explicit numPartitions: without it AQE coalesces the
            # small post-shuffle partitions back into one task and
            # the salt never splits anything
            salt = F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]),
                F.lit(tgt),
            )
            # hash partitioning guarantees the UPPER bound (a salt
            # group never splits across tasks); two groups hashing to
            # the same task merge into one file, so keep the task
            # count well above the group count to make that rare
            n_shuffle = max(
                int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
                64 * tgt,
            )
            shuffled = df.repartition(
                n_shuffle, F.col(partition_col), salt
            )
        writer = shuffled.write.mode("append").partitionBy(partition_col)
    else:
        writer = df.coalesce(tgt).write.mode("append")
    # the append is an action: every old file is fully read and the
    # compacted files are durable BEFORE any delete below
    writer.parquet(path)
    for p in old:
        fs.delete(p)
    new = _data_files(fs, path)
    return {"files_before": n_before, "files_after": len(new)}


def compact_dedup_index(spark: SparkSession, index_path: str) -> dict:
    """Compact both halves of an incremental lexical dedup index
    (streaming/dedup.py), following the tree's own recorded layout —
    bucketed trees keep their pb= partitioning, legacy flat trees
    compact flat. _LAYOUT and _APPLIED markers are preserved."""
    import os

    from cod_stats_spark.streaming.dedup import _LAYOUT_RE, _index_layout

    fs = _fs_for(spark, index_path)
    if not fs.exists(index_path):
        return {}
    names = fs.list_names(index_path)
    if not any(_LAYOUT_RE.match(n) for n in names) and not any(
        n in ("fingerprints", "bands") for n in names
    ):
        return {}  # nothing indexed yet; don't create a layout marker
    nf, nb = _index_layout(fs, index_path, None, None)
    out = {}
    for sub, buckets in (("fingerprints", nf), ("bands", nb)):
        out[sub] = compact_state_tree(
            spark,
            os.path.join(index_path, sub),
            partition_col="pb" if buckets else None,
        )
    return out


def compact_semantic_state(spark: SparkSession, state_path: str) -> dict:
    """Compact a semantic-dedup state tree (streaming/semantic.py) —
    cluster-partitioned, ``b`` replay tags preserved."""
    return compact_state_tree(spark, state_path, partition_col="cluster")
