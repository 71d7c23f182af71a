"""Streaming incremental semantic dedup — new embeddings vs a growing
corpus (the SemDeDup analog of streaming/dedup.py).

Shipped documents are immutable, so the coherent append semantics is
SHIPPED-WINS (the keep-first-in-time rule the substring census uses):
a new document dies iff it has a ≥threshold cosine partner among the
already-kept members of its cluster — a better (farther-from-centroid)
newcomer cannot retract an already-shipped exemplar. Within the batch
itself the one-shot worse-side rule applies first (keep the farthest
from the centroid), so a batch is internally deduped exactly like
:func:`operators.semantic.semantic_dedup` before probing the state.

State: one append-only parquet tree per corpus, Hive-partitioned by
``cluster`` — a batch probe reads ONLY the clusters the batch touches
(partition pruning; the batch side is micro-batch-sized and
broadcastable). Centroids are FIXED for the corpus lifetime (train
once with ``clustering.kmeans_fit``, or re-train and rebuild — a
moving centroid would silently re-bucket history). Each survivor row
stores (id, v, n, cc) so probes never recompute norms or ranks.

Scale shape per batch: zero-shuffle assignment, one broadcast join
against the pruned state partitions, one within-batch cluster
self-join (micro-batch sized). Nothing about the existing state is
rewritten — the append is the only write.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cod_stats_spark.operators.semantic import semantic_dedup
from cod_stats_spark.operators.similarity import dot, norm
from cod_stats_spark.streaming._state import _fs_for, legacy_flat_output

_STATE_SCHEMA = "id long, v array<double>, n double, cc double, b long, cluster int"


def _pruned_state(
    spark: SparkSession, state_path: str, clusters: list[int]
) -> DataFrame:
    """The probe-side state scan, STATICALLY pruned to the batch's
    cluster set as a literal isin over the Hive partition column —
    provable partition pruning (PartitionFilters in the plan,
    asserted in tests/test_streaming_semantic.py), not the
    DPP-dependent semi join the r10 cut relied on (dynamic pruning
    Spark may or may not insert; if it didn't, the probe silently
    read the whole state)."""
    return (
        spark.read.schema(_STATE_SCHEMA)
        .parquet(state_path)
        .where(F.col("cluster").isin([int(c) for c in clusters]))
    )


def semantic_batch_against_corpus(
    spark: SparkSession,
    batch: DataFrame,
    state_path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    threshold: float = 0.95,
    batch_id: int | None = None,
) -> DataFrame:
    """One incremental step: the batch's surviving rows (with cluster
    + centroid_cosine), after within-batch SemDeDup and the
    shipped-wins probe against the state; survivors append to the
    state. Ids must be globally unique across batches (the ingest
    key contract shared with streaming/dedup.py).

    ``batch_id``: pass the stable epoch id from an at-least-once loop.
    Completed appends are recorded by an ``_APPLIED.b{id}`` marker
    (atomic directory-entry creation, the _state.py commit idiom, via
    the path's own filesystem — local or Hadoop); a replayed batch id
    skips the append. Independently, the probe ALWAYS excludes state
    rows tagged with this batch id — so a replay (marker present) and
    a retry after a mid-append crash (no marker, possibly partial
    rows durable under a direct committer) both score against exactly
    the pre-batch state instead of being killed by their own former
    selves at cosine 1.0. A crashed-then-retried append can leave
    duplicate exemplar rows in the state — harmless (the same vector
    twice makes the same kill decisions).
    Epoch-id scope: batch ids are only stable within ONE streaming
    checkpoint lineage. Restarting a stream WITHOUT its checkpoint
    (epoch ids reset to 0) against an existing state dir would make
    new batches look like replays of old ones — pair each state dir
    with exactly one checkpoint for its lifetime, or start a fresh
    state dir with a fresh checkpoint.
    """
    # 1. within-batch one-shot SemDeDup (worse-side drop, exact)
    local = semantic_dedup(batch, vec_col, id_col, centroids, threshold)

    # 2. shipped-wins probe: a batch survivor dies iff ANY state member
    # of its cluster clears the threshold. State is cluster-partitioned
    # — the semi-join prunes to the batch's clusters only.
    v = F.col(vec_col).cast("array<double>")
    probe = local.select(
        F.col(id_col).alias("_id"),
        v.alias("_v"),
        norm(v).alias("_n"),
        "cluster",
        "centroid_cosine",
    )
    fs = _fs_for(spark, state_path)
    marker = (
        None
        if batch_id is None
        else os.path.join(state_path, f"_APPLIED.b{int(batch_id)}")
    )
    applied = marker is not None and fs.exists(marker)
    probe = probe.persist()  # collected once for pruning, joined below
    if fs.exists(state_path):
        # the batch's distinct cluster set is micro-batch-bounded
        # (≤ min(|batch|, k) values) — collect it and prune the state
        # scan with a LITERAL partition predicate (static, provable)
        clusters = [
            r[0]
            for r in probe.select("cluster")
            .where(F.col("cluster").isNotNull())
            .distinct()
            .collect()
        ]
        state = _pruned_state(spark, state_path, clusters)
        if batch_id is not None:
            # own rows (full or partial, from a first run or a crashed
            # append) must never kill their own batch on re-execution
            state = state.where(
                F.col("b").isNull() | (F.col("b") != int(batch_id))
            )
        _raw = dot(F.col("_v"), F.col("v")) / (F.col("_n") * F.col("n"))
        pair_cos = F.round(
            F.when(
                (F.col("_n") * F.col("n") > 0) & ~F.isnan(_raw), _raw
            ).otherwise(F.lit(0.0)),
            6,
        )
        dead = (
            probe.join(state, "cluster")
            .where(pair_cos >= F.lit(float(threshold)))
            .select("_id")
            .distinct()
        )
        survivors = probe.join(dead, "_id", "left_anti")
    else:
        survivors = probe
    # pin before the append: the plan reads the state path, and the
    # append below would refreshByPath-invalidate a mere cache (the
    # streaming/dedup.py lesson)
    survivors = survivors.localCheckpoint(eager=True)
    probe.unpersist()
    if not applied:
        # null-cluster (null-embedding) survivors are returned to the
        # caller but NEVER enter the state: they can't participate in
        # any future probe, and appending them every batch would grow
        # dead state without bound
        # repartition on the partition column first — one file per
        # touched cluster dir per batch instead of one per (task,
        # cluster); state file count then grows with batches, not
        # batches × tasks (the streaming/dedup.py append discipline)
        survivors.where(F.col("cluster").isNotNull()).select(
            F.col("_id").alias("id"),
            F.col("_v").alias("v"),
            F.col("_n").alias("n"),
            F.col("centroid_cosine").alias("cc"),
            F.lit(-1 if batch_id is None else int(batch_id)).alias("b"),
            "cluster",
        ).repartition(F.col("cluster")).write.mode("append").partitionBy(
            "cluster"
        ).parquet(state_path)
        if marker is not None:
            # manifest-last: the marker's directory entry is the
            # atomic "this batch's exemplars are all durable" event
            fs.create_text(marker, str(int(batch_id)))
    out = survivors.select(
        F.col("_id").alias(id_col), "cluster", "centroid_cosine"
    )
    return batch.join(out, id_col)


def build_semantic_state(
    spark: SparkSession,
    corpus: DataFrame,
    state_path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "doc_id",
) -> int:
    """Bootstrap the semantic-dedup state from an EXISTING corpus —
    the backfill companion of :func:`streaming.dedup.build_dedup_index`
    (run once before incremental ingestion starts). The corpus is
    registered AS-IS (run :func:`operators.semantic.semantic_dedup`
    first if it still holds near-duplicates); every non-null-embedding
    row becomes a state exemplar with ``b = -1`` (pre-stream history —
    a real epoch id is never negative, so replay exclusion never
    touches bootstrap rows).

    Assignment + centroid cosine run through the SAME
    :func:`operators.semantic.centroid_ranked` projection the
    incremental path uses, so a bootstrap row is bit-identical to
    the row it would have written for the same document — a shared
    formula, not a synchronized copy.

    Crash-safe by rerun (state written with OVERWRITE); refuses a
    LIVE state tree (``_APPLIED`` markers present) for the same
    reason the index bootstrap does. Returns the exemplar count."""
    from cod_stats_spark.operators.clustering import kmeans_assign
    from cod_stats_spark.operators.semantic import centroid_ranked

    if not centroids:
        raise ValueError("build_semantic_state: centroids must be non-empty")
    fs = _fs_for(spark, state_path)
    if fs.exists(state_path) and any(
        n.startswith("_APPLIED.") for n in fs.list_names(state_path)
    ):
        raise ValueError(
            f"build_semantic_state: {state_path} is a LIVE state tree "
            "(_APPLIED markers present) — bootstrapping would erase "
            "ingested batches' exemplars; use a fresh state path"
        )
    v = F.col(vec_col).cast("array<double>")
    assigned = kmeans_assign(
        corpus.select(F.col(id_col).alias("_id"), v.alias("_v")),
        "_v",
        centroids,
    ).where(F.col("cluster").isNotNull())
    state_rows = centroid_ranked(spark, assigned, centroids).select(
        F.col("_id").alias("id"),
        F.col("_v").alias("v"),
        F.col("_n").alias("n"),
        F.col("centroid_cosine").alias("cc"),
        F.lit(-1).cast("long").alias("b"),
        "cluster",
    )
    state_rows.repartition(F.col("cluster")).write.mode(
        "overwrite"
    ).partitionBy("cluster").parquet(state_path)
    return spark.read.schema(_STATE_SCHEMA).parquet(state_path).count()


def stream_semantic_dedup(
    docs_stream: DataFrame,
    state_path: str,
    out_path: str,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    threshold: float = 0.95,
    checkpoint_path: str | None = None,
    compact_every: int | None = None,
):
    """foreachBatch wrapper: each micro-batch dedups within itself,
    probes shipped history, and writes its survivors to
    ``out_path/batch=<epoch>`` (the curation fragment pattern: a
    deterministic per-epoch location overwritten on replay, so an
    at-least-once re-execution rewrites its own rows instead of
    double-appending them to a shared path). Readers take the tree
    root — ``batch`` comes back as the partition column. A tree
    created by the pre-r11 flat-append layout keeps that shape (and
    its double-append-on-replay caveat) — mixed layouts don't read.
    ``compact_every``: compact the state tree after every Nth epoch
    (single-writer by construction inside foreachBatch; a replayed
    epoch's re-run is a no-op). Returns the StreamingQuery."""

    # decided on the first non-empty batch, then cached: a pre-r11
    # flat out tree must keep its flat shape (mixing batch=<id> dirs
    # in breaks partition discovery for readers of the root)
    _legacy: list[bool] = []

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.isEmpty():
            kept = semantic_batch_against_corpus(
                batch_df.sparkSession,
                batch_df,
                state_path,
                centroids,
                vec_col,
                id_col,
                threshold,
                batch_id=int(epoch_id),
            )
            if not _legacy:
                _legacy.append(
                    legacy_flat_output(batch_df.sparkSession, out_path)
                )
            if _legacy[0]:
                # the flat layout always carried batch as a DATA
                # column (the partitioned layout gets it from the
                # dir name) — appending without it would leave a
                # mixed-schema tree that reads null provenance
                kept.withColumn(
                    "batch", F.lit(int(epoch_id))
                ).write.mode("append").parquet(out_path)
            else:
                kept.write.mode("overwrite").parquet(
                    os.path.join(out_path, f"batch={int(epoch_id)}")
                )
        # maintenance keeps its cadence on EMPTY epochs too (a sparse
        # source must not defer compaction a full extra cycle); a
        # missing state tree is a no-op inside compact_state_tree
        if compact_every and (int(epoch_id) + 1) % int(compact_every) == 0:
            from cod_stats_spark.streaming.compaction import (
                compact_semantic_state,
            )

            compact_semantic_state(batch_df.sparkSession, state_path)

    writer = docs_stream.writeStream.foreachBatch(batch_fn).outputMode(
        "append"
    )
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
