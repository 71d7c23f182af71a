"""Streaming incremental deduplication — new documents vs a growing corpus.

The batch dedup operators (operators/dedup.py) answer "which documents
in THIS table duplicate each other". A training-data ingest pipeline
asks a different question every few minutes: "which of these NEW
documents duplicate anything we already kept?" Re-sketching the corpus
per micro-batch is the naive answer and is quadratic over a crawl's
lifetime; the incremental answer maintains an INDEX next to the corpus
and only sketches each document once, when it arrives:

- ``fingerprints`` — (id, fp) md5 of normalized text (exact layer)
- ``bands``        — (id, band, band_hash) MinHash LSH keys
                     (near-dup candidate layer)

Per micro-batch (foreachBatch):

1. exact: batch docs fingerprint-deduped within the batch (min id
   survives), then anti-joined against the fingerprint index;
2. near: within-batch near-dups removed via the regular LSH+Jaccard
   pipeline, then the survivors' band keys PROBE the index — only
   (band, band_hash) collisions become candidates, verified with exact
   Jaccard against just the colliding corpus docs;
3. survivors append to the corpus, their fingerprints + band keys
   append to the index. Nothing about the existing corpus or index is
   ever rewritten or re-sketched.

Scale shape: the batch side of every join is one micro-batch
(broadcastable); the index sides are append-only trees HIVE-
PARTITIONED by a stable key bucket — ``fingerprints/pb=K`` with
``K = pmod(xxhash64(fp), fp_buckets)`` and ``bands/pb=K`` with
``K = pmod(band_hash, band_buckets)`` — and every probe first filters
on the batch's own (micro-batch-bounded) bucket set as a LITERAL
partition predicate, so the scan reads only the matching directories
(PartitionFilters in the plan, asserted in
tests/test_incremental_dedup_layout.py) instead of the whole index.
Per-batch probe cost is then ~ index_size × |batch buckets| /
n_buckets: the bucket counts are the scale knob (64 default; size a
100 TB deployment at ≳ corpus_rows/batch_rows so a batch's bucket set
stays a small fraction). Counts are FIXED for an index's lifetime —
recorded in a ``_LAYOUT.fp{N}.bh{M}`` marker at creation and
validated on every later call (re-bucketing history would silently
hide it from probes). Pre-r11 FLAT index trees are detected and read
without pruning (the legacy shape; rebuild the index to upgrade).
Candidate verification reads only the corpus rows whose ids collided
— a semi-join-restricted scan, never the whole corpus.

Reference: the reference has no near-dup machinery (its dedup is the
INSERT OR IGNORE natural key, parse_matches.sh:613) — this extends the
same incremental contract to content-level duplicates.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cod_stats_spark.functions.text import fingerprint, shingles
from cod_stats_spark.operators.dedup import (
    lsh_pairs_from_band_keys,
    minhash_band_keys,
    ngram_jaccard_pairs,
)
from cod_stats_spark.streaming._state import _fs_for

# the trailing `b` (batch id, r10) makes at-least-once replays safe:
# probes exclude the replaying batch's own first-run rows, and a
# completed append is recorded by an _APPLIED.b{id} marker so it is
# never doubled. Pre-r10 index dirs lack the column — the explicit
# schema reads it as null, which the exclusion predicates treat as
# "some other batch".
FP_SCHEMA = "id long, fp string, b long"
BANDS_SCHEMA = "id long, band int, band_hash long, b long"

#: default bucket counts for a NEW index tree (the scale knob — fixed
#: at creation, recorded in the _LAYOUT marker; see module docstring)
DEFAULT_FP_BUCKETS = 64
DEFAULT_BAND_BUCKETS = 64

_LAYOUT_RE = re.compile(r"^_LAYOUT\.fp(\d+)\.bh(\d+)$")


def _index_layout(
    fs,
    index_path: str,
    fp_buckets: int | None,
    band_buckets: int | None,
) -> tuple[int, int]:
    """Resolve (and on first use, record) the index tree's bucket
    layout. Returns (fp_buckets, band_buckets); (0, 0) means a
    pre-layout FLAT tree (read without pruning, append flat — mixing
    partitioned and flat files under one root would break partition
    discovery; rebuild to upgrade, or run compact_dedup_index).

    The ``_LAYOUT.fp{N}.bh{M}`` marker is authoritative once written:
    a caller passing DIFFERENT explicit counts gets a ValueError —
    bucketing history under one count and probing under another would
    silently hide index rows from every probe."""
    names = fs.list_names(index_path) if fs.exists(index_path) else []
    marker = next((m for m in map(_LAYOUT_RE.match, names) if m), None)
    if marker is not None:
        nf, nb = int(marker.group(1)), int(marker.group(2))
        for want, got, knob in (
            (fp_buckets, nf, "fp_buckets"),
            (band_buckets, nb, "band_buckets"),
        ):
            if want is not None and int(want) != got:
                raise ValueError(
                    f"dedup index {index_path} was created with "
                    f"{knob}={got}; got {want} — bucket counts are "
                    "fixed for an index's lifetime (rebuild to change)"
                )
        return nf, nb
    if any(
        fs.exists(os.path.join(index_path, d))
        for d in ("fingerprints", "bands")
    ):
        return 0, 0  # legacy flat tree
    nf = DEFAULT_FP_BUCKETS if fp_buckets is None else int(fp_buckets)
    nb = DEFAULT_BAND_BUCKETS if band_buckets is None else int(band_buckets)
    if nf < 1 or nb < 1:
        raise ValueError("bucket counts must be >= 1")
    # marker FIRST: a crash between marker and first append leaves an
    # empty-but-described tree, never bucketed dirs misread as flat
    fs.mkdirs(index_path)
    fs.create_text(
        os.path.join(index_path, f"_LAYOUT.fp{nf}.bh{nb}"), f"{nf} {nb}"
    )
    return nf, nb


_SKETCH_RE = re.compile(r"^_SKETCH\.h(\d+)\.b(\d+)\.s(\d+)$")


def _sketch_params(
    fs, index_path: str, num_hashes: int, bands: int, shingle_n: int
) -> None:
    """Record (on first use) / validate the index's MinHash sketch
    parameters — the same fixed-for-lifetime contract as the bucket
    counts: band keys computed under one (num_hashes, bands,
    shingle_n) never collide with keys from another, so probing a
    bootstrapped or previously ingested history with a different
    sketch silently readmits every near-duplicate of it. Trees
    created before the marker existed get it stamped with the
    CURRENT call's parameters on first post-upgrade use (callers
    that never changed their defaults — the overwhelming case — are
    recorded correctly; a tree whose history genuinely mixes sketch
    params was already silently broken)."""
    names = fs.list_names(index_path) if fs.exists(index_path) else []
    m = next((x for x in map(_SKETCH_RE.match, names) if x), None)
    if m is not None:
        got = tuple(int(m.group(i)) for i in (1, 2, 3))
        want = (int(num_hashes), int(bands), int(shingle_n))
        if got != want:
            raise ValueError(
                f"dedup index {index_path} was built with (num_hashes, "
                f"bands, shingle_n)={got}; got {want} — sketch "
                "parameters are fixed for an index's lifetime (rebuild "
                "to change)"
            )
        return
    fs.mkdirs(index_path)
    fs.create_text(
        os.path.join(
            index_path,
            f"_SKETCH.h{int(num_hashes)}.b{int(bands)}.s{int(shingle_n)}",
        ),
        f"{num_hashes} {bands} {shingle_n}",
    )


def _fp_bucket(fp, n: int):
    return F.pmod(F.xxhash64(fp), F.lit(int(n))).cast("int")


def _band_bucket(band_hash, n: int):
    return F.pmod(band_hash, F.lit(int(n))).cast("int")


def _read_or_empty(
    spark: SparkSession, path: str, schema: str, buckets: int = 0
) -> DataFrame:
    # existence through the path's own filesystem (local os for plain
    # paths, Hadoop FS for schemed ones) — a driver-local isdir would
    # silently treat an hdfs://s3a:// index as forever-absent (r10)
    if buckets:
        schema = schema + ", pb int"  # the Hive partition column
    if _fs_for(spark, path).exists(path):
        return spark.read.schema(schema).parquet(path)
    return spark.createDataFrame([], schema)


def _pruned_index(
    spark: SparkSession, path: str, schema: str, buckets: int, pbs: list[int]
) -> DataFrame:
    """The probe-side index scan: pruned to the batch's bucket set as
    a LITERAL predicate over the Hive partition column when the tree
    is bucketed (PartitionFilters in the plan — asserted in
    tests/test_incremental_dedup_layout.py), the full scan on a
    legacy flat tree (buckets == 0)."""
    df = _read_or_empty(spark, path, schema, buckets)
    if buckets:
        df = df.where(F.col("pb").isin([int(p) for p in pbs]))
    return df


def build_dedup_index(
    spark: SparkSession,
    corpus_path: str,
    text_col: str,
    id_col: str,
    index_path: str,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    fp_buckets: int | None = None,
    band_buckets: int | None = None,
) -> dict:
    """Bootstrap the incremental dedup index from an EXISTING corpus —
    the backfill a deployment runs once before incremental ingestion
    starts against a corpus that was built by batch jobs. Without it
    the only way to populate the index is to replay the whole corpus
    through :func:`dedup_batch_against_corpus` micro-batch by
    micro-batch — O(corpus²/batch) sketching for a corpus that is
    already deduped.

    One distributed pass: fingerprint + MinHash-sketch every corpus
    doc ONCE, write both index subtrees in the bucketed layout with
    the partition-column repartition discipline. The corpus is
    registered AS-IS — run the batch dedup operators first if it
    still contains duplicates (this op records history, it doesn't
    judge it). Sketch parameters must match the ones later batches
    will probe with (same contract as the bucket counts).

    Crash-safe by rerun: both subtrees are written with OVERWRITE, so
    a partial bootstrap is repaired by running it again (a
    ``_BOOTSTRAP`` marker written before the first data write records
    that the tree's contents are bootstrap output, hence safely
    overwritable). Refuses to touch a LIVE index — one with
    ``_APPLIED`` batch markers, OR one holding data files without the
    ``_BOOTSTRAP`` marker (an index populated by direct batch-mode
    ``dedup_batch_against_corpus`` calls writes no markers at all) —
    overwriting either would erase ingested documents' index rows
    while the documents stay in the corpus, silently readmitting
    future duplicates of them. Returns row counts per subtree."""
    fs = _fs_for(spark, index_path)
    if fs.exists(index_path):
        names = fs.list_names(index_path)
        if any(n.startswith("_APPLIED.") for n in names):
            raise ValueError(
                f"build_dedup_index: {index_path} is a LIVE index "
                "(_APPLIED markers present) — bootstrapping would erase "
                "ingested batches' index rows; use a fresh index path"
            )
        has_data = any(
            fs.list_files(os.path.join(index_path, sub))
            for sub in ("fingerprints", "bands")
        )
        if has_data and "_BOOTSTRAP" not in names:
            raise ValueError(
                f"build_dedup_index: {index_path} is a LIVE index "
                "(holds index rows not written by a bootstrap — e.g. "
                "batch-mode ingestion, which writes no markers); "
                "bootstrapping would erase them; use a fresh index path"
            )
    nf, nb = _index_layout(fs, index_path, fp_buckets, band_buckets)
    if not nf:  # refuse BEFORE stamping markers on a rejected tree
        raise ValueError(
            f"build_dedup_index: {index_path} holds a legacy flat "
            "tree; the bootstrap writes the bucketed layout only — "
            "point it at a fresh path"
        )
    _sketch_params(fs, index_path, num_hashes, bands, shingle_n)
    if not fs.exists(os.path.join(index_path, "_BOOTSTRAP")):
        fs.create_text(os.path.join(index_path, "_BOOTSTRAP"), "1")
    corpus = spark.read.parquet(corpus_path)
    _b = F.lit(-1).cast("long").alias("b")  # pre-stream history tag
    fp_rows = corpus.select(
        F.col(id_col).alias("id"),
        fingerprint(F.col(text_col)).alias("fp"),
        _b,
    )
    fp_rows.withColumn("pb", _fp_bucket(F.col("fp"), nf)).repartition(
        F.col("pb")
    ).write.mode("overwrite").partitionBy("pb").parquet(
        os.path.join(index_path, "fingerprints")
    )
    band_rows = minhash_band_keys(
        corpus, text_col, id_col, num_hashes, bands, shingle_n
    ).withColumn("b", F.lit(-1).cast("long"))
    band_rows.withColumn(
        "pb", _band_bucket(F.col("band_hash"), nb)
    ).repartition(F.col("pb")).write.mode("overwrite").partitionBy(
        "pb"
    ).parquet(os.path.join(index_path, "bands"))
    # explicit schemas (the probe convention): an empty corpus writes
    # data-less partition dirs that schema inference cannot read
    return {
        "fingerprints": _read_or_empty(
            spark, os.path.join(index_path, "fingerprints"), FP_SCHEMA, nf
        ).count(),
        "bands": _read_or_empty(
            spark, os.path.join(index_path, "bands"), BANDS_SCHEMA, nb
        ).count(),
    }


def stream_dedup_by_key(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Engine-native streaming EXACT dedup by key: Spark's
    dropDuplicatesWithinWatermark keeps state only for the watermark
    horizon, so memory is bounded by (keys arriving per horizon), not
    by the stream's lifetime — the right primitive when at-least-once
    sources (Kafka replays, file re-lists) can re-deliver rows within
    a bounded delay. The content-level near-dup index path
    (dedup_batch_against_corpus) answers the unbounded-history
    question; this answers the transport-duplicate one.

    The timestamp column is normalized through TIMESTAMP (NTZ parquet
    is rejected by withWatermark) before the watermark is applied.
    """
    from cod_stats_spark.operators._util import ts_to_timestamp

    if dict(stream.dtypes).get(ts_col, "") not in ("", "timestamp"):
        stream = stream.withColumn(ts_col, ts_to_timestamp(stream, ts_col))
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def _cross_jaccard(
    corpus: DataFrame,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    candidates: DataFrame,  # (id_a = corpus id, id_b = batch id)
    shingle_n: int,
    threshold: float,
) -> DataFrame:
    """Exact Jaccard verification of cross-set candidate pairs. Same
    |A∩B| / (|A|+|B|−|A∩B|) arithmetic as ngram_jaccard_pairs, with the
    two sides drawn from different tables: shingles are computed only
    for the corpus rows that collided (semi-join-restricted) and for
    the batch rows (already in memory); the batch side broadcasts."""
    a = (
        corpus.join(
            candidates.select(F.col("id_a").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_a"),
            F.explode(F.array(shingles(text_col, shingle_n))).alias("sh_a"),
        )
        .withColumn("sz_a", F.size("sh_a"))
    )
    b = (
        batch.join(
            candidates.select(F.col("id_b").alias(id_col)).distinct(),
            id_col,
            "left_semi",
        )
        .select(
            F.col(id_col).alias("id_b"),
            F.explode(F.array(shingles(text_col, shingle_n))).alias("sh_b"),
        )
        .withColumn("sz_b", F.size("sh_b"))
    )
    joined = candidates.join(a, "id_a").join(F.broadcast(b), "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.col("sz_a") + F.col("sz_b") - inter
    jac = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    return (
        joined.select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def dedup_batch_against_corpus(
    spark: SparkSession,
    batch: DataFrame,
    text_col: str,
    id_col: str,
    corpus_path: str,
    index_path: str,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    batch_id: int | None = None,
    fp_buckets: int | None = None,
    band_buckets: int | None = None,
) -> DataFrame:
    """One incremental-dedup step: returns the batch's surviving rows
    and appends them (plus their index entries) to corpus/index.

    ``fp_buckets`` / ``band_buckets``: partition counts for a NEW
    index tree (None = the defaults; recorded in the _LAYOUT marker
    and validated thereafter — the module-docstring scale knob).
    Probes against an existing tree always follow the tree's own
    recorded layout.

    Ids must be globally unique across batches and corpus (the ingest
    layer's key contract). Callable directly for batch backfills; the
    streaming wrapper below feeds it micro-batches.

    Epoch-id scope: batch ids are only stable within ONE streaming
    checkpoint lineage. Restarting a stream WITHOUT its checkpoint
    (epoch ids reset to 0) against an existing state dir would make
    new batches look like replays of old ones — pair each state dir
    with exactly one checkpoint for its lifetime, or start a fresh
    state dir with a fresh checkpoint.


    ``batch_id`` (r10): pass the stable epoch id from an at-least-once
    loop. Index probes then exclude rows tagged with this batch id —
    a replayed batch would otherwise collide with its own first-run
    fingerprints/bands and come back EMPTY, emptying every downstream
    funnel stage and overwriting the epoch's shard fragments with
    nothing. With the guard, a replay recomputes the SAME survivors
    (within-batch dedup is deterministic, the excluded index equals
    the pre-batch index) and skips the already-completed appends
    (``_APPLIED.b{id}`` marker — atomic directory-entry creation via
    the path's own filesystem). A crash mid-append without the marker
    re-appends on retry; duplicate index rows are probe-harmless,
    duplicate corpus rows are the documented residual window.
    """
    fp_path = os.path.join(index_path, "fingerprints")
    bands_path = os.path.join(index_path, "bands")
    fs = _fs_for(spark, index_path)
    nf, nb = _index_layout(fs, index_path, fp_buckets, band_buckets)
    _sketch_params(fs, index_path, num_hashes, bands, shingle_n)
    marker = (
        None
        if batch_id is None
        else os.path.join(index_path, f"_APPLIED.b{int(batch_id)}")
    )
    applied = marker is not None and fs.exists(marker)

    def _not_own(df: DataFrame) -> DataFrame:
        if batch_id is None:
            return df
        return df.where(
            F.col("b").isNull() | (F.col("b") != int(batch_id))
        )

    batch = batch.withColumn("_fp", fingerprint(F.col(text_col)))
    # exact, within batch: min id per fingerprint survives
    w = Window.partitionBy("_fp").orderBy(F.col(id_col))
    batch = batch.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    ).drop("_rn")
    # exact, vs corpus: anti-join the fingerprint index. The batch's
    # fingerprint bucket set is micro-batch-bounded (≤ min(|batch|,
    # nf) values); as a literal isin over the partition column it
    # statically prunes the index scan to the matching pb=
    # directories — the probe reads ~|touched buckets|/nf of the
    # index, not all of it
    # persist the deduped batch BEFORE the bucket-set collect: the
    # collect is its own job, and without the cache the fingerprint +
    # window-dedup lineage would execute once for the collect and a
    # second time when the anti-joined frame below first materializes
    _pre = batch.persist()
    pbs = (
        [
            r[0]
            for r in _pre.select(_fp_bucket(F.col("_fp"), nf).alias("pb"))
            .distinct()
            .collect()
        ]
        if nf
        else []
    )
    fp_index = _not_own(_pruned_index(spark, fp_path, FP_SCHEMA, nf, pbs))
    # lazy persist, no count barrier: the consumers below run as
    # sequential jobs, so the first one (the band-key checkpoint)
    # populates the cache and the rest read it
    batch = _pre.join(
        fp_index.select(F.col("fp").alias("_fp")), "_fp", "left_anti"
    ).persist()

    # Sketch each surviving doc EXACTLY ONCE: these band keys feed the
    # within-batch pairing, the corpus-index probe, and the index
    # append. Checkpointed (not just persisted) because the plan reads
    # the fingerprint index — the appends below refreshByPath that
    # index, which would invalidate a mere cache entry and recompute
    # the keys against an index that already contains this batch.
    batch_bands = minhash_band_keys(
        batch, text_col, id_col, num_hashes, bands, shingle_n
    ).localCheckpoint(eager=True)
    # the eager checkpoint above materialized the anti-join into the
    # post-anti-join cache; the pre-anti-join cache has served both
    # its consumers (the pbs collect and that materialization)
    _pre.unpersist()

    # near, within batch: bucket the precomputed keys, verify, drop the
    # higher id of each confirmed pair
    within = ngram_jaccard_pairs(
        batch,
        text_col,
        id_col,
        lsh_pairs_from_band_keys(batch_bands),
        shingle_n=shingle_n,
        threshold=threshold,
    )
    batch_near = batch.join(
        within.select(F.col("id_b").alias(id_col)).distinct(), id_col, "left_anti"
    )

    # near, vs corpus: probe the band index with the batch's band keys
    if _fs_for(spark, corpus_path).exists(corpus_path):
        near_bands = batch_bands.join(
            batch_near.select(F.col(id_col).alias("id")), "id", "left_semi"
        )
        # same static pruning as the fingerprint probe: the batch's
        # band-hash bucket set (≤ min(batch keys, nb)) as a literal
        # partition predicate
        bpbs = (
            [
                r[0]
                for r in near_bands.select(
                    _band_bucket(F.col("band_hash"), nb).alias("pb")
                )
                .distinct()
                .collect()
            ]
            if nb
            else []
        )
        band_index = _not_own(
            _pruned_index(spark, bands_path, BANDS_SCHEMA, nb, bpbs)
        )
        candidates = (
            band_index.join(
                F.broadcast(near_bands.withColumnRenamed("id", "_bid")),
                ["band", "band_hash"],
            )
            .select(F.col("id").alias("id_a"), F.col("_bid").alias("id_b"))
            .distinct()
        )
        corpus = spark.read.parquet(corpus_path)
        confirmed = _cross_jaccard(
            corpus, batch_near, text_col, id_col, candidates, shingle_n, threshold
        )
        survivors = batch_near.join(
            confirmed.select(F.col("id_b").alias(id_col)).distinct(),
            id_col,
            "left_anti",
        )
    else:  # first batch ever: nothing to probe
        survivors = batch_near
    # Sever lineage BEFORE the appends. A persist() is NOT enough:
    # appending to corpus/fp/bands triggers Spark's refreshByPath on
    # the output path, which invalidates-and-recomputes any cached plan
    # that scans that path — the survivors plan reads the fingerprint
    # index, so after the fp append it would re-evaluate against an
    # index that now contains this very batch and anti-join everything
    # away. localCheckpoint(eager) pins the rows to executor storage
    # with no file lineage; all three writes and the return value read
    # the checkpoint. (A multi-executor deployment with lossy storage
    # would stage survivors to a scratch parquet path instead — same
    # shape, durable materialization.)
    survivors = survivors.localCheckpoint(eager=True)
    batch.unpersist()

    if not applied:
        _b = F.lit(-1 if batch_id is None else int(batch_id)).alias("b")
        survivors.drop("_fp").write.mode("append").parquet(corpus_path)
        fp_rows = survivors.select(
            F.col(id_col).alias("id"), F.col("_fp").alias("fp"), _b
        )
        band_rows = batch_bands.join(
            survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
        ).withColumn("b", _b)
        if nf:
            # repartition on the partition column first: without it,
            # every shuffle task writes a sliver into every touched
            # pb= dir (tasks × buckets files PER BATCH — the r11
            # flatness audit measured 9k files after 5 batches); with
            # it, one file per touched dir per batch. The extra
            # shuffle is micro-batch-sized.
            fp_rows.withColumn(
                "pb", _fp_bucket(F.col("fp"), nf)
            ).repartition(F.col("pb")).write.mode("append").partitionBy(
                "pb"
            ).parquet(fp_path)
        else:  # legacy flat tree: keep its shape (no mixed layouts)
            fp_rows.write.mode("append").parquet(fp_path)
        if nb:
            band_rows.withColumn(
                "pb", _band_bucket(F.col("band_hash"), nb)
            ).repartition(F.col("pb")).write.mode("append").partitionBy(
                "pb"
            ).parquet(bands_path)
        else:
            band_rows.write.mode("append").parquet(bands_path)
        if marker is not None:
            fs.create_text(marker, str(int(batch_id)))
    return survivors.drop("_fp")


def stream_dedup_to_corpus(
    spark: SparkSession,
    docs_stream: DataFrame,
    text_col: str,
    id_col: str,
    corpus_path: str,
    index_path: str,
    checkpoint_path: str | None = None,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    shingle_n: int = 3,
    fp_buckets: int | None = None,
    band_buckets: int | None = None,
    compact_every: int | None = None,
):
    """Structured-Streaming wrapper: each micro-batch is deduped against
    itself and the corpus-so-far, survivors append to corpus + index.

    ``compact_every``: run :func:`streaming.compaction.compact_dedup_index`
    after every Nth epoch — the scheduled maintenance the append-only
    trees need (the r11 flatness audit: without compaction, per-batch
    cost drifts from FILE COUNT alone even when pruning keeps rows
    bounded). Running it inside foreachBatch satisfies the compaction
    module's single-writer contract by construction, and a replayed
    epoch re-running it is a no-op (per-leaf-dir check). Returns the
    StreamingQuery."""

    def batch_fn(batch_df: DataFrame, epoch_id: int) -> None:
        dedup_batch_against_corpus(
            spark, batch_df, text_col, id_col, corpus_path, index_path,
            threshold, num_hashes, bands, shingle_n,
            batch_id=int(epoch_id),
            fp_buckets=fp_buckets, band_buckets=band_buckets,
        )
        if compact_every and (int(epoch_id) + 1) % int(compact_every) == 0:
            # late import: compaction imports this module's layout
            # helpers at module level
            from cod_stats_spark.streaming.compaction import (
                compact_dedup_index,
            )

            compact_dedup_index(spark, index_path)

    writer = docs_stream.writeStream.foreachBatch(batch_fn).outputMode("append")
    if checkpoint_path:
        writer = writer.option("checkpointLocation", checkpoint_path)
    return writer.start()
