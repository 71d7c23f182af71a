"""Incremental duplicate-line removal — batch-append against a
persisted line census.

The streaming posture of :mod:`operators.line_dedup` (the
RefinedWeb/Dolma boilerplate pass): documents already shipped are
immutable, so the only coherent append semantics is
KEEP-FIRST-IN-TIME — a line's first-ever shipped occurrence stands,
and every later occurrence (same batch or any later one) is scrubbed
before shipping. State is the line census (h, cnt): O(distinct
lines) rows, merged by count sum per batch under the
versioned-rewrite protocol (streaming/_state.py) with batch-id-tagged
commits, so at-least-once replays re-scrub against the snapshot they
originally read and never double-count (the substring census
discipline, one granularity up).

Per batch:

1. the batch's line rows (shared :func:`operators.line_dedup.split_lines`
   — one definition of normalization/eligibility/hash);
2. census merge: old (h, cnt) ⊎ batch counts, carrying the OLD count
   per hash (exemption needs it);
3. a batch line is KEPT iff it is exempt (blank/short) or it is the
   batch's first occurrence of a line never seen before (old count
   0) — first-in-shipped-history;
4. in-order reassembly of the batch docs only (shared
   :func:`operators.line_dedup.reassemble_lines`);
5. census state written (new version, atomic repoint, note=b<id>).

Equality contract (tested): when batches arrive with increasing doc
ids, the sequential outputs equal the one-shot
``line_dedup(union, keep_first=True)`` — the (doc, pos) global
min-struct then coincides with first-in-time.

``state_mode="bloom"`` swaps the census for a FIXED-SIZE Bloom
filter relation — Dolma's actual published deduper design: constant
state regardless of corpus size, at an explicit designed
false-positive rate of never-seen lines wrongly scrubbed (see
:func:`line_batch_against_corpus`). The funnel's ``line_sep`` stage
DEFAULTS to the exact census (its append == rebuild contract is
exact); ``curate_corpus_append(line_state_mode="bloom", …)`` (r15)
selects the crawl-scale posture with the FP-scrub caveat documented
there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cod_stats_spark.operators.line_dedup import (
    reassemble_lines,
    split_lines,
)
from cod_stats_spark.streaming._state import read_state, write_state

_CENSUS_SCHEMA = "h long, cnt long"

__all__ = ["line_batch_against_corpus"]


def line_batch_against_corpus(
    spark: SparkSession,
    batch: DataFrame,
    census_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
    min_chars: int = 1,
    batch_id: int | None = None,
    base_hash: str = "xxhash64",
    state_mode: str = "exact",
    bloom_bits: int = 1 << 30,
    bloom_hashes: int = 7,
) -> DataFrame:
    """One incremental step: returns the batch's rows as
    (id, clean_text, n_lines, n_kept) with every
    already-shipped-or-earlier duplicate line removed, and advances
    the state.

    ``state_mode``:

    - ``"exact"`` (default): the (h, cnt) census — exact keep-first,
      state grows O(distinct lines).
    - ``"bloom"``: Dolma's ACTUAL published posture (Soldaini et al.
      2024 — their deduper's seen-set IS a Bloom filter): state is a
      fixed-size (word, bits) filter relation (``bloom_bits``/8 bytes
      FOREVER, regardless of corpus size); a batch line whose hash is
      maybe-member is scrubbed. The tradeoff is explicit: at the
      designed false-positive rate (:func:`operators.bloom.
      bloom_fp_rate` — size ``bloom_bits`` ≈ 10 bits per expected
      distinct line for ~1%) a few NEVER-SEEN lines are wrongly
      scrubbed; every truly-seen line is still always scrubbed (no
      false negatives). At a 100 TB corpus the census relation is
      itself corpus-sized while the filter stays broadcastable —
      that is the whole point of the published design.

    ``batch_id``: pass the stable micro-batch/epoch id from an
    at-least-once loop — each state commit is tagged with it in the
    commit-marker name, so a replayed batch re-scrubs against the
    SNAPSHOT it originally read (tagged version minus one) and skips
    the merge: output equals the original (in bloom mode the OR merge
    is even idempotent, but the DECISIONS must still read the
    pre-batch snapshot — a replay probing its own bits would scrub
    its own first occurrences). Epoch ids are only stable within one
    checkpoint lineage (the substring census caveat applies
    verbatim)."""
    from cod_stats_spark.streaming._state import (
        _fs_for,
        find_version_by_note,
    )

    if state_mode not in ("exact", "bloom"):
        raise ValueError(
            f"line_batch_against_corpus: unknown state_mode {state_mode!r}"
        )
    # mode frozen per state dir (the _TAPE/_LAYOUT discipline): the
    # two modes store different relations under the same versioned
    # protocol, so probing a census with bloom logic (or vice versa)
    # would silently mis-scrub instead of failing loudly
    from cod_stats_spark.streaming._state import current_version

    fs = _fs_for(spark, census_dir)
    marker = f"_LINESTATE.{state_mode}"
    fs.mkdirs(census_dir)
    existing = [
        n for n in fs.list_names(census_dir) if n.startswith("_LINESTATE.")
    ]
    if not existing:
        if current_version(census_dir, fs) is not None:
            # marker-less dir with COMMITTED versions = a legacy
            # pre-marker state, which was always the exact census —
            # stamping the CALLER's mode here would brick a correct
            # exact-mode dir the first time someone probes it with
            # bloom (r14 second review)
            existing = ["_LINESTATE.exact"]
        else:
            existing = [marker]
        fs.create_text(f"{census_dir}/{existing[0]}", existing[0][11:])
    if marker not in existing:
        raise ValueError(
            f"line_batch_against_corpus: state dir is {existing[0]}, "
            f"called with state_mode={state_mode!r}"
        )
    note = None if batch_id is None else f"b{int(batch_id)}"
    applied_v = (
        find_version_by_note(census_dir, note, fs=fs)
        if note is not None
        else None
    )
    lines = split_lines(batch, text_col, id_col, sep, min_chars, base_hash)
    batch_census = (
        lines.filter(F.col("_elig"))
        .groupBy("_h")
        .agg(
            F.count(F.lit(1)).alias("_new"),
            F.min(F.struct(F.col(id_col), F.col("_pos"))).alias("_first"),
        )
    )
    if applied_v is not None:
        # replay: the batch's commit wrote version applied_v, so it
        # READ applied_v − 1 (single-writer, sequential versions)
        old = (
            spark.read.parquet(f"{census_dir}/v={applied_v - 1}")
            if applied_v >= 1
            else None
        )
    else:
        old = read_state(spark, census_dir)
    if state_mode == "bloom":
        return _bloom_step(
            spark, batch, lines, batch_census, old, census_dir,
            id_col, sep, note, applied_v, bloom_bits, bloom_hashes,
        )
    if old is None:
        old = spark.createDataFrame([], _CENSUS_SCHEMA)
    merged = (
        batch_census.join(
            old.select(F.col("h").alias("_h"), F.col("cnt").alias("_old")),
            "_h",
            "left",
        )
        .withColumn("_old", F.coalesce(F.col("_old"), F.lit(0)))
        .withColumn("_cnt", F.col("_old") + F.col("_new"))
    )
    # localCheckpoint: the keep join below must read the census built
    # against the OLD state even though write_state advances it in
    # the same call — the downstream action runs on the RETURNED
    # frame, after that advance (the substring census pin)
    merged = merged.localCheckpoint(eager=True)
    joined = lines.join(
        merged.select("_h", "_old", "_first"), "_h", "left"
    )
    kept = ~F.col("_elig") | (
        (F.col("_old") == 0)
        & (F.col("_first")[id_col] == F.col(id_col))
        & (F.col("_first")["_pos"] == F.col("_pos"))
    )
    cleaned = reassemble_lines(joined, batch, id_col, sep, kept)
    if applied_v is None:
        # new census = hashes untouched by this batch ∪ merged counts
        # (merged alone would DROP every old hash absent from the
        # batch); the old snapshot stays on disk, so the lazy
        # anti-join is safe inside write_state's action
        untouched = old.join(
            batch_census.select(F.col("_h").alias("h")), "h", "left_anti"
        )
        write_state(
            untouched.unionByName(
                merged.select(
                    F.col("_h").alias("h"), F.col("_cnt").alias("cnt")
                )
            ),
            census_dir,
            note=note,
        )
    return cleaned


def _bloom_step(
    spark: SparkSession,
    batch: DataFrame,
    lines: DataFrame,
    batch_census: DataFrame,
    old_bloom: DataFrame | None,
    census_dir: str,
    id_col: str,
    sep: str,
    note: str | None,
    applied_v: int | None,
    bloom_bits: int,
    bloom_hashes: int,
) -> DataFrame:
    """The Dolma-mode step: probe the batch's line hashes against the
    fixed-size filter snapshot, scrub maybe-members (plus batch-
    internal repeats), OR the batch's bits in, commit. The state
    relation is (word, bits) — at most bloom_bits/64 rows forever."""
    from cod_stats_spark.operators.bloom import bloom_build, bloom_probe

    if old_bloom is None:
        old_bloom = spark.createDataFrame([], "word long, bits long")
    # materialized once (bounded: one row per distinct line): the
    # probe, the keep join, AND write_state's OR-merge all consume it —
    # unpinned, each action would re-run the full batch split/hash
    # pass (the exact path's `merged` checkpoint, same reason; r14
    # second review)
    batch_census = batch_census.localCheckpoint(eager=True)
    seen = bloom_probe(
        batch_census.select("_h", "_first"),
        "_h",
        old_bloom,
        bloom_bits,
        bloom_hashes,
        out_col="_seen",
    )
    joined = lines.join(
        seen.select("_h", "_seen", "_first"), "_h", "left"
    )
    kept = ~F.col("_elig") | (
        (~F.col("_seen"))
        & (F.col("_first")[id_col] == F.col(id_col))
        & (F.col("_first")["_pos"] == F.col("_pos"))
    )
    cleaned = reassemble_lines(joined, batch, id_col, sep, kept)
    if applied_v is None:
        batch_bits = bloom_build(
            batch_census, "_h", bloom_bits, bloom_hashes
        )
        merged_bloom = (
            old_bloom.unionByName(batch_bits)
            .groupBy("word")
            .agg(F.expr("bit_or(bits)").alias("bits"))
        )
        write_state(merged_bloom, census_dir, note=note)
    return cleaned
