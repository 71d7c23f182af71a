"""Sequence packing: assign documents to fixed-token-budget training
shards.

Two tiers, mirroring how real pre-training pipelines pack:

- :func:`pack_sequences` — concatenation-order packing. Documents are
  laid on a deterministic global tape (ordered by md5 of the id — a
  content-independent shuffle) and each doc's shard is the budget
  window its START offset falls in, i.e. exactly what a concatenate-
  then-split-at-budget loader produces. Fully SQL-expressible, so the
  gate value-verifies it end to end.

- :func:`pack_ffd` — first-fit-decreasing bin packing within bounded
  buckets, for loaders that want ≤budget bins with no straddling.
  Inherently a per-group sequential decision, so it runs as
  Arrow-batched ``applyInPandas`` over deterministic buckets (the
  only Python in this module, and it touches token counts — never
  text).

Scale note (the part that matters at 100 TB): the global running sum
in :func:`pack_sequences` is NOT a single unpartitioned window — that
would serialize the whole corpus through one task. It is a two-phase
distributed prefix scan: per-bucket cumulative sums run in parallel
(window partitioned by a 256-way md5-prefix bucket), bucket totals
(256 rows, bounded regardless of corpus size) are prefix-summed and
broadcast back as offsets. Same numbers as the naive global window,
executor-parallel throughout.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order_key(id_col: str, salt: str):
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def _check_buckets(num_buckets: int) -> int:
    """The tape operators' bucket = conv(first-2-hex) % num_buckets,
    and buckets are concatenated in bucket order — which equals the
    documented global md5 order only when the mod is MONOTONE in the
    0..255 prefix: num_buckets == 1 or >= 256 (identity). Any value
    in 2..255 would silently interleave the tape bucket-major, i.e.
    produce different shard assignments / window contents than the
    concatenate-then-split loader the oracles replay. Refuse instead."""
    n = int(num_buckets)
    if 1 < n < 256:
        raise ValueError(
            f"num_buckets={n}: values in 2..255 are not order-preserving "
            "for the 2-hex-char bucket key (use 1 or >= 256)"
        )
    if n < 1:
        raise ValueError("num_buckets must be >= 1")
    return n


def pack_sequences(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    salt: str = "pack",
    num_buckets: int = 256,
) -> DataFrame:
    """Per-doc shard assignment on the deterministic concatenation tape.

    Returns (id, n_tokens, start_offset, shard_id): start_offset is
    the doc's position on the tape, shard_id = start_offset div
    budget. A doc straddling a boundary belongs to the shard it starts
    in (concatenate-then-split semantics). Deterministic under any
    partitioning: the order key is md5(salt ‖ id).
    """
    num_buckets = _check_buckets(num_buckets)
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        _order_key(id_col, salt).alias("_key"),
    ).withColumn(
        "_bkt", F.conv(F.substring("_key", 1, 2), 16, 10).cast("int") % num_buckets
    )
    w_in = Window.partitionBy("_bkt").orderBy("_key", "id")
    within = keyed.withColumn(
        "_cum_incl", F.sum("n_tokens").over(w_in)
    )
    # Phase 2: bucket totals are ≤ num_buckets rows no matter the
    # corpus size — the driver prefix-sum is O(num_buckets).
    totals = (
        keyed.groupBy("_bkt").agg(F.sum("n_tokens").alias("_tot")).collect()
    )
    by_bucket = {r["_bkt"]: r["_tot"] for r in totals}
    offsets, running = [], 0
    for b in range(num_buckets):
        offsets.append((b, running))
        running += by_bucket.get(b, 0)
    spark = df.sparkSession
    off_df = spark.createDataFrame(offsets, "_bkt int, _off bigint")
    return (
        within.join(F.broadcast(off_df), "_bkt")
        .select(
            F.col("id").alias(id_col),
            "n_tokens",
            (F.col("_off") + F.col("_cum_incl") - F.col("n_tokens")).alias(
                "start_offset"
            ),
        )
        .withColumn("shard_id", F.expr(f"start_offset div {int(budget)}"))
    )


def training_sequences(
    df: DataFrame,
    tokens_col: str,
    id_col: str = "doc_id",
    seq_len: int = 2048,
    salt: str = "pack",
    num_buckets: int = 256,
    drop_last: bool = True,
    pad_value=None,
    with_spans: bool = False,
    segment_col: str | None = None,
) -> DataFrame:
    """The final training artifact: every document's token array laid
    on the deterministic md5 tape (the :func:`pack_sequences` order)
    and split into consecutive windows of EXACTLY ``seq_len`` tokens —
    concatenate-then-split, the pre-training loader semantics, but
    materialized distributed instead of replayed at load time.

    Returns (seq_id, input_ids, n_docs, n_tokens): ``input_ids`` is
    the window's token slice in tape order (same element type as the
    input arrays — works on tokenizer piece strings or mapped integer
    ids, see :func:`encode_ids`); ``n_docs`` counts the documents
    contributing to the window. ``drop_last`` drops the trailing
    partial window (the pre-training convention); ``pad_value`` keeps
    and right-pads it instead. Empty/null token arrays contribute
    nothing (no zero-length docs on the tape).

    ``with_spans`` adds ``doc_spans array<struct<off int, len int>>``
    — each contributing document's slice as (offset-in-window,
    length), in tape order, covering the window exactly. This is what
    a loader needs to build the block-diagonal attention mask /
    cross-document loss mask over packed sequences; padding (if any)
    is the uncovered tail.

    Scale shape: the same two-phase prefix scan as
    :func:`pack_sequences` (per-bucket window + O(num_buckets) driver
    prefix-sum) places each doc at a global offset; each doc then
    emits one SLICE row per window its span intersects — row count is
    n_docs + total_tokens/seq_len, never token-level explode — and one
    shuffle on seq_id assembles the windows (per-group payload bounded
    by seq_len tokens). Everything is JVM Column arithmetic.

    ``segment_col`` (integer-typed): SEGMENT-major tape — docs order
    by (segment, md5 key) instead of the global md5 key. This is the
    one-shot replay of sequential
    :func:`streaming.packing.training_sequences_append` batches (one
    segment per batch id) — the append-equals-rebuild contract's
    rebuild side.
    """
    L = int(seq_len)
    if L < 1:
        raise ValueError("training_sequences: seq_len must be >= 1")
    if drop_last and pad_value is not None:
        raise ValueError(
            "training_sequences: pad_value requires drop_last=False"
        )
    pieces = tape_piece_rows(
        df, tokens_col, id_col, L, salt, num_buckets,
        with_spans=with_spans, segment_col=segment_col,
    )
    seqs = assemble_windows(pieces, with_spans=with_spans)
    if drop_last:
        return seqs.where(F.col("n_tokens") == L)
    if pad_value is not None:
        return seqs.withColumn(
            "input_ids",
            F.concat(
                F.col("input_ids"),
                F.slice(
                    F.array_repeat(F.lit(pad_value), L),
                    1,
                    (F.lit(L) - F.col("n_tokens")).cast("int"),
                ),
            ),
        )
    return seqs


def tape_piece_rows(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    L: int,
    salt: str,
    num_buckets: int,
    with_spans: bool = False,
    base_offset: int = 0,
    segment_col: str | None = None,
) -> DataFrame:
    """The tape machinery shared by :func:`training_sequences` and the
    incremental :func:`streaming.packing.training_sequences_append`:
    place every doc at its global tape offset (two-phase prefix scan)
    and emit one SLICE row per (doc, window-it-intersects) —
    (seq_id, _ord, _piece[, _span]).

    ``base_offset`` shifts the whole tape (folded into the driver's
    literal offset table — the zero case is plan-identical to no
    parameter at all, keeping the timed entry's signature frozen).
    ``segment_col`` (integer-typed) makes the tape SEGMENT-major:
    docs order by (segment, md5 key) instead of md5 key alone — the
    one-shot equivalent of sequential per-segment appends, and the
    rebuild contract the append path is tested against. Driver state
    grows to n_segments × num_buckets offset rows (segments = ingest
    batches; bounded like the census version count).
    """
    num_buckets = _check_buckets(num_buckets)
    toks = F.col(tokens_col)
    sel = [
        F.col(id_col).alias("id"),
        toks.alias("_toks"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        _order_key(id_col, salt).alias("_key"),
    ]
    if segment_col is not None:
        sel.append(F.col(segment_col).cast("bigint").alias("_seg"))
    keyed = (
        df.select(*sel)
        .where(F.col("n_tokens") > 0)
        .withColumn(
            "_bkt",
            F.conv(F.substring("_key", 1, 2), 16, 10).cast("int")
            % num_buckets,
        )
    )
    spark = df.sparkSession
    if segment_col is None:
        w_in = Window.partitionBy("_bkt").orderBy("_key", "id")
        within = keyed.withColumn("_cum_incl", F.sum("n_tokens").over(w_in))
        totals = (
            keyed.groupBy("_bkt")
            .agg(F.sum("n_tokens").alias("_tot"))
            .collect()
        )
        by_bucket = {r["_bkt"]: r["_tot"] for r in totals}
        offsets, running = [], int(base_offset)
        for b in range(num_buckets):
            offsets.append((b, running))
            running += by_bucket.get(b, 0)
        off_df = spark.createDataFrame(offsets, "_bkt int, _off bigint")
        placed = within.join(F.broadcast(off_df), "_bkt").withColumn(
            "start", F.col("_off") + F.col("_cum_incl") - F.col("n_tokens")
        )
    else:
        w_in = Window.partitionBy("_seg", "_bkt").orderBy("_key", "id")
        within = keyed.withColumn("_cum_incl", F.sum("n_tokens").over(w_in))
        totals = (
            keyed.groupBy("_seg", "_bkt")
            .agg(F.sum("n_tokens").alias("_tot"))
            .collect()
        )
        by_pair = {(r["_seg"], r["_bkt"]): r["_tot"] for r in totals}
        if any(s is None for s, _b in by_pair):
            # a null segment would TypeError in sorted() with other
            # segments present, or silently drop every doc at the
            # null-never-equals-null offset join when alone — the
            # caller's segment column is broken either way, say so
            raise ValueError(
                "tape_piece_rows: segment_col contains nulls"
            )
        segs = sorted({s for s, _b in by_pair})
        offsets, running = [], int(base_offset)
        for s in segs:
            for b in range(num_buckets):
                offsets.append((s, b, running))
                running += by_pair.get((s, b), 0)
        off_df = spark.createDataFrame(
            offsets, "_seg bigint, _bkt int, _off bigint"
        )
        placed = within.join(
            F.broadcast(off_df), ["_seg", "_bkt"]
        ).withColumn(
            "start", F.col("_off") + F.col("_cum_incl") - F.col("n_tokens")
        )
    # one row per (doc, window-it-intersects): windows-per-doc is
    # 1 + n_tokens/L, so total slice rows ~ n_docs + total_tokens/L
    spans = placed.select(
        "_toks",
        "n_tokens",
        "start",
        F.explode(
            F.sequence(
                F.expr(f"start div {L}"),
                F.expr(f"(start + n_tokens - 1) div {L}"),
            )
        ).alias("seq_id"),
    )
    lo = F.greatest(F.lit(0), F.col("seq_id") * L - F.col("start"))
    hi = F.least(F.col("n_tokens"), (F.col("seq_id") + 1) * L - F.col("start"))
    piece_cols = [
        "seq_id",
        F.col("start").alias("_ord"),  # unique per doc -> stable sort key
        F.slice(
            "_toks", (lo + 1).cast("int"), (hi - lo).cast("int")
        ).alias("_piece"),
    ]
    if with_spans:
        # slice offset within the window + slice length, in tape
        # order; collected ALONGSIDE the piece in ONE struct so the
        # assembly pays a single collect_list + sort per window, and
        # both outputs derive from the same sorted list
        piece_cols.append(
            F.struct(
                (F.greatest(F.col("start"), F.col("seq_id") * L)
                 - F.col("seq_id") * L).cast("int").alias("off"),
                (hi - lo).cast("int").alias("len"),
            ).alias("_span")
        )
    return spans.select(*piece_cols)


def assemble_windows(pieces: DataFrame, with_spans: bool) -> DataFrame:
    """Group slice rows into windows: one seq_id shuffle with
    ≤ seq_len payload per group (the other half of the shared tape
    machinery — see :func:`tape_piece_rows`)."""
    if with_spans:
        seqs = pieces.groupBy("seq_id").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(F.col("_ord"), F.col("_piece"), F.col("_span"))
                )
            ).alias("_sorted"),
            F.count(F.lit(1)).alias("n_docs"),
        ).select(
            "seq_id",
            F.flatten(
                F.transform(F.col("_sorted"), lambda x: x["_piece"])
            ).alias("input_ids"),
            "n_docs",
            F.transform(F.col("_sorted"), lambda x: x["_span"]).alias(
                "doc_spans"
            ),
        )
    else:
        seqs = pieces.groupBy("seq_id").agg(
            F.flatten(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(F.col("_ord"), F.col("_piece"))
                        )
                    ),
                    lambda x: x["_piece"],
                )
            ).alias("input_ids"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    return seqs.withColumn("n_tokens", F.size("input_ids"))


#: codegen ceiling for the literal-map vocabulary path (the
#: quality_classifier _EXPR_DIM_LIMIT convention)
_VOCAB_LITERAL_LIMIT = 4096


def encode_ids(
    df: DataFrame,
    pieces_col: str,
    vocab: list[str],
    id_col: str = "doc_id",
    unk_id: int | None = None,
    out_col: str = "input_ids",
) -> DataFrame:
    """Map tokenizer piece strings to integer ids (id = position in
    ``vocab`` — ship the SAME list everywhere and the mapping is
    engine-independent). Out-of-vocabulary pieces map to ``unk_id``,
    or are DROPPED when ``unk_id`` is None (byte-/char-complete
    vocabularies like the unigram/BPE trainers' never produce OOV on
    text they can encode, so the default costs nothing there).

    Vocab ≤ 4096: a literal map lookup inside codegen — zero shuffle,
    zero extra jobs. Bigger vocabularies switch to a broadcast-joined
    (piece, id) relation over a posexplode (order restored by
    position) — the quality-classifier relation-path convention; the
    vocab stays driver-bounded either way (the BPE/PQ factoring)."""
    if not vocab:
        raise ValueError("encode_ids: vocab must be non-empty")
    if len(set(vocab)) != len(vocab):
        # without this, the two paths fail DIFFERENTLY on the same
        # bad input: the literal map raises at runtime (duplicate
        # map key) while the relation join silently emits extra
        # tokens — fail fast and identically instead
        raise ValueError("encode_ids: vocab contains duplicate pieces")
    pieces = F.col(pieces_col)
    if len(vocab) <= _VOCAB_LITERAL_LIMIT:
        m = F.map_from_arrays(
            F.array(*[F.lit(p) for p in vocab]),
            F.array(*[F.lit(i) for i in range(len(vocab))]),
        )
        mapped = F.transform(pieces, lambda t: m[t])
        if unk_id is None:
            mapped = F.filter(mapped, lambda x: x.isNotNull())
        else:
            mapped = F.transform(
                mapped, lambda x: F.coalesce(x, F.lit(int(unk_id)))
            )
        # null pieces array -> EMPTY ids, matching the relation path's
        # contract exactly — the output must not change shape when the
        # vocabulary grows past the literal ceiling
        mapped = F.coalesce(mapped, F.array().cast("array<int>"))
        return df.withColumn(out_col, mapped)
    spark = df.sparkSession
    rel = F.broadcast(
        spark.createDataFrame(
            list(enumerate(vocab)), "tid int, _piece string"
        )
    )
    exploded = df.select(
        F.col(id_col).alias("_eid"),
        F.posexplode_outer(pieces).alias("_pos", "_piece"),
    ).join(rel, "_piece", "left")
    # the empty/null-array marker row from posexplode_outer has a
    # null _pos — it must stay null (dropped below), not become unk
    tid = (
        F.col("tid")
        if unk_id is None
        else F.when(
            F.col("_pos").isNotNull(),
            F.coalesce(F.col("tid"), F.lit(int(unk_id))),
        )
    )
    ids = exploded.groupBy("_eid").agg(
        F.flatten(
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct(F.col("_pos"), tid.alias("t")))
                ),
                lambda x: F.when(
                    x["t"].isNotNull(), F.array(x["t"])
                ).otherwise(F.array().cast("array<int>")),
            )
        ).alias(out_col)
    )
    return df.join(
        ids.withColumnRenamed("_eid", id_col), id_col, "left"
    ).withColumn(
        out_col, F.coalesce(F.col(out_col), F.array().cast("array<int>"))
    )


def shard_manifest(packed: DataFrame) -> DataFrame:
    """Shard-level rollup of a pack_sequences result: doc count and
    token mass per shard (only the last doc of a shard may straddle)."""
    return packed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.min("start_offset").alias("first_offset"),
    )


def pack_ffd(
    df: DataFrame,
    token_col: str,
    id_col: str = "doc_id",
    budget: int = 2048,
    salt: str = "pack",
    num_buckets: int = 256,
) -> DataFrame:
    """First-fit-decreasing packing within deterministic buckets.

    Every bin holds ≤ budget tokens (a single doc larger than the
    budget gets a bin of its own — callers chunk those upstream).
    Bins are local to their bucket; (bucket, bin_in_bucket) is the
    global bin key. Buckets are md5-assigned so bucket token mass is
    balanced; packing quality is within-bucket FFD (≥ the classic
    11/9·OPT+1 guarantee per bucket).
    """
    b = int(budget)

    def _ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per bin
        assigned = []
        for toks in pdf["n_tokens"]:
            t = int(toks)
            for i, rem in enumerate(bins):
                if rem >= t:
                    bins[i] = rem - t
                    assigned.append(i)
                    break
            else:
                bins.append(max(b - t, 0))
                assigned.append(len(bins) - 1)
        pdf = pdf.assign(bin_in_bucket=assigned)
        return pdf[["id", "n_tokens", "bucket", "bin_in_bucket"]]

    # The id keeps its INPUT dtype — a blanket cast("bigint") would
    # silently null string ids (uuid-keyed corpora are the norm).
    id_dtype = dict(df.dtypes)[id_col]
    schema = f"id {id_dtype}, n_tokens bigint, bucket int, bin_in_bucket int"
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("bigint").alias("n_tokens"),
        (
            F.conv(F.substring(_order_key(id_col, salt), 1, 2), 16, 10).cast("int")
            % num_buckets
        ).alias("bucket"),
    )
    return keyed.groupBy("bucket").applyInPandas(_ffd, schema)
