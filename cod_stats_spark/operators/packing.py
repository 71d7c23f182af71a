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
