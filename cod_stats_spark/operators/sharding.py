"""Deterministic global shuffle + shard assignment for training-data
export.

A training run wants the corpus in shards whose contents are (a)
content-independent pseudo-random (no source/time locality — a shard
must be an unbiased sample), (b) reproducible run-to-run with no RNG
state, and (c) either a fixed COUNT of shards or a fixed SIZE per
shard. Both assignments here derive from md5(salt ‖ id), so the
"shuffle" is a pure projection — changing the salt reshuffles.

- :func:`assign_shards_mod` — fixed shard COUNT. One codegen'd
  projection, zero shuffles, zero coordination: the 100 TB default.
- :func:`assign_shards_fixed_size` — fixed ROWS per shard. Needs each
  row's global position on the md5 tape; reuses the two-phase
  distributed prefix scan from operators/packing.py (per-bucket
  windows + bounded broadcast offsets) rather than a single-task
  global window.
- :func:`write_shards` — clusters rows by shard and writes one
  directory per shard (Hive-style partition layout).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.packing import pack_sequences


def _salted_key(id_col: str, salt: str):
    return F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string")))


def assign_shards_mod(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 1024,
    salt: str = "shard",
) -> DataFrame:
    """Add ``shard_id`` = 60-bit md5 integer mod n_shards.

    Shuffle-free and uniform: expected shard skew at N rows is
    O(sqrt(N / n_shards)). Same-id rows always land together, which
    also makes the assignment join-free to reapply incrementally.
    """
    key60 = F.expr(
        f"cast(conv(substring(md5(concat('{salt}', cast({id_col} as string))),"
        f" 1, 15), 16, 10) as bigint)"
    )
    return df.withColumn("shard_id", key60 % n_shards)


def assign_shards_fixed_size(
    df: DataFrame,
    id_col: str = "doc_id",
    shard_size: int = 10000,
    salt: str = "shard",
) -> DataFrame:
    """(id, row_idx, shard_id): global 0-based position on the md5
    tape and its fixed-size shard. Every shard except the last holds
    exactly ``shard_size`` rows.

    Implementation: sequence packing with every doc costing one token
    — the distributed prefix scan then yields exact global row
    numbers without a single-task global window.
    """
    packed = pack_sequences(
        df.select(F.col(id_col)).withColumn("_one", F.lit(1)),
        "_one",
        id_col,
        budget=shard_size,
        salt=salt,
    )
    return packed.select(
        id_col,
        F.col("start_offset").alias("row_idx"),
        "shard_id",
    )


def write_shards(
    df: DataFrame,
    path: str,
    shard_col: str = "shard_id",
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Write one directory per shard (shard_id=N/...), one file per
    shard: repartition BY THE SHARD COLUMN first so each output task
    owns whole shards — without it, every task writes a sliver of
    every shard and the sink fans out tasks × shards small files."""
    (
        df.repartition(F.col(shard_col))
        .write.partitionBy(shard_col)
        .format(fmt)
        .mode(mode)
        .save(path)
    )


def compact_shards(
    spark,
    src_path: str,
    dest_path: str,
    shard_col: str = "shard_id",
    fmt: str = "parquet",
) -> DataFrame:
    """Small-file compaction for a sharded table: rewrite ``src_path``
    (however fragmented — streaming sinks and task-parallel writers
    leave tasks × shards slivers) into one file per shard directory at
    ``dest_path``, by clustering on the shard column before the write.

    Writes to a NEW location: overwriting a path while lazily reading
    it is unsafe in Spark, and the atomic swap (rename dest over src)
    is the deployment's move — object stores and HDFS each do this
    differently. Returns a per-shard file-count manifest of the
    compacted table. At 100 TB, run per partition-range as shards
    close; each shard rewrite is one task reading its own slivers.
    """
    df = spark.read.format(fmt).load(src_path)
    write_shards(df, dest_path, shard_col=shard_col, fmt=fmt)
    out = spark.read.format(fmt).load(dest_path)
    # input_file_name() is non-deterministic — project it before the
    # aggregate (not inside one)
    return (
        out.select(F.col(shard_col), F.input_file_name().alias("_f"))
        .groupBy(shard_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("_f").alias("n_files"),
        )
    )
