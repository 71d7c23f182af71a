"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame

def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure enough partitions to parallelize CPU-heavy per-row work.

    Small local inputs (one parquet row-group) arrive as a single
    partition, serializing everything downstream on one core — and the
    downstream here is interpreted higher-order-function evaluation
    (no whole-stage codegen), so the work is genuinely compute-bound
    even on small tables: full width wins. At real scale the input
    already has >= cores partitions and this is a no-op.

    The width probe prefers inputFiles() (analysis only) over
    df.rdd.getNumPartitions() (full physical planning + RDD
    conversion, ~0.1 s of driver time per query build).
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    try:
        # fast POSITIVE check only: many input files ⇒ already wide.
        # Few files does NOT imply narrow (cached/shuffled plans still
        # report their leaf scan's files), so confirm with the accurate
        # physical probe before paying a repartition.
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
