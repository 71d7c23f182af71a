"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure enough partitions to parallelize CPU-heavy per-row work.

    Small local inputs (one parquet row-group) arrive as a single
    partition, serializing everything downstream on one core. At real
    scale the input already has >= cores partitions and this is a
    no-op — the repartition only fires when the scan is narrower than
    the cluster.
    """
    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
