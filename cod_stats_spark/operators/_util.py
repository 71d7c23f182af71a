"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ts_to_timestamp(df: DataFrame, col: str) -> Column:
    """A Column of exact type TIMESTAMP for any timestamp-ish input.

    The lake may hand us TIMESTAMP, TIMESTAMP_NTZ (plain parquet
    ``timestamp[us]`` with no tz — what the driver's testdata writes),
    or an ISO string. Functions like ``unix_micros`` and streaming
    ``withWatermark`` accept only TIMESTAMP, so every time-touching
    operator routes through here. The NTZ→TIMESTAMP cast reinterprets
    the naive value in the session time zone, which is pinned UTC
    (session.py:46 / prep_session) — value-preserving.
    """
    dtype = dict(df.dtypes).get(col, "")
    c = F.col(col)
    if dtype == "timestamp":
        return c
    if dtype.startswith("timestamp") or dtype == "date":  # ntz / date32
        return c.cast("timestamp")
    if dtype == "string":
        return F.to_timestamp(c)
    return c.cast("timestamp")


def epoch_us(df: DataFrame, col: str) -> tuple[Column, int]:
    """(integer epoch column, units-per-second) for gap/delta math.

    Timestamp-family columns (incl. TIMESTAMP_NTZ) become exact integer
    microseconds via ``unix_micros`` — sub-second precision survives and
    boundary comparisons (delta == gap) stay exact. Numeric columns are
    treated as epoch seconds and returned as-is (multiplier 1).
    """
    dtype = dict(df.dtypes).get(col, "")
    if dtype.startswith("timestamp") or dtype == "date":
        return F.unix_micros(ts_to_timestamp(df, col)), 1_000_000
    return F.col(col).cast("long"), 1


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
