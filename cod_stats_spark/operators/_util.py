"""Shared operator utilities."""

from __future__ import annotations

import math
import os

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


def _parse_bytes(v: str) -> int:
    """Spark byte-size conf string ('128MB', '134217728b') → bytes."""
    s = v.strip().lower()
    mult = 1
    for suffix, m in (
        ("pb", 1 << 50), ("tb", 1 << 40), ("gb", 1 << 30), ("mb", 1 << 20),
        ("kb", 1 << 10), ("p", 1 << 50), ("t", 1 << 40), ("g", 1 << 30),
        ("m", 1 << 20), ("k", 1 << 10), ("b", 1),
    ):
        if s.endswith(suffix):
            s, mult = s[: -len(suffix)], m
            break
    return int(float(s) * mult)


def _estimated_scan_width(df: DataFrame) -> int | None:
    """Estimate the scan's partition count from file metadata only.

    Replays Spark's FilePartition math for LOCAL files — split each
    file at ``maxSplitBytes = min(maxPartitionBytes, max(openCost,
    (totalBytes + openCost·nFiles) / minPartitionNum))``, then
    bin-pack the splits largest-first with the per-file open cost, the
    exact algorithm in ``FilePartition.getFilePartitions`` — so the
    answer is driver-side and costs a stat() per file, no physical
    planning. Folding in ``spark.sql.files.openCostInBytes`` matters
    in BOTH directions: thousands of tiny files pack into far fewer
    partitions than one-split-per-file would guess (the round-6
    estimate over-counted there and could skip a useful repartition),
    and a handful of mid-size files can split FINER than
    maxPartitionBytes when bytesPerCore is small.

    Returns None when the plan has no file leaves (in-memory /
    shuffled inputs) or the files are not locally stat-able; callers
    fall back to an accurate (but expensive) physical probe then.

    Approximation caveat, documented on purpose: a plan whose width is
    set by a downstream shuffle (join/repartition above the scan) is
    judged by its LEAF scan here. Underestimating costs one redundant
    round-robin repartition of an already-wide df — wasteful but
    correct; for spread()'s call sites (raw or semi-filtered scans)
    the leaf estimate is the real width.
    """
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    spark = df.sparkSession
    try:
        mpb = _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
        )
    except Exception:
        mpb = 128 * 1024 * 1024
    try:
        open_cost = _parse_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", "4194304b")
        )
    except Exception:
        open_cost = 4 * 1024 * 1024
    try:
        min_pn = int(spark.conf.get("spark.sql.files.minPartitionNum"))
    except Exception:
        try:
            min_pn = int(
                spark.conf.get("spark.sql.leafNodeDefaultParallelism")
            )
        except Exception:
            min_pn = spark.sparkContext.defaultParallelism
    sizes = []
    for f in files:
        path = f[7:] if f.startswith("file://") else f
        if not os.path.isabs(path):
            return None  # remote FS — can't stat from the driver cheaply
        try:
            sizes.append(os.path.getsize(path))
        except OSError:
            return None
    total = sum(sizes) + open_cost * len(sizes)
    bytes_per_core = total / max(1, min_pn)
    max_split = min(mpb, max(open_cost, int(bytes_per_core)))
    splits: list[int] = []
    for size in sizes:
        n_chunks = max(1, math.ceil(size / max_split)) if size else 0
        for i in range(n_chunks):
            splits.append(min(max_split, size - i * max_split))
    splits.sort(reverse=True)
    n_parts, cur = 0, 0
    for sp in splits:
        if cur + sp > max_split and cur > 0:
            n_parts += 1
            cur = 0
        cur += sp + open_cost
    if cur > 0:
        n_parts += 1
    return max(1, n_parts)


def materialize(
    df: DataFrame,
    expansion: float = 1.0,
    heap_fraction: float = 0.25,
    label: str = "silver",
    widen: bool = True,
) -> DataFrame:
    """Adaptive silver-layer materialization: heap-cache when it fits,
    scratch-parquet when it doesn't.

    ``df.persist(MEMORY_AND_DISK)`` is the right call when the
    deserialized data fits the executor heap with room to spare — but
    when it doesn't, the columnar cache's failure mode is not graceful
    spill: CachedBatches are built and re-read as multi-MB Java object
    graphs whose transient footprint the memory manager does not
    track, and at heap << data the JVM dies with OOM instead of
    degrading (measured: dedup_pipeline_v2 on the 2 GB sf10eq stratum
    under a 2 GB heap, r8 forced-spill audit — SCALING.md). A parquet
    scratch table has no such cliff: encoded columnar on disk,
    streaming on both write and read — it IS the silver-table
    materialization a 100 TB pipeline performs at this pipeline break
    anyway.

    Decision: Catalyst's size estimate for the plan (file-based, so
    proportional to the real input) times ``expansion`` (the caller's
    deserialized-bytes-per-input-byte factor: shingle arrays blow up
    ~20-50x from parquet text) against ``heap_fraction`` of the JVM
    heap (executor memory via ``spark.executor.memory`` when set —
    real clusters set it — else this JVM's max heap, which IS the
    executor in local mode). Unknown estimates (non-file inputs) and
    any seam failure fall back to the persist path — the behavior
    this helper replaces, and the right default when nothing says the
    input is big.

    ``widen=True`` re-spreads the scratch read-back (a ~150 MB scratch
    table reads back as a handful of parquet splits; downstream
    per-row HOF work wants full width). The persist branch returns
    ``df.persist(MEMORY_AND_DISK)`` EXACTLY — callers' plans are
    byte-identical to the pre-helper shape when memory suffices, so
    bench plan signatures cannot drift.

    Caveat: the scratch branch is a parquet round-trip, so TIMESTAMP
    columns come back as the file flavor (possibly NTZ — see
    `ts_to_timestamp`). Current callers materialize id/text/array
    silver layers with no timestamps; route any time-bearing frame
    through `ts_to_timestamp` downstream as usual.

    Behavioral asymmetry callers should know: the scratch branch runs
    the write job EAGERLY at call time (the persist branch stays lazy
    until the first action), and the returned read-back frame is a
    plain scan — a later ``unpersist()`` on it is a harmless no-op.
    Scratch dirs are registered for removal at interpreter exit, so
    repeated calls in one process don't accumulate tmp trees beyond
    the process lifetime.
    """
    import tempfile

    from pyspark.storagelevel import StorageLevel

    spark = df.sparkSession
    try:
        est = int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        try:
            heap = _parse_bytes(spark.conf.get("spark.executor.memory"))
        except Exception:
            heap = int(
                spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory()
            )
        big = est < (1 << 62) and est * expansion > heap_fraction * heap
    except Exception:
        big = False
    if not big:
        return df.persist(StorageLevel.MEMORY_AND_DISK)
    import atexit
    import shutil

    scratch = tempfile.mkdtemp(prefix=f"cod_stats_scratch_{label}_")
    atexit.register(shutil.rmtree, scratch, ignore_errors=True)
    out = os.path.join(scratch, "data")
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return spread(back) if widen else back


def spread(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Ensure enough partitions to parallelize CPU-heavy per-row work.

    Small local inputs (one parquet row-group) arrive as a single
    partition, serializing everything downstream on one core — and the
    downstream here is interpreted higher-order-function evaluation
    (no whole-stage codegen), so the work is genuinely compute-bound
    even on small tables: full width wins. At real scale the input
    already has >= cores partitions and this is a no-op.

    Width probes, cheapest first:
    1. inputFiles() length (analysis only) — many files ⇒ wide;
    2. file-metadata split estimate (driver-side stat, no JVM
       planning) — replaces the old df.rdd fallback that paid full
       physical planning (~0.4 s on a complex plan) per call;
    3. df.rdd.getNumPartitions() — accurate, expensive, last resort
       (non-file inputs only: createDataFrame tests, shuffled dfs).
    """
    import re

    sc = df.sparkSession.sparkContext
    target = min_parallelism or sc.defaultParallelism
    try:
        plan = df._jdf.queryExecution().analyzed().toString()
    except Exception:
        plan = ""
    # an explicit Repartition/coalesce OVERRIDES every file-based
    # guess — it sets the real width no matter how many leaf files sit
    # below. The analyzed plan prints top-down, so the FIRST match is
    # the outermost (governing) node: repartition(n) prints
    # "Repartition n, true" (AQE never coalesces it), coalesce(n)
    # "Repartition n, false". A coalesce(1) over a many-file scan must
    # widen here, not sneak past the inputFiles() fast path.
    m = re.search(r"Repartition (\d+), (?:true|false)", plan)
    if m:
        return df if int(m.group(1)) >= target else df.repartition(target)
    try:
        # fast POSITIVE check only: many input files ⇒ already wide.
        # Few files does NOT imply narrow (cached/shuffled plans still
        # report their leaf scan's files), so confirm with the metadata
        # estimate before paying a repartition.
        if len(df.inputFiles()) >= target:
            return df
    except Exception:
        pass
    width = _estimated_scan_width(df)
    if width is not None and width >= target and re.search(
        r"\b(Join|Aggregate|Window|Distinct)\b", plan
    ):
        # the leaf files say wide, but a shuffle above the scan sets
        # the real width (and AQE may coalesce it) — the estimate
        # can't see that, so pay the accurate physical probe. This
        # branch only triggers on large inputs (estimate >= target),
        # where the ~0.1-0.4s probe is amortized by the actual work.
        width = None
    if width is None:
        width = df.rdd.getNumPartitions()
    if width < target:
        return df.repartition(target)
    return df
