"""Write-time data layout: Z-order (Morton) multi-dimensional clustering.

At 100 TB the scan you avoid is the cheapest scan: parquet readers
prune row groups / files whose min-max stats exclude the predicate.
A table sorted by ONE column prunes range filters on that column and
nothing else; interleaving the bits of several columns' bucket ids
(the Z-order curve) makes every file cover a small hyper-rectangle,
so range filters on ANY of the participating columns prune.

Spark-first mechanics — everything codegen-side:

- per-column [min, max] comes from ONE driver aggregate (two longs per
  column of driver state);
- bucketing is a linear ``width_bucket`` into 2^bits cells (monotone →
  order-preserving per dimension; quantile bucketing would equalize
  cell population but costs an approxQuantile pass — the min-max form
  is the standard first cut and what the test verifies);
- the Morton key is a fixed chain of shift/or Column expressions
  (bits × dims terms, whole-stage codegen);
- the write is ``repartitionByRange(_z) + sortWithinPartitions(_z)``,
  so files tile the curve contiguously.

``tests/test_layout.py`` proves the claim with pyarrow footer stats:
after a Z-order write, EVERY file's min-max width is a small fraction
of the domain in BOTH columns; after a single-column sort, the other
column spans ~the full domain in every file.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Monotone map of [lo, hi] onto integer cells [0, 2^bits)."""
    cells = 1 << bits
    if hi <= lo:  # constant column: everything in cell 0
        return F.lit(0).cast("long")
    scaled = (col.cast("double") - F.lit(lo)) / F.lit(hi - lo)
    cell = F.floor(scaled * cells).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(cells - 1), cell))


def zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 12,
) -> Column:
    """A Column holding the Morton interleave of ``cols``.

    Column ranges are taken from one min/max aggregate over ``df``
    (driver-side literals in the expression — rerun against the data
    you are writing). dims × bits must fit a long (≤ 63).
    """
    cols = list(cols)
    if len(cols) * bits > 63:
        raise ValueError(f"{len(cols)} cols x {bits} bits exceeds a long")
    aggs = []
    for c in cols:
        aggs += [F.min(F.col(c).cast("double")), F.max(F.col(c).cast("double"))]
    row = df.agg(*aggs).first()
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        # empty input / all-null column: min and max come back null —
        # degrade to the constant-column cell (key 0 everywhere)
        lo_raw, hi_raw = row[2 * ci], row[2 * ci + 1]
        if lo_raw is None or hi_raw is None:
            continue
        lo, hi = float(lo_raw), float(hi_raw)
        cell = _bucket(F.col(c), lo, hi, bits)
        # spread bit b of this column's cell to position b*dims + ci
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(cell, b).bitwiseAND(F.lit(1)),
                    b * len(cols) + ci,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet tiled along the Z-order curve of
    ``cols``: range-partitioned AND sorted by the Morton key, so each
    file's footer min-max covers a compact region of every
    participating column."""
    z = df.withColumn("_z", zorder_key(df, cols, bits))
    parted = (
        z.repartitionByRange(num_files, "_z")
        if num_files
        else z.repartitionByRange("_z")
    )
    parted.sortWithinPartitions("_z").drop("_z").write.mode(mode).parquet(path)


def write_sorted(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Total-order export — CTAS … ORDER BY as a layout operator: a
    SAMPLED range partitioner (repartitionByRange reservoir-samples
    the key distribution, so files get ~equal rows even under skew —
    never a single-reducer global sort) assigns each file a disjoint
    key interval, and a within-partition sort orders rows inside it.
    Every file's footer min-max then covers a slice of the ONE sort
    dimension, the layout for a dominant-predicate column (z-order is
    the multi-dimension trade: compact in all dims, wider in each).
    Point/range predicates on the key prune to the few files whose
    interval intersects."""
    parted = (
        df.repartitionByRange(num_files, *cols)
        if num_files
        else df.repartitionByRange(*cols)
    )
    parted.sortWithinPartitions(*cols).write.mode(mode).parquet(path)
