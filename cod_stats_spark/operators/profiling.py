"""One-pass table profiling for data QA at lake scale.

``profile_table`` computes per-column statistics — row count, null
count, approximate distinct cardinality (HLL), min/max, and for
numeric columns mean/stddev — in a SINGLE aggregation job over one
scan. The per-column work is a flat list of agg expressions, so
Catalyst fuses everything into one partial+final hash aggregate with
no shuffle wider than one row; at 100 TB the cost is the scan, as it
must be.

Output is long-form (one row per column) so the profile of a
1000-column table is as readable as a 5-column one, and diffs between
snapshots are row-level. min/max are rendered as strings to keep one
uniform schema across column types.

The reference has no profiling surface; this is part of the
training-data-pipeline extension set (data-quality gates before
expensive downstream stages).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_NUMERIC_EXACT = {"tinyint", "smallint", "int", "bigint", "float", "double"}


def _is_numeric(dtype: str) -> bool:
    # exact names + decimal(p,s): a prefix match would also catch
    # 'interval day to second' (startswith 'int'), whose avg/stddev
    # aggregates raise AnalysisException
    return dtype in _NUMERIC_EXACT or dtype.startswith("decimal")


def _is_orderable(dtype: str) -> bool:
    # min/max over maps/intervals is not defined (ANSI interval types
    # reject ordering aggregates); arrays/structs order but their
    # string rendering is noise in a profile — keep scalars only
    return not (
        dtype.startswith("array") or dtype.startswith("map") or dtype.startswith("struct")
        or dtype.startswith("interval") or dtype == "binary"
    )


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    approx_rsd: float = 0.02,
) -> DataFrame:
    """Long-form profile: one output row per profiled column.

    Columns: ``column, dtype, n_rows, n_null, approx_distinct,
    min_value, max_value, mean, stddev`` (mean/stddev null for
    non-numeric columns, min/max null for non-orderable ones).
    """
    dtypes = dict(df.dtypes)
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        dt = dtypes[c]
        col = F.col(c)
        aggs.append(F.count(F.when(col.isNull(), 1)).alias(f"_null_{c}"))
        aggs.append(
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"_dist_{c}")
        )
        if _is_orderable(dt):
            aggs.append(F.min(col).cast("string").alias(f"_min_{c}"))
            aggs.append(F.max(col).cast("string").alias(f"_max_{c}"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"_min_{c}"))
            aggs.append(F.lit(None).cast("string").alias(f"_max_{c}"))
        if _is_numeric(dt):
            aggs.append(F.round(F.avg(col), 6).alias(f"_mean_{c}"))
            aggs.append(F.round(F.stddev_samp(col), 6).alias(f"_std_{c}"))
        else:
            aggs.append(F.lit(None).cast("double").alias(f"_mean_{c}"))
            aggs.append(F.lit(None).cast("double").alias(f"_std_{c}"))
    one = df.agg(*aggs)
    # pivot the single wide row into long form: one struct per column,
    # then inline — still driver-free, the row is 1×(7·n_cols)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.lit(dtypes[c]).alias("dtype"),
                F.col("_n").alias("n_rows"),
                F.col(f"_null_{c}").alias("n_null"),
                F.col(f"_dist_{c}").alias("approx_distinct"),
                F.col(f"_min_{c}").alias("min_value"),
                F.col(f"_max_{c}").alias("max_value"),
                F.col(f"_mean_{c}").alias("mean"),
                F.col(f"_std_{c}").alias("stddev"),
            )
            for c in cols
        ]
    )
    return one.select(F.inline(structs))
