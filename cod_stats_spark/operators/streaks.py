"""Consecutive-run detection — the dense_rank gaps-and-islands trick.

Reference semantics (SURVEY.md W7; frontend/generate_lookup_data.sh:356-414):
group id = row_number over (key) − row_number over (key, value); rows in
one consecutive run of equal ``value`` share a group id; then rollup per
run. (The reference uses DENSE_RANK over timestamps, equivalent when the
order column is unique; row_number keeps it correct under ties given a
total order.)

Scale: two window functions over the SAME partitioning+ordering → one
shuffle + one sort, evaluated in a single pass.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def run_lengths(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    run_id_col: str = "run_grp",
) -> DataFrame:
    """Annotate rows with a per-(key, value) run group id.

    Rows with the same ``run_id_col`` + ``value_col`` within a key form
    one maximal consecutive run. Aggregate downstream with
    ``groupBy(*key_cols, value_col, run_id_col).count()``.
    """
    order = [F.col(c).asc() for c in order_cols]
    w_all = Window.partitionBy(*key_cols).orderBy(*order)
    w_val = Window.partitionBy(*key_cols, value_col).orderBy(*order)
    return df.withColumn(
        run_id_col, F.row_number().over(w_all) - F.row_number().over(w_val)
    )


def longest_runs(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    k: int = 1,
) -> DataFrame:
    """Top-k longest consecutive runs per (key, value)."""
    runs = run_lengths(df, key_cols, order_cols, value_col)
    per_run = runs.groupBy(*key_cols, value_col, "run_grp").agg(
        F.count(F.lit(1)).alias("run_length"),
        F.min(order_cols[0]).alias("run_start"),
        F.max(order_cols[0]).alias("run_end"),
    )
    w = Window.partitionBy(*key_cols, value_col).orderBy(
        F.col("run_length").desc(), F.col("run_start").asc()
    )
    return (
        per_run.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn", "run_grp")
    )
