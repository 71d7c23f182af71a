"""Top-K operators (SURVEY.md T1–T3, W5).

``top_k``: global top-k with a deterministic tiebreak — physically a
TakeOrderedAndProject (per-partition heap + driver merge of k rows), the
plan that survives any scale: no global sort, no single-partition shuffle.

``top_k_per_group``: the canonical row_number()<=k pattern — one shuffle
on the group key, then a per-partition sort; k rows kept per group.

Ties: SQL LIMIT cuts ties arbitrarily (SURVEY.md §7.4.8) — both helpers
force a total order via explicit tiebreak columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _order(order_by: Sequence[tuple[str, bool]]):
    # (column, descending)
    return [F.col(c).desc() if desc else F.col(c).asc() for c, desc in order_by]


def top_k(df: DataFrame, order_by: Sequence[tuple[str, bool]], k: int) -> DataFrame:
    return df.orderBy(*_order(order_by)).limit(k)


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[tuple[str, bool]],
    k: int,
    rank_col: str = "rn",
    keep_rank: bool = False,
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*_order(order_by))
    out = df.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)
    return out if keep_rank else out.drop(rank_col)
