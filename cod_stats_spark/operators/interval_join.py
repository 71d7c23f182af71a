"""Interval (range/theta) join of a fact against a small interval dim.

Reference semantics (SURVEY.md J2/J3): every fact row joins each dim row
whose [start, end] interval contains its timestamp — intervals may
overlap (the 'lifetime' season spans all others), intentionally
fanning rows out.

Spark-first: broadcast the dim and let Catalyst plan a
BroadcastNestedLoopJoin — correct and cheap when the dim is small
(seasons: 18 rows). At 100 TB the fact side streams through the
broadcast with zero shuffle. For LARGE interval dims this operator
would need bucketization (equi-join on overlapping time buckets +
residual filter); ``bucketized`` implements that path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str = "start",
    end_col: str = "end",
    how: str = "inner",
    inclusive_end: bool = True,
) -> DataFrame:
    hi = F.col(fact_ts) <= F.col(end_col) if inclusive_end else F.col(fact_ts) < F.col(end_col)
    cond = (F.col(fact_ts) >= F.col(start_col)) & hi
    return fact.join(F.broadcast(intervals), cond, how)


def bucketized_interval_join(
    fact: DataFrame,
    intervals: DataFrame,
    fact_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    how: str = "inner",
) -> DataFrame:
    """Scale path for interval dims too large to broadcast.

    Explode each interval into the time buckets it overlaps, equi-join
    fact rows on their bucket, then apply the residual range predicate.
    Turns an O(n*m) nested loop into a shuffled hash join.
    """
    # floor (not cast-truncate) so negative epochs bucket consistently
    # on both sides — cast('long') truncates toward zero and would
    # misalign pre-1970 timestamps
    b = F.lit(bucket_seconds)

    def _bucket(c):
        return F.floor(F.col(c).cast("long") / b).cast("long")

    iv = intervals.withColumn(
        "_bucket", F.explode(F.sequence(_bucket(start_col), _bucket(end_col)))
    )
    f = fact.withColumn("_bucket", _bucket(fact_ts))
    cond = (
        (f["_bucket"] == iv["_bucket"])
        & (F.col(fact_ts) >= F.col(start_col))
        & (F.col(fact_ts) <= F.col(end_col))
    )
    return f.join(iv, cond, how).drop("_bucket")
