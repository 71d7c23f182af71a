"""As-of join — for each left row, the single latest right row with
right.ts <= left.ts on the same key (the canonical time-series point
lookup; Spark has no native operator — SURVEY/pyspark guide "As-of /
range join").

Implementation: union the two sides with a side marker, one window
sort per key, and last(ignorenulls) to carry the most recent right
payload forward onto left rows. ONE shuffle + sort on (key, ts) —
no nested-loop, no per-key Python; scales like any window aggregate.
Right-side ties on ts resolve to the greatest ``right_tiebreak``
value when one is given; without it tie order is unspecified
(shuffle-dependent), as with pandas merge_asof.

Alternative for very wide right payloads: applyInPandas +
pd.merge_asof per key-group — kept out of the default path because the
union/window form stays entirely in the JVM.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_payload: Sequence[str],
    tolerance_seconds: int | None = None,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """left + latest-right-payload columns (null when no prior right row).

    ``tolerance_seconds``: optional max staleness — matches older than
    the tolerance are nulled (pd.merge_asof semantics).
    ``right_tiebreak``: right column that orders equal-ts right rows;
    the greatest value wins deterministically.
    """
    def _epoch(df: DataFrame, col: str):
        # TIMESTAMP_NTZ / DATE have no direct numeric cast; hop through
        # TIMESTAMP via the shared helper (session tz pinned UTC, so
        # the instant is unchanged). Numeric epoch columns cast as-is.
        from cod_stats_spark.operators._util import ts_to_timestamp

        dtype = dict(df.dtypes)[col]
        if dtype.startswith("timestamp") or dtype in ("date", "string"):
            return ts_to_timestamp(df, col).cast("double")
        return F.col(col).cast("double")

    on = list(on)
    lcols = [c for c in left.columns]
    l = left.select(
        *[F.col(c) for c in lcols],
        _epoch(left, left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(dict(right.dtypes)[right_tiebreak] if right_tiebreak else "int").alias("_tb"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_payload],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes).get(c, "string")).alias(c) for c in lcols if c not in on],
        *[F.col(c) for c in on],
        _epoch(right, right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        (F.col(right_tiebreak) if right_tiebreak else F.lit(None).cast("int")).alias("_tb"),
        *[F.col(c).alias(f"_r_{c}") for c in right_payload],
    ).select(*[F.col(c) for c in lcols], "_t", "_is_left", "_tb", *[f"_r_{c}" for c in right_payload])

    u = l.unionByName(r)
    # right rows sort BEFORE left rows at equal ts (asof is inclusive:
    # right.ts <= left.ts matches); within equal-ts right rows the
    # greatest tiebreak sorts last, so last() picks it
    w = Window.partitionBy(*on).orderBy(
        F.col("_t").asc(), F.col("_is_left").asc(), F.col("_tb").asc_nulls_first()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    carried = [
        F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"_c_{c}")
        for c in right_payload
    ]
    carried_ts = F.last(
        F.when(F.col("_is_left") == 0, F.col("_t")), ignorenulls=True
    ).over(w)
    out = (
        u.select("*", *carried, carried_ts.alias("_rt"))
        .filter(F.col("_is_left") == 1)
    )
    keep = F.lit(True)
    if tolerance_seconds is not None:
        keep = (F.col("_t") - F.col("_rt")) <= F.lit(float(tolerance_seconds))
    final_cols = [F.col(c) for c in lcols] + [
        F.when(keep, F.col(f"_c_{c}")).alias(c) for c in right_payload
    ]
    return out.select(*final_cols)
