"""Time-series gap filling — dense daily frames from sparse rollups.

Rollups over real event streams have holes (quiet days, late
partitions, filtered slices), and every downstream consumer of a
daily table — charts, window features, trend models — needs the
dense calendar. The reference's report layer implicitly assumes
dense days (cod-stats frontend/generate_lookup_data.sh daily tables);
this operator makes that contract explicit and distributed:

- span the calendar with ``sequence(min_day, max_day)`` + explode
  (one row per group·day, generated JVM-side — no driver loop),
- left-join the sparse rollup back,
- fill each metric by policy: ``"zero"`` (additive metrics: counts,
  sums), ``"ffill"`` (state-like metrics: last known min/max/price —
  one window with ``last(ignorenulls=True)``), ``"interp"`` (linear
  interpolation between the surrounding present values, day-weighted;
  edge gaps stay null), or ``"null"`` (leave the hole visible).

Shuffle shape: one small per-group span agg + one join keyed on the
GROUP (the calendar side is tiny — groups × days), then a single
window per group·day order for the ffill columns. All Column
operations; replayed in DuckDB by the `streaming_daily_counts` gate's
'gapfill' arm (generate_series + IGNORE NULLS window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FILL_POLICIES = ("zero", "ffill", "interp", "null")


def resample_daily(
    df: DataFrame,
    day_col: str,
    group_cols: list[str],
    fills: dict[str, str],
    span: str = "per_group",
) -> DataFrame:
    """Dense (group..., day) frame from a sparse daily table.

    ``fills`` maps metric column → policy ("zero" | "ffill" | "null").
    ``span``: "per_group" densifies each group's own [min, max] day
    range; "global" uses the table-wide range for every group (the
    report-grid shape). Rows present in the input pass through
    unchanged; only the generated gap rows are filled."""
    for c, p in fills.items():
        if p not in FILL_POLICIES:
            raise ValueError(f"resample_daily: unknown fill {p!r} for {c!r}")
    if span not in ("per_group", "global"):
        raise ValueError(f"resample_daily: unknown span {span!r}")

    if span == "per_group":
        spans = df.groupBy(*group_cols).agg(
            F.min(day_col).alias("_lo"), F.max(day_col).alias("_hi")
        )
    else:
        glob = df.agg(
            F.min(day_col).alias("_lo"), F.max(day_col).alias("_hi")
        )
        spans = df.select(*group_cols).distinct().crossJoin(F.broadcast(glob))

    calendar = spans.select(
        *group_cols,
        F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias(day_col),
    )
    dense = calendar.join(df, [*group_cols, day_col], "left")

    ffill_cols = [c for c, p in fills.items() if p == "ffill"]
    interp_cols = [c for c, p in fills.items() if p == "interp"]
    if ffill_cols or interp_cols:
        back = (
            Window.partitionBy(*group_cols)
            .orderBy(day_col)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        for c in ffill_cols:
            dense = dense.withColumn(c, F.last(c, ignorenulls=True).over(back))
        if interp_cols:
            fwd = (
                Window.partitionBy(*group_cols)
                .orderBy(F.col(day_col).desc())
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            for c in interp_cols:
                present_day = F.when(F.col(c).isNotNull(), F.col(day_col))
                pv = F.last(c, ignorenulls=True).over(back)
                pd_ = F.last(present_day, ignorenulls=True).over(back)
                nv = F.last(c, ignorenulls=True).over(fwd)
                nd = F.last(present_day, ignorenulls=True).over(fwd)
                frac = F.datediff(F.col(day_col), pd_) / F.datediff(nd, pd_)
                dense = dense.withColumn(
                    c,
                    F.when(F.col(c).isNotNull(), F.col(c)).when(
                        pv.isNotNull() & nv.isNotNull(),
                        pv + (nv - pv) * frac,
                    ),
                )
    for c, p in fills.items():
        if p == "zero":
            dense = dense.withColumn(
                c, F.coalesce(F.col(c), F.lit(0).cast(dense.schema[c].dataType))
            )
    return dense
