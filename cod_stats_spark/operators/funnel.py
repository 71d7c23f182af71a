"""Funnel and cohort-retention analytics over event streams.

The product-analytics pair every event-shaped store grows into (the
reference's match-event domain included — "of the players who queued,
how many deployed, then won?" is a funnel; "how many of January's new
players were still playing in week 4?" is retention). Both are pure
DataFrame compositions: shuffles only on the user key and the
grouping keys, everything SQL-replayable for the `stat_aggregates`
gate arms.

Funnel semantics (the strict sequential kind): a user completes step
k+1 at the EARLIEST event of that step type occurring strictly after
the user's step-k completion time (and within ``max_gap`` seconds of
it when given). min-of-ts is deterministic regardless of event order;
each level is one filtered scan joined on the user key against the
previous level's (user, ts) frame — k-1 equi joins total, each
broadcast-eligible as the surviving population shrinks, all
co-partitioned on the user key so AQE typically reuses one exchange.

Cohort retention: cohort = calendar period of the user's first event;
activity = distinct (user, period); offset = periods since cohort.
Two shuffles (first-touch agg, cohort-grid agg) regardless of scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_users(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """(user, t1..tk) — one row per user who completed at least step 1;
    t_i is the completion timestamp of step i (null once the user
    drops out). Steps must be distinct event types."""
    if len(steps) < 1:
        raise ValueError("funnel_users: need at least one step")
    if len(set(steps)) != len(steps):
        raise ValueError("funnel_users: steps must be distinct")
    u = F.col(user_col)
    cur = (
        events.where(F.col(type_col) == steps[0])
        .groupBy(user_col)
        .agg(F.min(ts_col).alias("t1"))
    )
    out = cur
    for i, step in enumerate(steps[1:], start=2):
        prev_t = F.col(f"t{i - 1}")
        nxt = events.where(F.col(type_col) == step).select(
            u.alias("_u"), F.col(ts_col).alias("_ts")
        )
        cond = (F.col("_ts") > prev_t)
        if max_gap_seconds is not None:
            cond = cond & (
                F.col("_ts")
                <= prev_t + F.expr(f"INTERVAL {int(max_gap_seconds)} SECOND")
            )
        out = (
            out.join(nxt, (u == F.col("_u")) & cond, "left")
            .groupBy(*out.columns)
            .agg(F.min("_ts").alias(f"t{i}"))
        )
    return out


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """(step, step_name, n_users, conversion) — the funnel report.
    ``conversion`` is n_users at this step / n_users at step 1,
    rounded to 6 places (1.0 at step 1)."""
    per_user = funnel_users(
        events, steps, user_col, type_col, ts_col, max_gap_seconds
    )
    counts = per_user.agg(
        *[
            F.count(F.col(f"t{i}")).alias(f"n{i}")
            for i in range(1, len(steps) + 1)
        ]
    )
    rows = None
    for i, name in enumerate(steps, start=1):
        row = counts.select(
            F.lit(i).alias("step"),
            F.lit(name).alias("step_name"),
            F.col(f"n{i}").alias("n_users"),
            F.round(
                F.col(f"n{i}")
                / F.when(F.col("n1") > 0, F.col("n1")).otherwise(F.lit(None)),
                6,
            ).alias("conversion"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def _funnel_ctes(
    steps: list[str],
    src: str,
    user_sql: str,
    type_sql: str,
    ts_sql: str,
    max_gap_seconds: int | None,
) -> list[str]:
    """The chained s1..sk CTEs both oracle renderers share."""
    ctes = [
        f"s1 AS (SELECT {user_sql} AS u, min({ts_sql}) AS t FROM {src} "
        f"WHERE {type_sql} = '{steps[0]}' GROUP BY u)"
    ]
    for i, step in enumerate(steps[1:], start=2):
        gap = (
            f" AND e.{ts_sql} <= p.t + INTERVAL {int(max_gap_seconds)} SECOND"
            if max_gap_seconds is not None
            else ""
        )
        ctes.append(
            f"s{i} AS (SELECT e.{user_sql} AS u, min(e.{ts_sql}) AS t "
            f"FROM {src} e JOIN s{i - 1} p ON e.{user_sql} = p.u "
            f"AND e.{ts_sql} > p.t{gap} "
            f"WHERE e.{type_sql} = '{step}' GROUP BY e.{user_sql})"
        )
    return ctes


def funnel_steps_oracle_sql(
    steps: list[str],
    src: str = "events",
    user_sql: str = "user_id",
    type_sql: str = "event_type",
    ts_sql: str = "ts",
    max_gap_seconds: int | None = None,
) -> str:
    """DuckDB replica of funnel_users flattened to one row per
    completed (user, step): (user_id, step, step_ts) — the oracle for
    the streaming funnel's append stream."""
    ctes = _funnel_ctes(steps, src, user_sql, type_sql, ts_sql, max_gap_seconds)
    selects = [
        f"SELECT u AS user_id, {i} AS step, t AS step_ts FROM s{i}"
        for i in range(1, len(steps) + 1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def funnel_oracle_sql(
    steps: list[str],
    src: str = "events",
    user_sql: str = "user_id",
    type_sql: str = "event_type",
    ts_sql: str = "ts",
    max_gap_seconds: int | None = None,
) -> str:
    """DuckDB replica of funnel_counts — the same earliest-after-prev
    recurrence as chained CTEs."""
    ctes = _funnel_ctes(steps, src, user_sql, type_sql, ts_sql, max_gap_seconds)
    selects = [
        f"SELECT {i} AS step, '{name}' AS step_name, "
        f"(SELECT count(*) FROM s{i}) AS n_users, "
        f"round((SELECT count(*) FROM s{i}) / "
        f"nullif((SELECT count(*) FROM s1), 0)::DOUBLE, 6) AS conversion"
        for i, name in enumerate(steps, start=1)
    ]
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(selects)


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "week",
) -> DataFrame:
    """(cohort, period_offset, n_active, cohort_size, retention) —
    the retention triangle. cohort = date_trunc(period) of the user's
    first event; a user is active in a period if they have any event
    in it; retention = n_active / cohort_size rounded to 6."""
    if period not in ("week", "month", "day"):
        raise ValueError("cohort_retention: period must be day|week|month")
    per = F.to_date(F.date_trunc(period, F.col(ts_col)))
    first = events.groupBy(user_col).agg(F.min(per).alias("cohort"))
    active = events.select(F.col(user_col), per.alias("_p")).distinct()
    if period == "month":
        off = F.months_between(F.col("_p"), F.col("cohort")).cast("int")
    elif period == "week":
        off = (F.datediff(F.col("_p"), F.col("cohort")) / 7).cast("int")
    else:
        off = F.datediff(F.col("_p"), F.col("cohort"))
    grid = (
        active.join(first, user_col)
        .groupBy(F.col("cohort"), off.alias("period_offset"))
        .agg(F.countDistinct(user_col).alias("n_active"))
    )
    size = first.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return grid.join(size, "cohort").select(
        "cohort",
        "period_offset",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


def cohort_oracle_sql(
    src: str = "events",
    user_sql: str = "user_id",
    ts_sql: str = "ts",
    period: str = "week",
) -> str:
    """DuckDB replica of cohort_retention."""
    per = f"CAST(date_trunc('{period}', {ts_sql}) AS DATE)"
    if period == "month":
        off = "(12 * (year(p) - year(cohort)) + (month(p) - month(cohort)))"
    elif period == "week":
        off = "(date_diff('day', cohort, p) // 7)"
    else:
        off = "date_diff('day', cohort, p)"
    return f"""
WITH first AS (
  SELECT {user_sql} AS u, min({per}) AS cohort FROM {src} GROUP BY u
),
active AS (SELECT DISTINCT {user_sql} AS u, {per} AS p FROM {src}),
grid AS (
  SELECT f.cohort, {off}::INT AS period_offset, count(DISTINCT a.u) AS n_active
  FROM active a JOIN first f ON a.u = f.u
  GROUP BY f.cohort, period_offset
),
sz AS (SELECT cohort, count(*) AS cohort_size FROM first GROUP BY cohort)
SELECT g.cohort, g.period_offset, g.n_active, s.cohort_size,
       round(g.n_active / s.cohort_size::DOUBLE, 6) AS retention
FROM grid g JOIN sz s USING (cohort)
"""
