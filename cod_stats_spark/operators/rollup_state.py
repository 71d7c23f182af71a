"""Incremental rollup maintenance — continuous aggregates from
mergeable partial-agg state.

The production pattern at 100 TB: you never re-aggregate history.
Each ingest batch reduces to a PARTIAL state row per group — count,
sum, min, max, sum-of-squares — stored as a table next to the data;
appending a batch is `merge(stored_state, partial(batch))` (touches
only the state, never the raw history), and any report finalizes the
state into avg/variance/etc. on read. This is the
materialized-rollup / continuous-aggregate idea (TimescaleDB
continuous aggregates, Spark's own partial-aggregation physical plan)
lifted to an explicit, persistable table contract — the same move
:mod:`cod_stats_spark.operators.sketches` makes for approximate
distincts/frequencies, here for the exact algebraic aggregates.

Algebra (Gray et al., "Data Cube", ICDE 1996 taxonomy): count/sum/
sumsq merge by SUM, min/max by MIN/MAX — all associative and
commutative, so any merge tree (daily → monthly → total, replays,
out-of-order batches) converges to the identical state. AVG and
VARIANCE are *algebraic*: finalized from (sum, count) and
(sumsq, sum, count), never merged directly.

The `streaming_daily_counts` gate value-verifies the whole contract:
three date-split batches, state written to parquet and read back
between merges (the stored-state round trip), finalized, and replayed
by the same one-shot SQL the streaming arm uses.

Everything is plain Column arithmetic over one groupBy per batch —
map-side partial aggregation applies, the state is one row per
(group, metric-set), and merges shuffle only state rows (O(groups),
not O(input)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# metric kind -> (partial aggregation over raw rows, merge aggregation
# over state rows). Nulls: sum/min/max/sumsq ignore nulls (SQL agg
# semantics); "count" is count(*) over the batch's rows.
_KINDS = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "sumsq": (lambda c: F.sum(F.col(c) * F.col(c)), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def _check(metrics: dict[str, tuple[str, str | None]]) -> None:
    for name, (kind, col) in metrics.items():
        if kind not in _KINDS:
            raise ValueError(f"rollup state: unknown kind {kind!r} for {name!r}")
        if kind != "count" and col is None:
            raise ValueError(f"rollup state: kind {kind!r} needs a column ({name!r})")


def rollup_partial(
    df: DataFrame,
    group_cols: list[str],
    metrics: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """One batch → its mergeable state: one groupBy producing
    ``metrics`` = {out_name: (kind, col)} with kind in count / sum /
    sumsq / min / max. Store the result as a table; it is the unit
    :func:`rollup_merge` consumes."""
    _check(metrics)
    return df.groupBy(*group_cols).agg(
        *[_KINDS[kind][0](col).alias(name) for name, (kind, col) in metrics.items()]
    )


def rollup_merge(
    group_cols: list[str],
    metrics: dict[str, tuple[str, str | None]],
    *states: DataFrame,
) -> DataFrame:
    """Merge any number of compatible states (same metrics spec):
    union + the per-kind merge agg. Associative/commutative, so
    sequential maintenance, a flat merge of all batches, and any
    nested tree produce the identical state. NOT idempotent (sums
    double-count a re-merged batch) — dedup batch ids upstream, e.g.
    with the S3 incremental anti-join ingest."""
    _check(metrics)
    if not states:
        raise ValueError("rollup_merge: need at least one state")
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols).agg(
        *[_KINDS[kind][1](name).alias(name) for name, (kind, col) in metrics.items()]
    )


def finalize_avg(sum_name: str, count_name: str) -> Column:
    """AVG finalizer: sum/count over the state row."""
    return F.col(sum_name) / F.col(count_name)


def finalize_var(sumsq_name: str, sum_name: str, count_name: str) -> Column:
    """Population-variance finalizer: (sumsq − sum²/n)/n — the
    textbook algebraic decomposition; fine at rollup granularity
    (per-group magnitudes), document cancellation if sums grow huge."""
    n = F.col(count_name)
    s = F.col(sum_name)
    return (F.col(sumsq_name) - s * s / n) / n


def rollup_finalize(
    state: DataFrame,
    group_cols: list[str],
    out_exprs: dict[str, Column],
) -> DataFrame:
    """State → report: select the groups plus derived Columns (use
    :func:`finalize_avg` / :func:`finalize_var` or any expression over
    the state's metric columns)."""
    return state.select(
        *group_cols, *[e.alias(n) for n, e in out_exprs.items()]
    )
