"""Streaming funnel — incremental per-user step completion.

The streaming form of :func:`operators.funnel.funnel_users`: per-user
state is the vector of step-completion times; each micro-batch folds
its events (sorted by event time) into that vector and EMITS one row
per newly completed (user, step) — append-safe, because a completed
step never un-completes. The batch funnel over the same prefix of
events is the exact oracle (the `stateful_sessions` gate's 'funnel'
arm replays it as chained SQL CTEs).

Semantics are the strict-sequential recurrence: step j completes at
the first event of its type with ts strictly greater than step j-1's
completion time. Within a batch, events are sorted by event time and
folded in order — tie order is irrelevant because the recurrence is
strict (processing equal-ts events in any order yields the same
vector; see the gate tests). ACROSS batches the fold is exact when
each user's events arrive in event-time order batch over batch (the
same contract as stateful sessionization's gap chaining); a late
event older than an already-recorded completion cannot retract it.

State: one nullable long (epoch micros) per step per user — k·8
bytes, the smallest possible exact representation. State must persist
for the key's lifetime: dropping a completed user's vector would
re-emit steps if that user ever produces another event. At 100 TB key
cardinality that is k·8 bytes × users in the state store — the same
envelope the dedup fingerprint state already carries; RocksDB state
store handles it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from cod_stats_spark.operators._util import epoch_us

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", IntegerType()),
        StructField("step_ts", TimestampType()),
    ]
)


def stateful_funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """(user_id, step, step_ts) — one appended row per newly completed
    funnel step (step counts from 1). Events whose type is not a
    funnel step are filtered JVM-side before reaching Python.
    ``max_gap_seconds`` mirrors the batch operator: step j must land
    within the window (t_{j-1}, t_{j-1} + gap] — the greedy fold is
    still exact, because events arrive in time order, so an
    out-of-window candidate implies every later candidate is too."""
    if len(steps) < 1 or len(set(steps)) != len(steps):
        raise ValueError("stateful_funnel: steps must be non-empty and distinct")
    # The state is keyed by a hardcoded LongType user_id; a silent
    # cast of e.g. a string id would null out and collapse every such
    # user into ONE shared state group, corrupting results without an
    # error (the batch funnel_users accepts any id type). Refuse
    # non-integral id columns up front instead.
    user_dtype = dict(events.dtypes).get(user_col)
    if user_dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"stateful_funnel: user_col {user_col!r} has type {user_dtype!r};"
            " the streaming state is keyed by a long — pass an integral id"
            " column (the batch funnel_users operator accepts any id type)"
        )
    k = len(steps)
    # epoch_us returns seconds (multiplier 1) for numeric ts columns —
    # the gap and the output rendering must follow the multiplier
    _epoch, per_sec = epoch_us(events, ts_col)
    gap_us = None if max_gap_seconds is None else int(max_gap_seconds) * per_sec
    ts_unit = "us" if per_sec == 1_000_000 else "s"
    step_idx = F.lit(None).cast("int")
    for i, s in enumerate(reversed(steps)):
        step_idx = F.when(
            F.col(type_col) == s, F.lit(k - 1 - i)
        ).otherwise(step_idx)
    prepared = (
        events.where(F.col(type_col).isin(list(steps)))
        .select(
            F.col(user_col).cast("long").alias("user_id"),
            _epoch.alias("_ts_us"),
            step_idx.alias("_step"),
        )
    )
    state_schema = StructType(
        [StructField(f"t{i + 1}", LongType()) for i in range(k)]
    )

    # nested: cloudpickle ships it by value (no worker import path)
    def funnel_fn_by_value(key, pdfs, state):
        import pandas as pd

        (user_id,) = key
        slots = list(state.get) if state.exists else [None] * k
        filled = sum(1 for s in slots if s is not None)
        newly = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("_ts_us")
            for ts_us, st in zip(pdf["_ts_us"], pdf["_step"]):
                if filled >= k:
                    break
                if int(st) != filled:
                    continue
                ts_us = int(ts_us)
                ok = filled == 0 or (
                    ts_us > slots[filled - 1]
                    and (
                        gap_us is None
                        or ts_us <= slots[filled - 1] + gap_us
                    )
                )
                if ok:
                    slots[filled] = ts_us
                    newly.append((filled + 1, ts_us))
                    filled += 1
        if newly:
            state.update(tuple(slots))
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(newly),
                    "step": [s for s, _ in newly],
                    "step_ts": [
                        pd.Timestamp(t, unit=ts_unit) for _, t in newly
                    ],
                }
            )

    return prepared.groupBy("user_id").applyInPandasWithState(
        funnel_fn_by_value,
        outputStructType=FUNNEL_OUTPUT_SCHEMA,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
