"""Streaming sessionization (SURVEY ST1) — two implementations:

1. ``streaming_session_rollup``: the native ``session_window``
   aggregate + watermark. The Spark-first default: state store managed
   by the engine, merges/expiry automatic, identical semantics to the
   batch gaps-and-islands operator (gap >= g closes a session).

2. ``stateful_sessionize``: ``applyInPandasWithState`` — the custom-
   stateful-operator template for semantics session_window can't
   express (the reference's "session end = next session start − 1s"
   chaining, per-key counters, etc.). Keeps per-player state
   (last_ts, session_number) across micro-batches and emits one row
   per closed session.

Late data: both accept a watermark delay; events older than the
watermark are dropped by the engine (the reference instead relies on
idempotent re-ingest — SURVEY §2.9).
"""

from __future__ import annotations

import pandas as pd  # noqa: F401 — used inside the by-value state fn

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout

from cod_stats_spark.operators._util import epoch_us, ts_to_timestamp
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def streaming_session_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    watermark: str = "30 minutes",
    value_col: str = "value",
) -> DataFrame:
    """session_window aggregation with watermarking (append-able)."""
    # withWatermark requires exact TIMESTAMP (EVENT_TIME_IS_NOT_ON_
    # TIMESTAMP_TYPE on NTZ); normalize in place — value-preserving
    # under the pinned-UTC session tz.
    if dict(events.dtypes).get(ts_col, "") not in ("", "timestamp"):
        events = events.withColumn(ts_col, ts_to_timestamp(events, ts_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, f"{gap_seconds} seconds"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 4).alias("sum_value"),
        )
        .select(
            key_col,
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_number", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_number", LongType()),
        StructField("last_ts_micros", LongType()),
        StructField("start_micros", LongType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def stateful_sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "user_id",
    gap_seconds: int = 1800,
    value_col: str = "value",
    tail_timeout_ms: int | None = None,
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState.

    Emits CLOSED sessions: a new event with gap >= threshold closes the
    previous one, and — when ``tail_timeout_ms`` is set — a processing-
    time inactivity timeout closes a key's final open session (state is
    then removed, bounding the store: without a timeout every key ever
    seen keeps state forever, which leaks at 100 TB key cardinality).
    Arrow-batched: state transitions run per key-batch, not per row
    round-trip.
    """
    _epoch, _per_sec = epoch_us(events, ts_col)
    prepared = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        _epoch.alias("_ts_us"),
        F.col(value_col).cast("double").alias("value"),
        F.lit(gap_seconds * _per_sec).alias("_gap_us"),
    )

    # NESTED function: cloudpickle serializes it BY VALUE. A module-level
    # function pickles by reference, requiring `cod_stats_spark` on every
    # Python worker's import path — which fails whenever the driver's cwd
    # isn't the repo root.
    def session_fn_by_value(key, pdfs, state):
        import pandas as pd

        (user_id,) = key

        def _rows(closed):
            return pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_number": [c[1] for c in closed],
                    "session_start": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[3], unit="us") for c in closed],
                    "n_events": [c[4] for c in closed],
                    "sum_value": [c[5] / 10000.0 for c in closed],
                }
            )

        if tail_timeout_ms is not None and state.hasTimedOut:
            # inactivity expiry: flush the open tail session, drop state
            session_number, last_us, start_us, n_events, sum_units = state.get
            state.remove()
            if last_us is not None:
                yield _rows([(user_id, session_number, start_us, last_us, n_events, sum_units)])
            return

        if state.exists:
            session_number, last_us, start_us, n_events, sum_units = state.get
        else:
            session_number, last_us, start_us, n_events, sum_units = 0, None, None, 0, 0.0

        # sum_units accumulates value quantized to 1e-4 units (exact
        # integers in a double up to 2^53), so the emitted per-session sum
        # is order-independent. PRECONDITION: inputs must be exact
        # multiples of 1e-4 (true for the testdata's 2-decimal values) —
        # only then is per-event quantization identical to an exact
        # DECIMAL sum. Finer-grained inputs would be rounded per event
        # (Python banker's rounding: 0.00005 → 0), which is sum-of-
        # rounded, not round-of-sum; widen the unit for such sources.
        closed = []
        for pdf in pdfs:
            if pdf.empty:
                continue
            gap_us = int(pdf["_gap_us"].iloc[0])
            pdf = pdf.sort_values("_ts_us")
            for ts_us, value in zip(pdf["_ts_us"], pdf["value"]):
                ts_us = int(ts_us)
                if last_us is None or ts_us - last_us >= gap_us:
                    if last_us is not None:
                        closed.append(
                            (user_id, session_number, start_us, last_us, n_events, sum_units)
                        )
                    session_number += 1
                    start_us, n_events, sum_units = ts_us, 0, 0.0
                last_us = ts_us
                n_events += 1
                sum_units += float(round(float(value) * 10000.0))

        state.update((session_number, last_us, start_us, n_events, sum_units))
        if tail_timeout_ms is not None:
            state.setTimeoutDuration(tail_timeout_ms)
        if closed:
            yield _rows(closed)

    timeout_conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if tail_timeout_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        session_fn_by_value,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout_conf,
    )
