"""Streaming rolling z-score anomaly flags — the monitoring form of
:func:`operators.anomaly.flag_anomalies`.

Each micro-batch scores its events against the key's TRAILING window
[t − window, t) — strictly before the row, exactly the batch
operator's exclusive frame — and APPENDS one row per event with
(zscore, is_anomaly). A spike never inflates the stddev it is judged
against; warm-up rows (fewer than ``min_points`` priors) and
zero-variance windows emit null scores and never flag, and the
negative-variance clamp matches the batch fix (FP cancellation on
large-offset series must yield null, not a NaN flag).

Exact across batches under the stateful-sessionize contract (each
key's events arrive in event-time order batch over batch): the score
of an event depends only on STRICTLY EARLIER observations, which are
all in state by the time it folds — so a single-source static replay
must equal the batch operator row for row (the `stateful_sessions`
gate's 'anomaly' arm replays the batch recurrence in SQL).

State: the trailing window's (epoch_us, value) arrays per key, pruned
to [newest − window, newest] as events fold — bounded by the key's
observation rate × window, the same envelope any exact rolling
monitor carries (RocksDB state store at 100 TB key cardinality).
Equal-timestamp observations exclude each other symmetrically (the
RANGE frame's tie semantics), so fold order of ties is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from cod_stats_spark.operators._util import epoch_us

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("zscore", DoubleType()),
        StructField("is_anomaly", BooleanType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("ts", ArrayType(LongType())),
        StructField("v", ArrayType(DoubleType())),
    ]
)


def stateful_anomaly(
    events: DataFrame,
    value_col: str = "value",
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_seconds: int = 3600,
    k: float = 3.0,
    min_points: int = 5,
) -> DataFrame:
    """(user_id, ts, value, zscore, is_anomaly) — one appended row per
    event, scored against the key's strictly-earlier observations in
    the trailing window. Integral user ids only (the streaming state
    key contract shared with stateful_funnel)."""
    user_dtype = dict(events.dtypes).get(user_col)
    if user_dtype not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise TypeError(
            f"stateful_anomaly: user_col {user_col!r} has type"
            f" {user_dtype!r}; the streaming state is keyed by a long"
        )
    if window_seconds <= 0 or min_points < 1:
        raise ValueError("stateful_anomaly: window_seconds > 0, min_points >= 1")
    # epoch_us returns seconds (multiplier 1) for numeric ts columns and
    # microseconds for timestamp families — the span AND the output
    # rendering must follow the multiplier, not assume micros
    _epoch, per_sec = epoch_us(events, ts_col)
    span_us = int(window_seconds) * per_sec
    ts_unit = "us" if per_sec == 1_000_000 else "s"
    # null event times are dropped JVM-side: a monitoring score has no
    # meaning without a time, and int(NaN) inside the state fold would
    # otherwise kill the whole streaming query on one bad record
    prepared = events.select(
        F.col(user_col).cast("long").alias("user_id"),
        _epoch.alias("_ts_us"),
        F.col(value_col).cast("double").alias("_v"),
    ).where(F.col("_ts_us").isNotNull())

    # nested: cloudpickle ships it by value (no worker import path)
    def anomaly_fn_by_value(key, pdfs, state):
        import math

        import pandas as pd

        (user_id,) = key
        if state.exists:
            ts_hist, v_hist = (list(state.get[0]), list(state.get[1]))
        else:
            ts_hist, v_hist = [], []
        head = 0  # expiry cursor — O(1) amortized, no per-event list shift
        out_ts, out_v, out_z, out_flag = [], [], [], []
        # one global sort over the whole micro-batch for this key: a
        # key spanning multiple Arrow chunks (~10k+ rows) with
        # cross-chunk time disorder would otherwise advance the
        # monotonic expiry cursor past entries still inside a later
        # chunk's earlier window, and break the sortedness the
        # appended history relies on for future expiry
        chunks = [pdf for pdf in pdfs if not pdf.empty]
        if chunks:
            pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            pdf = pdf.sort_values("_ts_us", kind="mergesort")
            for ts_us, v in zip(pdf["_ts_us"], pdf["_v"]):
                ts_us = int(ts_us)
                if pd.isna(v):
                    # a null observation scores null, never flags, and
                    # contributes nothing to later windows — exactly
                    # the batch operator's null-skipping window aggs
                    out_ts.append(ts_us)
                    out_v.append(None)
                    out_z.append(None)
                    out_flag.append(False)
                    continue
                v = float(v)
                lo = ts_us - span_us
                # advance the cursor: nothing older than lo can matter
                # again for this or any later (>= ts_us) event
                while head < len(ts_hist) and ts_hist[head] < lo:
                    head += 1
                # the exclusive frame: [t - window, t). Recomputed per
                # event in ascending order — the float-sum sequence then
                # matches the batch window aggregation (6-decimal oracle
                # parity); a running add/subtract pair would be O(1) per
                # event but drifts, the trade a high-rate deployment can
                # flip with a wider rounding tolerance
                n = 0
                s = ss = 0.0
                for i in range(head, len(ts_hist)):
                    t_x = ts_hist[i]
                    if t_x < ts_us:  # ties excluded, like RANGE ... -1
                        v_x = v_hist[i]
                        n += 1
                        s += v_x
                        ss += v_x * v_x
                z = None
                if n >= min_points:
                    var = max((ss - s * s / n) / (n - 1), 0.0)
                    # NaN var (inf - inf under value overflow) compares
                    # False here, so overflow yields null, never a flag
                    if var > 0:
                        z = (v - s / n) / math.sqrt(var)
                out_ts.append(ts_us)
                out_v.append(v)
                out_z.append(z)
                out_flag.append(z is not None and abs(z) > k)
                ts_hist.append(ts_us)
                v_hist.append(v)
        if out_ts:
            state.update((ts_hist[head:], v_hist[head:]))
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(out_ts),
                    "ts": [pd.Timestamp(t, unit=ts_unit) for t in out_ts],
                    "value": out_v,
                    "zscore": out_z,
                    "is_anomaly": out_flag,
                }
            )

    return prepared.groupBy("user_id").applyInPandasWithState(
        anomaly_fn_by_value,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
