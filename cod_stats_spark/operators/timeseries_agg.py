"""Time-series hyperfunctions: OHLC downsampling and time-weighted
averages — the hypertable-rollup family (TimescaleDB's time_bucket +
first/last + time_weight, InfluxDB's aggregateWindow) as pure
DataFrame algebra.

Plain AVG over irregular observations answers "what was the mean of
the REPORTS"; operations over state-like series (prices, gauges,
player counts) need "what was the mean of the VALUE over TIME" —
each observation held (LOCF) until the next one. That weighting is
what :func:`time_weighted_avg` computes, exactly, in integer
microseconds:

- an observation at t with successor at t' contributes value·(t'−t)
  to every bucket it overlaps, clipped at bucket edges — a segment
  [t, t') exploded over the (usually 1-2) bucket indices it covers
  via `sequence`; the per-key final observation has no successor and
  by definition contributes nothing (no known duration — document
  your stream's heartbeat if you need it to).
- weights are exact longs; only the final Σ(v·w)/Σw division is
  float, so a SQL engine replays the numbers to 1 ulp.

Shuffles: one (key) window for the successor lookup, one
(key, bucket) aggregation — both O(observations); the bucket explode
multiplies rows only by the buckets a segment actually crosses, so
total exploded rows ≤ observations + Σ_keys (key time-span / bucket)
— the SAME cardinality a dense per-bucket output has, because that
is what LOCF-into-every-bucket means. A sparse key observed years
apart therefore emits one row per bucket of the gap; pick the bucket
size for the report you actually want, or filter segments with
``t2 - t`` above a staleness cap first if a value should not be
held across long outages.

:func:`ohlc_downsample` is the companion shape for the same series:
per (key, bucket) open/high/low/close + observation count. Rows must
be unique per (key, ts) — pre-aggregate ties like the as-of gate
does — which makes min_by/max_by deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators._util import epoch_us

_US = 1_000_000


def ohlc_downsample(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """(key..., bucket_start, open, high, low, close, n_obs) per
    (key, bucket). open/close are the values at the bucket's first
    and last observation timestamps (unique-(key, ts) contract);
    bucket_start is an epoch-second long (bucket_seconds · index) —
    timestamp-flavor-free, so oracles and NTZ lakes agree."""
    key_cols = list(key_cols)
    ep, per_sec = epoch_us(df, ts_col)
    unit = per_sec  # per-second multiplier of the epoch column
    b = F.floor(ep / F.lit(bucket_seconds * unit))
    return (
        df.select(
            *key_cols,
            ep.alias("_t"),
            b.alias("_b"),
            F.col(value_col).alias("_v"),
        )
        .groupBy(*key_cols, "_b")
        .agg(
            F.min_by("_v", "_t").alias("open"),
            F.max("_v").alias("high"),
            F.min("_v").alias("low"),
            F.max_by("_v", "_t").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            *key_cols,
            (F.col("_b") * bucket_seconds).cast("long").alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    bucket_seconds: int,
) -> DataFrame:
    """(key..., bucket_start, twa, weight_seconds) — the LOCF
    time-weighted mean of the series per (key, bucket). Buckets with
    no held value (before the key's first observation, after its
    last) simply don't appear; a bucket fully inside one held segment
    appears with the held value and full weight."""
    from pyspark.sql import Window

    key_cols = list(key_cols)
    ep, per_sec = epoch_us(df, ts_col)
    unit = per_sec
    bucket_units = bucket_seconds * unit
    w = Window.partitionBy(*key_cols).orderBy("_t")
    seg = (
        df.select(
            *key_cols, ep.alias("_t"), F.col(value_col).alias("_v")
        )
        .withColumn("_t2", F.lead("_t").over(w))
        .where(F.col("_t2").isNotNull())  # final obs: no duration
    )
    b0 = F.floor(F.col("_t") / bucket_units)
    # last covered bucket: the one holding t2−1 (segments are [t, t2))
    b1 = F.floor((F.col("_t2") - 1) / bucket_units)
    exploded = seg.select(
        *key_cols,
        "_t",
        "_t2",
        "_v",
        F.explode(F.sequence(b0, b1)).alias("_b"),
    )
    lo = F.greatest(F.col("_t"), F.col("_b") * bucket_units)
    hi = F.least(F.col("_t2"), (F.col("_b") + 1) * bucket_units)
    wgt = (hi - lo).cast("long")
    return (
        exploded.select(*key_cols, "_b", "_v", wgt.alias("_w"))
        .groupBy(*key_cols, "_b")
        .agg(
            (F.sum(F.col("_v") * F.col("_w")) / F.sum("_w")).alias("twa"),
            (F.sum("_w") / F.lit(float(unit))).alias("weight_seconds"),
        )
        .select(
            *key_cols,
            (F.col("_b") * bucket_seconds).cast("long").alias("bucket_start"),
            "twa",
            "weight_seconds",
        )
    )


def streaming_ohlc(
    events: DataFrame,
    ts_col: str,
    key_cols: Sequence[str],
    value_col: str,
    bucket_seconds: int,
    watermark: str = "30 minutes",
) -> DataFrame:
    """The streaming form of :func:`ohlc_downsample`: watermarked
    tumbling-window aggregation — min_by/max_by and the extremes are
    all mergeable, so the state store holds one partial OHLC row per
    open (key, bucket) and late data inside the watermark folds in.
    Same output schema as the batch operator (bucket_start epoch
    seconds), so the two are directly comparable on a static replay
    (see tests)."""
    from cod_stats_spark.operators._util import ts_to_timestamp

    key_cols = list(key_cols)
    if dict(events.dtypes).get(ts_col, "") not in ("", "timestamp"):
        events = events.withColumn(ts_col, ts_to_timestamp(events, ts_col))
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, f"{bucket_seconds} seconds"), *key_cols
        )
        .agg(
            F.min_by(value_col, ts_col).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(value_col, ts_col).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
        )
        .select(
            *key_cols,
            F.unix_timestamp(F.col("window.start")).alias("bucket_start"),
            "open",
            "high",
            "low",
            "close",
            "n_obs",
        )
    )


def ohlc_oracle_sql(
    src: str,
    ts_sql: str,
    key_sql: str,
    value_sql: str,
    bucket_seconds: int,
) -> str:
    """DuckDB replica of ohlc_downsample (epoch via microseconds)."""
    us = f"epoch_us({ts_sql})"
    return f"""
SELECT {key_sql} AS k,
       (({us} // {bucket_seconds * _US}) * {bucket_seconds})::BIGINT AS bucket_start,
       arg_min({value_sql}, {us}) AS open,
       max({value_sql}) AS high,
       min({value_sql}) AS low,
       arg_max({value_sql}, {us}) AS close,
       count(*) AS n_obs
FROM {src}
GROUP BY k, bucket_start
"""


def twa_oracle_sql(
    src: str,
    ts_sql: str,
    key_sql: str,
    value_sql: str,
    bucket_seconds: int,
) -> str:
    """DuckDB replica of time_weighted_avg — identical integer-micro
    segment/clip arithmetic."""
    bu = bucket_seconds * _US
    return f"""
WITH obs AS (
  SELECT {key_sql} AS k, epoch_us({ts_sql}) AS t, {value_sql} AS v
  FROM {src}
),
seg AS (
  SELECT k, t, v, lead(t) OVER (PARTITION BY k ORDER BY t) AS t2
  FROM obs
),
ex AS (
  SELECT k, t, t2, v, unnest(generate_series(t // {bu}, (t2 - 1) // {bu})) AS b
  FROM seg WHERE t2 IS NOT NULL
),
clipped AS (
  SELECT k, b, v,
         (least(t2, (b + 1) * {bu}) - greatest(t, b * {bu}))::BIGINT AS w
  FROM ex
)
SELECT k, (b * {bucket_seconds})::BIGINT AS bucket_start,
       sum(v * w) / sum(w)::DOUBLE AS twa,
       sum(w) / {float(_US)!r} AS weight_seconds
FROM clipped
GROUP BY k, b
"""
