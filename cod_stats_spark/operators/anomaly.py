"""Rolling z-score anomaly flags — the monitoring primitive over an
event or metric stream.

Composition of the already-verified rolling machinery: each row is
scored against the TRAILING window of its key's history EXCLUDING
itself (a point must not mask its own spike — the window is
[t − window, t) via the exclusive upper bound), flagged when
|value − mean| > k·stddev. Exclusion matters twice: a genuine spike
inflates the window stddev it is judged against, and the first rows
of a key have no history at all — both handled by ``min_points``
(rows with fewer prior observations are never flagged, score null).

One key-window shuffle, no joins; stddev uses the numerically-stable
sum/sumsq form the rollup_state family already standardizes on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.operators._util import epoch_us


def flag_anomalies(
    df: DataFrame,
    value_col: str,
    key_cols: Sequence[str],
    ts_col: str,
    window_seconds: int,
    k: float = 3.0,
    min_points: int = 5,
    out_score: str = "zscore",
    out_flag: str = "is_anomaly",
) -> DataFrame:
    """df + (zscore, is_anomaly). zscore = (v − mean)/stddev over the
    key's observations in [t − window, t) — strictly BEFORE the row;
    null (and never flagged) when fewer than ``min_points`` prior
    observations exist or the window variance is zero."""
    key_cols = list(key_cols)
    ep, per_sec = epoch_us(df, ts_col)
    span = window_seconds * per_sec
    src = df.withColumn("_ep", ep)
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ep")
        .rangeBetween(-span, -1)  # exclusive of the current row
    )
    n = F.count(F.col(value_col)).over(w)
    s = F.sum(F.col(value_col)).over(w)
    ss = F.sum(F.col(value_col) * F.col(value_col)).over(w)
    mean = s / n
    # FP cancellation on large-magnitude near-constant series can push
    # ss − s²/n slightly NEGATIVE; sqrt would then be NaN, and Spark's
    # NaN ordering makes `NaN > 0` TRUE — an unguarded std check would
    # FLAG the row with a NaN score. Clamp and gate on var > 0. The
    # same ordering makes greatest(NaN, 0) = NaN when the variance
    # arithmetic OVERFLOWS (|v| ≳ 1e154 ⇒ inf − inf), so the gate also
    # excludes NaN explicitly — overflow yields null, never a flag.
    var = F.greatest(
        (ss - s * s / n) / (n - 1), F.lit(0.0)
    )
    std = F.sqrt(var)
    z = (F.col(value_col) - mean) / std
    score = F.when(
        (n >= min_points) & (var > 0) & ~F.isnan(var), z
    )
    return src.withColumn(out_score, score).withColumn(
        out_flag, F.coalesce(F.abs(score) > F.lit(k), F.lit(False))
    ).drop("_ep")
