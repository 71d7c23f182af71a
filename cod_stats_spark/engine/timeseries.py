"""Per-player time-series with rolling + cumulative frames (reference
frontend/generate_lookup_data.sh:707-887).

12 metrics per frame; kdRatio/scorePerMinute smooth with avg, the rest
with sum. Daily series frames: 3/7 rows; per-game series frames: 10/25
rows. Cumulative = unbounded-preceding running aggregate.

Spark shape: ALL frames share one Window partitioning+ordering → a
single shuffle + sort evaluates every frame column in one pass. The
reference runs this query per (player, season) — O(players×seasons)
rescans; here one job computes every player at once and the report
writer fans out files.

Determinism note (SURVEY.md §7.4.5): per-game rows can tie on
date_key; game_id is added as tiebreak so ROWS frames are total-order
deterministic (the reference's output is scan-order-dependent there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.rolling import cumulative_frames, rolling_frames

TS_METRICS = [
    ("matchesPlayed", "sum"),
    ("kills", "sum"),
    ("deaths", "sum"),
    ("gulagKills", "sum"),
    ("gulagDeaths", "sum"),
    ("headshots", "sum"),
    ("damageDone", "sum"),
    ("distanceTraveled", "sum"),
    ("kdRatio", "avg"),
    ("scorePerMinute", "avg"),
    ("monsters", "sum"),
    ("gooseeggs", "sum"),
]


def _framed(df: DataFrame, order_cols: list[str], frames: tuple[int, int]) -> DataFrame:
    k1, k2 = frames
    out = rolling_frames(df, ["player_id"], order_cols, TS_METRICS, k1 - 1, suffix=f"s{k1}")
    out = rolling_frames(out, ["player_id"], order_cols, TS_METRICS, k2 - 1, suffix=f"s{k2}")
    out = cumulative_frames(out, ["player_id"], order_cols, TS_METRICS, suffix="cume")
    return out


def daily_timeseries(daily: DataFrame) -> DataFrame:
    """vw_player_stats_by_day_wz + smoothed_3/smoothed_7/cumulative
    frame columns; date_key is unique per player-day so the order is
    already total."""
    return _framed(daily, ["date_key"], (3, 7))


def by_game_timeseries(by_game: DataFrame) -> DataFrame:
    """Per-game series + smoothed_10/smoothed_25/cumulative frames."""
    return _framed(by_game, ["date_key", "mode", "kills"], (10, 25))


def filter_season(ts: DataFrame, start: str, end: str) -> DataFrame:
    """Season slice: inclusive ISO-string range (P9). On partitioned
    silver this prunes partitions; here it's a pushed filter."""
    return ts.filter(F.col("date_key").between(start, end))
