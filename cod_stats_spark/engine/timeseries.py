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
    """Per-game series + smoothed_10/smoothed_25/cumulative frames.
    game_id tiebreak makes the frame order total (two games can tie on
    (date_key, mode, kills))."""
    return _framed(by_game, ["date_key", "mode", "kills", "game_id"], (10, 25))


def filter_season(ts: DataFrame, start: str, end: str) -> DataFrame:
    """Season slice: inclusive ISO-string range (P9). On partitioned
    silver this prunes partitions; here it's a pushed filter."""
    return ts.filter(F.col("date_key").between(start, end))


def seasonal_daily_timeseries(daily: DataFrame, seasons: DataFrame) -> DataFrame:
    """Per-(player, season) daily series with frames computed WITHIN the
    season window — the reference runs one query per (player, season)
    (O(players×seasons) table rescans); here a single interval join
    fans days into their seasons and ONE window pass frames every
    (player, season) series.

    Boundary quirk preserved: the reference compares the day string
    ('YYYY-MM-DD') lexicographically against the full ISO season bounds,
    so a season's first calendar day sorts BEFORE 'YYYY-MM-DDT...' and
    is excluded — identical here by using the same comparison.
    """
    from cod_stats_spark.operators.interval_join import interval_join

    s = seasons.select(
        F.col("id").alias("season_id"), F.col("start"), F.col("end")
    )
    joined = interval_join(daily, s, "date_key", "start", "end").drop("start", "end")
    out = joined
    for k in (3, 7):
        out = rolling_frames(
            out, ["player_id", "season_id"], ["date_key"], TS_METRICS, k - 1, suffix=f"s{k}"
        )
    return cumulative_frames(
        out, ["player_id", "season_id"], ["date_key"], TS_METRICS, suffix="cume"
    )


def seasonal_by_game_timeseries(by_game: DataFrame, seasons: DataFrame) -> DataFrame:
    """Per-(player, season) per-game series, frames 10/25 + cumulative."""
    from cod_stats_spark.operators.interval_join import interval_join

    s = seasons.select(F.col("id").alias("season_id"), F.col("start"), F.col("end"))
    joined = interval_join(by_game, s, "date_key", "start", "end").drop("start", "end")
    order = ["date_key", "mode", "kills", "game_id"]
    out = joined
    for k in (10, 25):
        out = rolling_frames(
            out, ["player_id", "season_id"], order, TS_METRICS, k - 1, suffix=f"s{k}"
        )
    return cumulative_frames(
        out, ["player_id", "season_id"], order, TS_METRICS, suffix="cume"
    )


def with_ratio_series(ts: DataFrame, suffixes: tuple[str, ...] = ("s3", "s7", "cume")) -> DataFrame:
    """Derived ratio series per frame — the browser statResolver math
    (reference frontend/resources/scripts/index.js:19-135) computed
    engine-side so the serving layer stays dumb (SURVEY §3 entry 3).

    Client division rule: deaths=0 treated as 1 (index.js:27-28);
    zero-game windows yield NULL.
    """
    from cod_stats_spark.engine import metrics as M

    out = ts
    for sfx in suffixes:
        kills = F.col(f"kills_sum_{sfx}")
        deaths = F.col(f"deaths_sum_{sfx}")
        games = F.col(f"matchesPlayed_sum_{sfx}")
        dmg = F.col(f"damageDone_sum_{sfx}")
        gw = F.col(f"gulagKills_sum_{sfx}")
        gl = F.col(f"gulagDeaths_sum_{sfx}")
        out = (
            out.withColumn(f"kdRatio_calc_{sfx}", M.kd_client(kills, deaths))
            .withColumn(f"killsPerGame_{sfx}", M.per_game(kills, games))
            .withColumn(f"damagePerGame_{sfx}", M.per_game(dmg, games))
            .withColumn(f"gulagWinPct_{sfx}", M.rate_pct(gw, gw + gl))
            .withColumn(
                f"monsterPct_{sfx}", M.rate_pct(F.col(f"monsters_sum_{sfx}"), games)
            )
            .withColumn(
                f"gooseeggPct_{sfx}", M.rate_pct(F.col(f"gooseeggs_sum_{sfx}"), games)
            )
        )
    return out
