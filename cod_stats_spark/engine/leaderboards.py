"""Leaderboards (reference frontend/generate_lookup_data.sh:93-512).

- by-game boards: top-10 single-game values for 12 metrics
- lifetime boards: consecutive gulag win/loss streaks (the DENSE_RANK
  difference trick, SURVEY W7), most wins, most last places
- recent matches (15), recent sessions (top-1 session per player)

All boards get a deterministic tiebreak (metric DESC, date_key, game_id,
player_id) — SQL LIMIT alone cuts ties arbitrarily (SURVEY.md §7.4.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.operators.streaks import run_lengths
from cod_stats_spark.operators.topk import top_k

LEADERBOARD_K = 10
RECENT_MATCHES_K = 15

# board key → stats_wz column (the 12 by-game metrics)
BY_GAME_METRICS = {
    "mostkills": "kills",
    "mostdeaths": "deaths",
    "bestkd": "kdRatio",
    "mostdamage": "damageDone",
    "mostdamagetaken": "damageTaken",
    "highestscore": "score",
    "longestdistance": "distanceTraveled",
    "mostheadshots": "headshots",
    "mostcaches": "objectiveBrCacheOpen",
    "mostrevives": "objectiveReviver",
    "mostdowns": "objectiveBrDownAll",
    "mostvehicles": "objectiveDestroyedVehicleAll",
}


def _core_only(stats: DataFrame, core: DataFrame) -> DataFrame:
    return stats.join(F.broadcast(core), "player_id", "left_semi")


def by_game_board(stats: DataFrame, core: DataFrame, metric: str, k: int = LEADERBOARD_K) -> DataFrame:
    """Top-k single-game rows for one metric.

    longestdistance renders as the reference's display string
    'cast((distanceTraveled/1000) as int) || " km"'
    (generate_lookup_data.sh:215) while still RANKING on the raw
    meters value."""
    col = BY_GAME_METRICS[metric]
    base = _core_only(stats, core).select(
        "date_key", "game_mode_sub", "game_id", "player_id", F.col(col).alias("value")
    )
    board = top_k(
        base,
        [("value", True), ("date_key", False), ("game_id", False), ("player_id", False)],
        k,
    )
    if metric == "longestdistance":
        board = board.withColumn(
            "value",
            F.concat((F.col("value") / 1000).cast("int").cast("string"), F.lit(" km")),
        )
    return board


def all_by_game_boards(stats: DataFrame, core: DataFrame, k: int = LEADERBOARD_K) -> dict[str, DataFrame]:
    return {m: by_game_board(stats, core, m, k) for m in BY_GAME_METRICS}


def gulag_streaks(stats: DataFrame, core: DataFrame, wins: bool, k: int = LEADERBOARD_K) -> DataFrame:
    """Top-k longest consecutive gulag win (or loss) streaks.

    Reference filter: only rows where a gulag happened (gulagKills=1 OR
    gulagDeaths=1); runs of the win flag within that subsequence."""
    flag = "gulagKills" if wins else "gulagDeaths"
    base = _core_only(stats, core).filter(
        (F.col("gulagKills") == 1) | (F.col("gulagDeaths") == 1)
    )
    runs = run_lengths(base, ["player_id"], ["date_key", "game_id"], flag)
    streaks = (
        runs.filter(F.col(flag) == 1)
        .groupBy("player_id", "run_grp")
        .agg(
            F.min("date_key").alias("date_key"),
            F.max("date_key").alias("until_date_key"),
            F.count(F.lit(1)).alias("value"),
        )
        .drop("run_grp")
    )
    return top_k(
        streaks, [("value", True), ("date_key", False), ("player_id", False)], k
    )


def count_board(stats: DataFrame, core: DataFrame, predicate, k: int = LEADERBOARD_K) -> DataFrame:
    """Per-player count of games matching a predicate, top-k (most wins
    teamPlacement=1; most last places teamPlacement=numberOfTeams)."""
    base = (
        _core_only(stats, core)
        .filter(predicate)
        .groupBy("player_id")
        .agg(F.count(F.lit(1)).alias("value"))
    )
    return top_k(base, [("value", True), ("player_id", False)], k)


def most_wins(stats: DataFrame, core: DataFrame, k: int = LEADERBOARD_K) -> DataFrame:
    return count_board(stats, core, F.col("teamPlacement") == 1, k)


def most_last_places(stats: DataFrame, core: DataFrame, k: int = LEADERBOARD_K) -> DataFrame:
    return count_board(stats, core, F.col("teamPlacement") == F.col("numberOfTeams"), k)


def recent_matches(full_games: DataFrame, k: int = RECENT_MATCHES_K) -> DataFrame:
    """Most recent k games with roster (reference :514-549)."""
    return top_k(full_games, [("date_key", True), ("game_id", False)], k)
