"""Sessionization views (reference vw_player_sessions +
vw_player_sessions_with_stats, parser/parse_matches.sh:298-377).

Semantics preserved:
- gap >= 7200 s (or first game) starts a session (§7.4.6)
- session end = next session start − 1 s; open sessions end at the
  epoch-9999999999 sentinel
- per-session rollup: counts, sums, maxes, wins/top5/top10

Spark-first difference (SURVEY J3/J5): session ids are carried on each
game row directly from the window pass — no interval self-join back to
the fact table. One shuffle on player_id total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cod_stats_spark.engine.dims import SESSION_DELTA_SECONDS, SESSION_OPEN_END_EPOCH
from cod_stats_spark.operators.sessionize import sessionize

ISO = "yyyy-MM-dd'T'HH:mm:ss'Z'"


def sessionized_games(stats: DataFrame, gap_seconds: int = SESSION_DELTA_SECONDS) -> DataFrame:
    """stats_wz + (session_number, session_id) per row."""
    with_epoch = stats.withColumn(
        "_epoch", F.unix_timestamp(F.col("date_key"), ISO)
    )
    out = sessionize(
        with_epoch,
        ts_col="_epoch",
        key_cols=["player_id"],
        gap_seconds=gap_seconds,
        tiebreak_cols=["game_id"],
    )
    return out


def player_sessions(stats: DataFrame, gap_seconds: int = SESSION_DELTA_SECONDS) -> DataFrame:
    """(player_id, session_number, session_id, start, end) — the
    reference's session interval table, derived from the carried
    session ids rather than a lead-over-flags self-join."""
    s = sessionized_games(stats, gap_seconds)
    per = s.groupBy("player_id", "session_number", "session_id").agg(
        F.min("date_key").alias("start"), F.min("_epoch").alias("_start_epoch")
    )
    w = Window.partitionBy("player_id").orderBy("_start_epoch")
    end_epoch = F.coalesce(
        F.lead("_start_epoch").over(w), F.lit(SESSION_OPEN_END_EPOCH)
    ) - F.lit(1)
    return per.select(
        "player_id",
        "session_number",
        "session_id",
        "start",
        F.date_format(F.to_timestamp(F.from_unixtime(end_epoch)), ISO).alias("end"),
    )


def session_stats(stats: DataFrame, gap_seconds: int = SESSION_DELTA_SECONDS) -> DataFrame:
    """Per-session rollup (reference vw_player_sessions_with_stats)."""
    s = sessionized_games(stats, gap_seconds)
    def topn(n):
        return F.sum(F.when(F.col("teamPlacement") <= n, 1).otherwise(0))

    rolled = s.groupBy("player_id", "session_number", "session_id").agg(
        F.min("date_key").alias("start"),
        F.min("_epoch").alias("_start_epoch"),
        F.count(F.lit(1)).alias("numGames"),
        F.sum("kills").alias("kills"),
        F.sum("deaths").alias("deaths"),
        F.sum("damageDone").alias("damageDone"),
        F.max("kills").alias("maxKills"),
        F.max("damageDone").alias("maxDamage"),
        F.sum("gulagKills").alias("gulagKills"),
        F.sum("gulagDeaths").alias("gulagDeaths"),
        topn(1).alias("wins"),
        topn(5).alias("top5"),
        topn(10).alias("top10"),
    )
    w = Window.partitionBy("player_id").orderBy("_start_epoch")
    end_epoch = F.coalesce(
        F.lead("_start_epoch").over(w), F.lit(SESSION_OPEN_END_EPOCH)
    ) - F.lit(1)
    return rolled.withColumn(
        "end", F.date_format(F.to_timestamp(F.from_unixtime(end_epoch)), ISO)
    ).drop("_start_epoch")


def latest_session_per_player(session_stats_df: DataFrame) -> DataFrame:
    """Top-1 session per player by session_number (reference
    generate_lookup_data.sh:555-561)."""
    w = Window.partitionBy("player_id").orderBy(F.col("session_number").desc())
    return (
        session_stats_df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
