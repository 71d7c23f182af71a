"""Engine facade: the one-stop API a reference user migrates to.

    eng = Engine.from_paths(spark, matches_glob, players_json)
    eng.stats_wz()                   # gold fact DataFrame
    eng.daily() / eng.by_game()      # rollups
    eng.sessions() / eng.session_stats()
    eng.leaderboards()               # dict of top-10 boards
    eng.team_breakdowns()
    eng.daily_timeseries()
    eng.write_reports(out_dir)       # the static-site JSON documents

Materialization: the silver fact table is persisted on first access
(the reference's drop-and-rebuild materialized table, SURVEY.md §4) —
every downstream view reuses it instead of re-parsing JSON.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cod_stats_spark.engine import (
    ingest,
    leaderboards as lb,
    normalize,
    rollups,
    sessions as sess,
    stats as st,
    teams,
    timeseries as tsm,
)
from cod_stats_spark.engine.dims import game_modes_df, seasons_df
from cod_stats_spark.engine import reports as rep


class Engine:
    def __init__(self, spark: SparkSession, bronze: DataFrame, players: DataFrame):
        self.spark = spark
        self.bronze = bronze
        self.players = players
        self._silver: DataFrame | None = None
        self._stats: DataFrame | None = None

    @classmethod
    def from_paths(cls, spark: SparkSession, matches_path: str, players_json: str) -> "Engine":
        return cls(
            spark,
            ingest.read_matches(spark, matches_path),
            ingest.read_players_config(spark, players_json),
        )

    # ---- layers

    def valid_games(self) -> DataFrame:
        if self._silver is None:
            self._silver = normalize.normalize_matches(self.bronze, self.players).persist()
        return self._silver

    def stats_wz(self) -> DataFrame:
        if self._stats is None:
            self._stats = st.stats_wz(self.valid_games(), self.players).persist()
        return self._stats

    def core(self) -> DataFrame:
        return st.core_players(self.players)

    def modes(self) -> DataFrame:
        return game_modes_df(self.spark)

    def seasons(self) -> DataFrame:
        return seasons_df(self.spark)

    def unknown_modes_wz(self) -> DataFrame:
        return normalize.unknown_modes_wz(self.bronze)

    def unknown_modes_mp(self) -> DataFrame:
        return normalize.unknown_modes_mp(self.bronze)

    # ---- analytics

    def sessions(self) -> DataFrame:
        return sess.player_sessions(self.stats_wz())

    def session_stats(self) -> DataFrame:
        return sess.session_stats(self.stats_wz())

    def recent_sessions(self) -> DataFrame:
        return sess.latest_session_per_player(self.session_stats())

    def daily(self) -> DataFrame:
        return rollups.daily_stats(self.stats_wz())

    def by_game(self) -> DataFrame:
        return rollups.by_game_stats(self.stats_wz(), self.modes())

    def season_rollup(self) -> DataFrame:
        return rollups.season_rollup(self.stats_wz())

    def placement_pivot(self) -> DataFrame:
        return rollups.placement_by_category(self.stats_wz(), self.modes())

    def leaderboards(self, k: int = lb.LEADERBOARD_K) -> dict[str, DataFrame]:
        return lb.all_by_game_boards(self.stats_wz(), self.core(), k)

    def gulag_streaks(self, wins: bool = True) -> DataFrame:
        return lb.gulag_streaks(self.stats_wz(), self.core(), wins)

    def most_wins(self) -> DataFrame:
        return lb.most_wins(self.stats_wz(), self.core())

    def most_last_places(self) -> DataFrame:
        return lb.most_last_places(self.stats_wz(), self.core())

    def full_game_stats(self) -> DataFrame:
        return teams.full_game_stats(self.stats_wz(), self.core())

    def team_breakdowns(self) -> DataFrame:
        return teams.team_stat_breakdowns(self.stats_wz(), self.core())

    def recent_matches(self) -> DataFrame:
        return lb.recent_matches(self.full_game_stats())

    def daily_timeseries(self) -> DataFrame:
        return tsm.daily_timeseries(self.daily())

    def by_game_timeseries(self) -> DataFrame:
        return tsm.by_game_timeseries(self.by_game())

    # ---- serving layer

    def write_reports(self, out_dir: str) -> list[str]:
        """Emit the static-site JSON documents (reference stage 3)."""
        written = []

        def emit(rel: str, payload) -> None:
            path = os.path.join(out_dir, rel)
            rep.write_json(path, payload)
            written.append(path)

        emit("leaderboard_bygame.json", rep.leaderboard_bygame_doc(self.leaderboards()))
        emit(
            "leaderboard_lifetime.json",
            rep.leaderboard_lifetime_doc(
                self.gulag_streaks(True),
                self.gulag_streaks(False),
                self.most_wins(),
                self.most_last_places(),
            ),
        )
        emit("team_leaderboards.json", rep.team_leaderboards_doc(self.team_breakdowns()))
        emit("recent_matches.json", rep.recent_matches_doc(self.recent_matches()))
        emit("recent_sessions.json", rep.sessions_doc(self.recent_sessions()))
        emit("seasons.json", rep.seasons_doc())
        emit("meta.json", rep.meta_doc())

        daily_ts = tsm.daily_timeseries(self.daily())
        players = [r["player_id"] for r in self.players.select("player_id").distinct().collect()]
        rows = [r.asDict() for r in daily_ts.collect()]
        for p in players:
            prows = sorted(
                (r for r in rows if r["player_id"] == p), key=lambda r: r["date_key"]
            )
            emit(
                f"players/{p}_lifetime_time_wz.json",
                rep.player_timeseries_doc(prows, (3, 7)),
            )
        per_player_sessions = [r.asDict(recursive=True) for r in self.session_stats().collect()]
        for p in players:
            emit(
                f"players/sessions_{p}.json",
                [r for r in per_player_sessions if r["player_id"] == p],
            )
        return written


def write_silver(
    valid_games: DataFrame,
    path: str,
    partition_by_day: bool = True,
    bucket_by_player: int | None = None,
    table_name: str = "valid_games",
) -> None:
    """Cluster-scale silver materialization (the persist() used by
    Engine is the local-mode shortcut).

    - Partitioned by day: season/day queries (P9, A5, A6) prune
      partitions instead of scanning history.
    - Optional bucketing by player_uno_id: sessionization, per-player
      time-series, and the stats_wz join then read co-located data —
      the per-player window sorts shuffle nothing across executors.
    """
    from pyspark.sql import functions as F

    df = valid_games
    if partition_by_day:
        df = df.withColumn("dt", F.substring("date_key", 1, 10))
    writer = df.write.mode("overwrite")
    if partition_by_day:
        writer = writer.partitionBy("dt")
    if bucket_by_player:
        # bucketBy requires saveAsTable (metastore-backed)
        writer.bucketBy(bucket_by_player, "player_uno_id").sortBy(
            "player_uno_id", "date_key"
        ).option("path", path).saveAsTable(table_name)
    else:
        writer.parquet(path)
