"""Daily and season rollups (reference vw_player_stats_by_day_wz,
parser/parse_matches.sh:472-505; season rollups,
frontend/generate_lookup_data.sh:589-701).

Semantic traps preserved (SURVEY.md §7.4.3): daily kdRatio /
scorePerMinute are avg-of-ratios (the reference's avg()), NOT
ratio-of-sums; the season K/D IS ratio-of-sums. Both live here,
explicitly named.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cod_stats_spark.engine.dims import MONSTER_KILLS_THRESHOLD, seasons_df
from cod_stats_spark.operators.interval_join import interval_join


def daily_stats(stats: DataFrame, monster_threshold: int = MONSTER_KILLS_THRESHOLD) -> DataFrame:
    """Per (player, day) rollup — tumbling day buckets on the ISO string
    prefix (identical to date(date_key))."""
    return (
        stats.withColumn("day", F.substring("date_key", 1, 10))
        .groupBy("player_id", F.col("day").alias("date_key"))
        .agg(
            F.count(F.lit(1)).alias("matchesPlayed"),
            F.sum("kills").alias("kills"),
            F.sum("deaths").alias("deaths"),
            F.sum("gulagKills").alias("gulagKills"),
            F.sum("gulagDeaths").alias("gulagDeaths"),
            F.sum("headshots").alias("headshots"),
            F.sum("damageDone").alias("damageDone"),
            F.sum("distanceTraveled").alias("distanceTraveled"),
            F.avg("kdRatio").alias("kdRatio"),  # avg-of-ratios, per reference
            F.avg("scorePerMinute").alias("scorePerMinute"),
            F.sum(F.when(F.col("kills") >= monster_threshold, 1).otherwise(0)).alias("monsters"),
            F.sum(F.when(F.col("kills") == 0, 1).otherwise(0)).alias("gooseeggs"),
        )
    )


def by_game_stats(stats: DataFrame, modes: DataFrame,
                  monster_threshold: int = MONSTER_KILLS_THRESHOLD) -> DataFrame:
    """Per-game rows with display mode + monster/gooseegg flags
    (reference vw_player_stats_by_game_wz; 'Unknown &lt;mode&gt;'
    fallback preserved byte-for-byte, SURVEY.md §7.4.10)."""
    return (
        stats.join(F.broadcast(modes), stats["game_mode_sub"] == modes["id"], "left")
        .select(
            "date_key",
            "player_id",
            "game_id",
            F.lit(1).alias("matchesPlayed"),
            F.coalesce(
                F.col("display_name"),
                F.concat(F.lit("Unknown &lt;"), F.col("game_mode_sub"), F.lit("&gt;")),
            ).alias("mode"),
            "numberOfPlayers",
            "numberOfTeams",
            "teamPlacement",
            "kills",
            "deaths",
            "gulagKills",
            "gulagDeaths",
            "headshots",
            "damageDone",
            "distanceTraveled",
            "kdRatio",
            "scorePerMinute",
            F.when(F.col("kills") >= monster_threshold, 1).otherwise(0).alias("monsters"),
            F.when(F.col("kills") == 0, 1).otherwise(0).alias("gooseeggs"),
        )
    )


def season_assign(stats: DataFrame) -> DataFrame:
    """Assign each game its seasons (fan-out: every game is in
    'lifetime' AND its season — SURVEY.md §7.4.11).

    Fast path exploiting the dim's structure: the non-lifetime seasons
    PARTITION the timeline, so membership is a sorted CASE chain over
    start bounds (pure codegen projection, no join at all); the
    overlapping 'lifetime' row is a second projection unioned on. The
    general overlapping-interval case stays in
    operators/interval_join.py. Rows with no season (outside all
    bounds) get only the lifetime row — identical to the interval join.
    """
    from cod_stats_spark.engine.dims import SEASONS

    non_lifetime = sorted(
        (s for s in SEASONS if s[0] != "lifetime"), key=lambda s: s[2]
    )
    lifetime = next(s for s in SEASONS if s[0] == "lifetime")

    # CASE over start bounds descending: first start <= date_key wins;
    # the end bound still applies (gaps between seasons exist in theory)
    expr = F.lit(None).cast("string")
    descr_expr = F.lit(None).cast("string")
    sort_expr = F.lit(None).cast("int")
    for sid, descr, start, end, sort_order in non_lifetime:
        cond = (F.col("date_key") >= start) & (F.col("date_key") <= end)
        expr = F.when(cond, F.lit(sid)).otherwise(expr)
        descr_expr = F.when(cond, F.lit(descr)).otherwise(descr_expr)
        sort_expr = F.when(cond, F.lit(sort_order)).otherwise(sort_expr)

    in_season = stats.withColumns(
        {"season_id": expr, "descr": descr_expr, "sort_order": sort_expr}
    ).filter(F.col("season_id").isNotNull())
    in_lifetime = stats.filter(
        (F.col("date_key") >= lifetime[2]) & (F.col("date_key") <= lifetime[3])
    ).withColumns(
        {
            "season_id": F.lit(lifetime[0]),
            "descr": F.lit(lifetime[1]),
            "sort_order": F.lit(lifetime[4]),
        }
    )
    return in_season.unionByName(in_lifetime)


def season_assign_general(stats: DataFrame) -> DataFrame:
    """Reference implementation via the generic interval join (used to
    cross-check the fast path in tests)."""
    seasons = seasons_df(stats.sparkSession).withColumnRenamed("id", "season_id")
    return interval_join(stats, seasons, "date_key", "start", "end")


def season_rollup(stats: DataFrame) -> DataFrame:
    """Per (player, season): matches + sums + derived ratio metrics
    (reference generate_lookup_data.sh:589-635). Ratio-of-sums K/D with
    the reference's cast/guard semantics; NULL on zero denominator."""
    assigned = season_assign(stats)
    agg = assigned.groupBy("player_id", "season_id", "descr", "sort_order").agg(
        F.count(F.lit(1)).alias("matches"),
        F.sum("damageDone").alias("damage"),
        F.sum("kills").alias("kills"),
        F.sum("deaths").alias("deaths"),
        F.sum("gulagKills").alias("gulagWins"),
        F.sum("gulagDeaths").alias("gulagLosses"),
    )
    deaths_f = F.col("deaths").cast("double")
    gulag_total = F.col("gulagWins") + F.col("gulagLosses")
    return agg.select(
        "player_id",
        "season_id",
        "descr",
        "sort_order",
        "matches",
        "damage",
        "kills",
        "deaths",
        "gulagWins",
        "gulagLosses",
        F.round(F.when(deaths_f != 0, F.col("kills") / deaths_f), 2).alias("kdRatio"),
        F.round(F.col("kills") / F.col("matches").cast("double"), 2).alias("killsPerGame"),
        F.round(F.col("damage") / F.col("matches").cast("double"), 2).alias("damagePerGame"),
        # integer division semantics preserved (SURVEY.md §7.4.1)
        F.when(F.col("kills") != 0, (F.col("damage") / F.col("kills")).cast("long")).alias(
            "damagePerKill"
        ),
        F.when(
            gulag_total != 0,
            (F.lit(100) * F.col("gulagWins") / gulag_total).cast("long"),
        ).alias("gulagWinPct"),
    )


def placement_by_category(stats: DataFrame, modes: DataFrame) -> DataFrame:
    """Pivot: avg placement per (player, season) × category → columns
    (reference generate_lookup_data.sh:638-685), 'N/A' for missing."""
    assigned = season_assign(stats)
    cats = ["wz_solo", "wz_duos", "wz_trios", "wz_quads"]
    joined = assigned.join(
        F.broadcast(modes.select(F.col("id").alias("game_mode_sub"), "category")),
        "game_mode_sub",
    )
    # weighted placement: 100 * sum(teamPlacement) / sum(numberOfTeams)
    per_cat = (
        joined.filter(F.col("category").isin(cats))
        .groupBy("player_id", "season_id", "category")
        .agg(
            F.round(
                F.lit(100)
                * F.sum("teamPlacement")
                / F.sum("numberOfTeams").cast("double"),
                2,
            ).alias("avgPlacement")
        )
    )
    pivoted = (
        per_cat.groupBy("player_id", "season_id")
        .pivot("category", cats)
        .agg(F.first("avgPlacement"))
    )
    renames = {
        "wz_solo": "avgPlacementSolo",
        "wz_duos": "avgPlacementDuos",
        "wz_trios": "avgPlacementTrios",
        "wz_quads": "avgPlacementQuads",
    }
    out = pivoted
    for old, new in renames.items():
        out = out.withColumn(
            new, F.coalesce(F.col(old).cast("string"), F.lit("N/A"))
        ).drop(old)
    return out
