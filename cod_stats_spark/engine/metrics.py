"""Derived ratio metrics — the browser-side statResolver functions
(reference frontend/resources/scripts/index.js:19-135, player.js)
folded into engine columns so the serving layer stays dumb.

Two division-guard conventions coexist in the reference (SURVEY.md
§7.4.2-3) and both are preserved, explicitly named:
- sql_style:    x / 0 → NULL (the SQL reports)
- client_style: deaths=0 treated as 1 (the JS chart resolvers)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def kd_sql(kills: Column, deaths: Column) -> Column:
    d = deaths.cast("double")
    return F.when(d != 0, kills / d)


def kd_client(kills: Column, deaths: Column) -> Column:
    d = F.when(deaths == 0, F.lit(1)).otherwise(deaths).cast("double")
    return kills / d


def per_game(total: Column, games: Column) -> Column:
    g = games.cast("double")
    return F.when(g != 0, total / g)


def damage_per_kill_int(damage: Column, kills: Column) -> Column:
    """Integer-division semantics preserved (SURVEY.md §7.4.1)."""
    return F.when(kills != 0, (damage / kills).cast("long"))


def gulag_win_pct_int(wins: Column, losses: Column) -> Column:
    total = wins + losses
    return F.when(total != 0, (F.lit(100) * wins / total).cast("long"))


def rate_pct(hits: Column, games: Column) -> Column:
    g = games.cast("double")
    return F.when(g != 0, F.lit(100.0) * hits / g)
