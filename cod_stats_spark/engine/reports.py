"""JSON report documents (reference frontend/generate_lookup_data.sh —
the S9/S10 sink family).

Every report is a SMALL result (top-k rows, per-player series) — the
heavy work happened in distributed aggregations; documents are
collected to the driver and written as single JSON files, mirroring
the reference's static-file serving layer. At cluster scale the same
DataFrames can instead be written with df.write.json per partition
key; the shapes are identical.
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame

from cod_stats_spark.engine.dims import SEASONS


def _rows(df: DataFrame) -> list[dict]:
    return [r.asDict(recursive=True) for r in df.collect()]


def write_json(path: str, payload) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f, separators=(",", ":"))


def leaderboard_bygame_doc(boards: dict[str, DataFrame]) -> dict:
    """{board_key: [ {date_key, game_mode_sub, game_id, player_id, value} ]}"""
    return {name: _rows(df) for name, df in boards.items()}


def leaderboard_lifetime_doc(
    gulag_win_streaks: DataFrame,
    gulag_loss_streaks: DataFrame,
    wins: DataFrame,
    last_places: DataFrame,
) -> dict:
    return {
        "consecutive_gulag_kills": _rows(gulag_win_streaks),
        "consecutive_gulag_deaths": _rows(gulag_loss_streaks),
        "most_wins": _rows(wins),
        "most_lastplaces": _rows(last_places),
    }


def team_leaderboards_doc(breakdowns: DataFrame) -> dict:
    """{category: [breakdown rows...]} (reference :479-510)."""
    rows = _rows(breakdowns)
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r["category"], []).append(r)
    for cat in out:
        out[cat].sort(key=lambda r: (-r["numGames"], r["player_ids"]))
    return out


def recent_matches_doc(recent: DataFrame) -> list:
    return _rows(recent)


def sessions_doc(session_stats: DataFrame) -> list:
    return _rows(session_stats)


def seasons_doc() -> list[dict]:
    return [
        {"id": s[0], "desc": s[1], "start": s[2], "end": s[3], "sort_order": s[4]}
        for s in SEASONS
    ]


def meta_doc(now: datetime | None = None) -> dict:
    ts = (now or datetime.now(timezone.utc)).strftime("%Y-%m-%dT%H:%M:%SZ")
    return {"updatedAt": ts}


def player_timeseries_doc(ts_rows: list[dict], frames: tuple[int, int]) -> list[dict]:
    """Nest flat frame columns back into the reference's document shape:
    {date, stats: {raw: {...}, smoothed_k: {...}, cumalative: {...}}}
    ('cumalative' typo preserved for client compatibility)."""
    k1, k2 = frames
    from cod_stats_spark.engine.timeseries import TS_METRICS

    docs = []
    for r in ts_rows:
        raw = {m: r.get(m) for m, _ in TS_METRICS}
        doc = {
            "date": r.get("date_key"),
            "stats": {
                "raw": raw,
                f"smoothed_{k1}": {m: r.get(f"{m}_{a}_s{k1}") for m, a in TS_METRICS},
                f"smoothed_{k2}": {m: r.get(f"{m}_{a}_s{k2}") for m, a in TS_METRICS},
                "cumalative": {m: r.get(f"{m}_{a}_cume") for m, a in TS_METRICS},
            },
        }
        docs.append(doc)
    return docs
