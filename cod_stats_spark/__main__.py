"""Pipeline CLI — the reference's run_and_deploy entry point, minus the
proprietary fetch/deploy stages (stages 2+3 of SURVEY §3):

    python -m cod_stats_spark --matches 'data/matches/*.json' \
        --players config/players.json --out site/data [--silver path]

Parses match JSON → silver (optionally materialized to parquet) → full
report document set. Exit code 0 on success; row/file counts to stderr.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="cod_stats_spark", description="Run the match-stats pipeline."
    )
    ap.add_argument("--matches", required=True, help="glob of match_*.json files")
    ap.add_argument("--players", required=True, help="players.json config path")
    ap.add_argument("--out", required=True, help="report output directory")
    ap.add_argument("--silver", help="optionally materialize silver parquet here")
    ap.add_argument("--cpus", type=int, default=None, help="local parallelism")
    args = ap.parse_args(argv)

    from cod_stats_spark.engine import Engine
    from cod_stats_spark.engine.api import write_silver
    from cod_stats_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("cod-stats-pipeline", cpus=args.cpus)
    eng = Engine.from_paths(spark, args.matches, args.players)

    n_games = eng.valid_games().count()
    n_corrupt = eng.corrupt_matches().count()
    print(f"silver: {n_games} rows ({n_corrupt} corrupt files skipped)", file=sys.stderr)
    unknown = eng.unknown_modes_wz().count()
    if unknown:
        print(f"WARNING: {unknown} unknown wz modes (see unknown_modes_wz)", file=sys.stderr)

    if args.silver:
        write_silver(eng.valid_games(), args.silver)
        print(f"silver materialized: {args.silver}", file=sys.stderr)

    files = eng.write_reports(args.out)
    print(f"reports: {len(files)} files in {args.out}", file=sys.stderr)
    print(f"done in {time.time() - t0:.1f}s", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
