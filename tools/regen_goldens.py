"""Regenerate the report byte-parity goldens (tests/goldens/reports/).

Builds the SAME fixture corpus as tests/conftest.py, runs
Engine.write_reports with a pinned timestamp, and stores every emitted
document. tests/test_engine.py::TestReportGoldens byte-compares a fresh
run against these files, so ANY serving-contract drift (key order,
value formatting, float repr, file set) fails CI.

Usage:  python tools/regen_goldens.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens", "reports")
GOLDEN_NOW = datetime(2026, 1, 1, tzinfo=timezone.utc)


def write_fixture_corpus(root: str) -> tuple[str, str]:
    from tests.conftest import PLAYERS_CONFIG, build_matches

    mdir = os.path.join(root, "matches")
    os.makedirs(mdir, exist_ok=True)
    for gid, uno, payload in build_matches():
        with open(os.path.join(mdir, f"match_{gid}_{uno}.json"), "w") as f:
            json.dump(payload, f)
    pj = os.path.join(root, "players.json")
    with open(pj, "w") as f:
        json.dump(PLAYERS_CONFIG, f)
    return f"{mdir}/*.json", pj


def main() -> int:
    from cod_stats_spark.engine import Engine
    from cod_stats_spark.session import get_spark

    spark = get_spark("regen-goldens", cpus=4)
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    with tempfile.TemporaryDirectory() as tmp:
        matches_glob, players_json = write_fixture_corpus(tmp)
        eng = Engine.from_paths(spark, matches_glob, players_json)
        out = os.path.join(tmp, "reports")
        eng.write_reports(out, now=GOLDEN_NOW)
        golden = os.path.abspath(GOLDEN_DIR)
        if os.path.isdir(golden):
            shutil.rmtree(golden)
        shutil.copytree(out, golden)
        n = sum(len(fs) for _, _, fs in os.walk(golden))
    print(f"wrote {n} golden files to {golden}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
